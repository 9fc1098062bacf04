"""Every registered query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate (rows + schema + values).

As of round 2 every key carries an oracle (ORACLE_KEYS == all keys); the
rows-only fallback test remains so a future oracle-less key still gets a
runs-and-returns check rather than silently no coverage.
"""

from __future__ import annotations

import pytest

import yc_data_proc_metadata_import_spark as engine

from .compare import assert_match

QUERIES = engine.queries()
ORACLES = engine.oracle_sql()

ORACLE_KEYS = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY_KEYS = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, sf_dir, oracle):
    df = QUERIES[key](spark, sf_dir)
    assert_match(df, oracle, ORACLES[key], key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS or ["<none>"])
def test_rows_only_runs(key, spark, sf_dir):
    if key == "<none>":
        assert not ROWS_ONLY_KEYS  # all keys oracle-checked — nothing to do
        return
    df = QUERIES[key](spark, sf_dir)
    assert df.columns, f"{key}: empty schema"
    n = df.count()
    assert n >= 0
