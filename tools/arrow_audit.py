"""Arrow-schema parity audit: Spark ``toArrow()`` vs DuckDB ``.arrow()``.

The driver's value-hash is computed over the typed (Arrow-level)
representation of both result sets — proved twice:

- round 2 ``agg_bool``: identical values, but DuckDB ``count_if`` returns
  HUGEINT which arrives in Arrow as decimal128(38,0) vs Spark's int64;
- round 3 ``scan_typed_columns``: identical ``collect()`` values, but
  Spark TIMESTAMP_LTZ arrives as ``timestamp[us, tz=UTC]`` while DuckDB's
  naive TIMESTAMP arrives as ``timestamp[us]``.

The older ``tools/dtype_audit.py`` canonicalized every timestamp flavor to
one token and so missed the second class.  This audit compares the ACTUAL
Arrow schemas both engines hand the driver, field by field (names sorted,
matching the driver's column sort).  Any line it prints is a key that will
hash-fail at adjudication even when values match.

Usage: python tools/arrow_audit.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yc_data_proc_metadata_import_spark as engine  # noqa: E402
from yc_data_proc_metadata_import_spark.session import get_spark
from yc_data_proc_metadata_import_spark.sources.io import TABLES, table_path


def _canon(t) -> str:
    """Canonical Arrow type string; collapse equivalent encodings.

    string/large_string and their list flavors hold identical logical
    values — DuckDB switched defaults across versions, and a value-hash
    over the decoded values cannot see the offset width.
    """
    s = str(t)
    return s.replace("large_string", "string").replace("large_list", "list")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="arrow-audit", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')"
        )
    qs, oracles = engine.queries(), engine.oracle_sql()
    bad = 0
    for key in sorted(qs):
        if only and key not in only:
            continue
        if key not in oracles:
            print(f"[audit] {key}: NO ORACLE (rows-only)")
            continue
        t0 = time.time()
        try:
            sp = qs[key](spark, sf).toArrow()
            du = con.execute(oracles[key]).arrow()
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            bad += 1
            print(f"[audit] {key}: ERROR {type(e).__name__}: {e}"[:300])
            continue
        sfields = sorted((f.name, _canon(f.type)) for f in sp.schema)
        dfields = sorted((f.name, _canon(f.type)) for f in du.schema)
        if sfields != dfields:
            bad += 1
            diffs = [
                (a, b)
                for a, b in zip(sfields, dfields)
                if a != b
            ]
            if len(sfields) != len(dfields):
                diffs = [(tuple(sfields), tuple(dfields))]
            print(f"[audit] {key}: SCHEMA MISMATCH")
            for a, b in diffs:
                print(f"    spark={a}  duck={b}")
        else:
            print(f"[audit] {key}: ok ({time.time() - t0:.2f}s)", file=sys.stderr)
    print(f"[audit] done: {bad} mismatching keys")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
