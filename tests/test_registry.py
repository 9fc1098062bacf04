"""Registry invariants backing the driver contract."""

from __future__ import annotations

import yc_data_proc_metadata_import_spark as engine


def test_every_oracle_has_query():
    q, o = engine.queries(), engine.oracle_sql()
    assert set(o) <= set(q), f"orphan oracles: {set(o) - set(q)}"


def test_queries_are_callables():
    for name, fn in engine.queries().items():
        assert callable(fn), name


def test_entry_contract_importable():
    import __spark_entry__ as e

    assert callable(e.entry)
    assert set(e.oracle_sql()) <= set(e.queries())
