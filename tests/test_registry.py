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


def test_adjudication_rotation():
    """queries() must put keys without a recorded hash-green verdict ahead
    of keys already proven in a committed CORRECTNESS_r*.json, so the
    correctness gate's fixed per-round budget always lands on fresh keys;
    every registered key must still appear exactly once."""
    import yc_data_proc_metadata_import_spark as engine
    from yc_data_proc_metadata_import_spark import _FORCE_FRONT, _adjudicated_green
    from yc_data_proc_metadata_import_spark.registry import QUERIES

    green = _adjudicated_green()
    # Keys whose implementation changed after their recorded green are
    # deliberately re-fronted — they count as fresh for ordering.
    for k in _FORCE_FRONT:
        green.pop(k, None)
    ordered = list(engine.queries())
    assert sorted(ordered) == sorted(QUERIES), "rotation lost or duped keys"
    if green:
        seen_green = False
        for k in ordered:
            if k in green:
                seen_green = True
            else:
                assert not seen_green, (
                    f"fresh key {k!r} ordered after already-green keys"
                )
