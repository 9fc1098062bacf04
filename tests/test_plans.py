"""Physical-plan regression guards: the properties that make these
operators scale (broadcasts, parquet pushdown, no accidental cartesian
products) are asserted so a refactor can't silently regress them.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import yc_data_proc_metadata_import_spark as engine

QUERIES = engine.queries()


def _plan(spark, sf_dir, key: str) -> str:
    df = QUERIES[key](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "key",
    ["join_broadcast", "join_star", "llm_sentiment", "llm_tfidf", "llm_topk_cosine"],
)
def test_small_side_broadcasts(spark, sf_dir, key):
    plan = _plan(spark, sf_dir, key)
    assert "Broadcast" in plan, f"{key}: expected a broadcast join\n{plan}"


@pytest.mark.parametrize("key", ["filter_basic", "flagship_pricing_summary"])
def test_filters_push_to_scan(spark, sf_dir, key):
    plan = _plan(spark, sf_dir, key)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
        f"{key}: filter did not reach the parquet scan\n{plan}"
    )


@pytest.mark.parametrize(
    "key",
    ["llm_dedup_near", "llm_dedup_ngram", "llm_dedup_simhash", "llm_sim_join_lsh"],
)
def test_dedup_paths_are_not_cartesian(spark, sf_dir, key):
    """The linear-shuffle near-dup designs must never plan a cartesian
    product — that would mean the blocking keys stopped being equi-join
    keys (the whole point of LSH/inverted-index structure)."""
    plan = _plan(spark, sf_dir, key)
    assert "CartesianProduct" not in plan, f"{key}: cartesian product!\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{key}: BNL join!\n{plan}"
