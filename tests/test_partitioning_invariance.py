"""Partitioning-invariance: results must be BIT-IDENTICAL when the
cluster shape changes.

The engine's central determinism claim (README "Bit-exact determinism")
is that no result depends on aggregation ORDER — decimal-exact sums,
integer cross-comparisons, single IEEE divisions of exact operands.
The driver's DuckDB hash-compare tests cross-ENGINE agreement; this
suite tests cross-SHAPE agreement: the same key evaluated under a
different ``spark.sql.shuffle.partitions`` (and therefore different
partial-aggregation trees, different row arrival orders, different
task counts) must produce byte-identical normalized rows.  A key that
passed the oracle only because both engines happened to fold floats in
the same order would fail here — this is the test that would have
caught an accumulation-order bug BEFORE a driver adjudication.

Keys chosen: every family whose determinism is non-trivial — float
aggregation (decimal trick), window prefix sums, ratio surfaces,
sketches, iterative graph state, weighted statistics.
"""

from __future__ import annotations

import pytest

import yc_data_proc_metadata_import_spark as engine

from .compare import _norm

QUERIES = engine.queries()

KEYS = [
    "agg_groupby",          # decimal-exact SUM/AVG over floats
    "agg_share_of_total",   # re-aggregated decimal partials + division
    "win_running_sum",      # per-row decimal prefix sums
    "win_time_weighted_avg",  # weighted decimal sum + exact conversion
    "agg_countmin_sketch",  # counter grid built from partial counts
    "graph_pagerank",       # iterative integer state
    "llm_tfidf",            # ratio/log surfaces over counts
    "win_retention_cohorts",  # distinct-count ratios
    "merge_incremental_aggregate",  # delta-refresh decimal partials
    "agg_gini",             # rank-weighted decimal sums
    "win_pareto",           # ordered decimal prefix accumulation
    "agg_weighted_median",  # integer cumulative-weight selection
]


def _rows(df):
    return sorted(
        tuple(_norm(v) for v in row)
        for row in (tuple(r) for r in df.collect())
    )


@pytest.mark.parametrize("key", KEYS)
def test_shape_invariant(key, spark, sf_dir):
    if key not in QUERIES:
        pytest.skip(f"{key} not registered")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    df_a = QUERIES[key](spark, sf_dir)
    rows_a = _rows(df_a)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        df_b = QUERIES[key](spark, sf_dir)
        rows_b = _rows(df_b)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert rows_a == rows_b, (
        f"{key}: result depends on shuffle partitioning "
        f"({len(rows_a)} vs {len(rows_b)} rows; first diff: "
        f"{next((a, b) for a, b in zip(rows_a, rows_b) if a != b) if len(rows_a) == len(rows_b) else 'row count'})"
    )
