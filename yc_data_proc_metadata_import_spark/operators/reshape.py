"""Reshape operators: pivot, unpivot, deterministic sampling (SURVEY.md
SS2 extensions — the remaining everyday surface a Spark user of the
reference's clusters reaches for).

Scale notes: pivot with an EXPLICIT value list is a single hash
aggregation with conditional agg expressions (no second pass to discover
values — at 100 TB value-discovery is a full extra scan); unpivot is a
zero-shuffle row-local expand; hash-sampling is a pushdown-able filter,
unlike TABLESAMPLE whose row selection is partition-layout-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load
from ..utils import sql_dsum, dsum

_STATUSES = ("F", "O", "P")


@query(
    "reshape_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_F,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_O,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_P,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS sum_F,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS sum_O,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS sum_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns, per priority — with an explicit
    value list so Catalyst plans ONE aggregation pass (no distinct-value
    discovery scan). Count cells are exact ints; sum cells use the
    decimal-exact path. Empty cells surface as 0 / NULL exactly as the
    oracle's FILTER/CASE aggregates do."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "sum"),
        )
    )
    # pivot names columns "<value>_<alias>"; align with the oracle's names
    sel = [F.col("o_orderpriority")]
    for s in _STATUSES:
        sel.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s}"))
    for s in _STATUSES:
        sel.append(F.col(f"{s}_sum").alias(f"sum_{s}"))
    return piv.select(*sel)


@query(
    "reshape_unpivot",
    oracle="""
    SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
    UNION ALL
    SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide metrics into (metric, value) long form — the
    inverse reshape, planned as a row-local Expand: each input row emits
    one row per metric with NO shuffle, so at 100 TB it is scan-bound."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "o_custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# Knuth multiplicative hash over the key — exact BIGINT arithmetic both
# engines evaluate identically, uniform enough for rate control. The key
# is masked to 31 bits BEFORE the multiply so the product stays < 2^63
# for the full int64 key domain (round-5 ADVICE: unmasked, keys above
# ~3.47e9 overflow — Spark wraps silently, DuckDB errors/promotes);
# values are unchanged for keys < 2^31.
_SAMPLE_HASH = "((o_orderkey % 2147483648) * 2654435761) % 4294967296"
_SAMPLE_KEEP = 429496730  # ~10%


@query(
    "reshape_sample",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE {_SAMPLE_HASH} < {_SAMPLE_KEEP}
    """,
)
def reshape_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via a multiplicative hash on the key.

    Unlike df.sample()/TABLESAMPLE — whose selection depends on partition
    layout and seed plumbing — a hash filter is reproducible across
    engines, partitionings, and reruns, pushes down like any predicate,
    and composes with joins (sample both sides on the same key to keep
    referential integrity). The sampling audit pattern used by
    llm_dedup_embedding, surfaced as a first-class operator."""
    o = load(spark, sf_dir, "orders")
    h = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    return o.filter(h < _SAMPLE_KEEP).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


# Per-stratum keep thresholds out of the 2^32 hash space: boost the
# low-resource languages, downsample English — the balancing move every
# multilingual training-data pipeline makes.
_STRATA_KEEP = {"en": 429496730, "de": 3865470566, "fr": 3865470566}
_STRATA_DEFAULT_KEEP = 2147483648  # 50%


@query(
    "reshape_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 <
          CASE lang
               WHEN 'en' THEN {_STRATA_KEEP["en"]}
               WHEN 'de' THEN {_STRATA_KEEP["de"]}
               WHEN 'fr' THEN {_STRATA_KEEP["fr"]}
               ELSE {_STRATA_DEFAULT_KEEP} END
    """,
)
def reshape_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sample: per-language keep rates (10% en,
    90% de/fr, 50% default) applied via the same multiplicative key hash
    as reshape_sample.

    Unlike ``df.sampleBy`` — whose selection depends on seed plumbing and
    partition traversal order — the hash threshold is a pure row-local
    predicate: reproducible across engines and reruns, pushes down to the
    scan, and needs no per-stratum count pass. Rebalancing a 100 TB
    corpus is therefore one scan-bound filter.
    """
    d = load(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    keep = F.lit(_STRATA_DEFAULT_KEEP)
    for lang, thr in _STRATA_KEEP.items():
        keep = F.when(F.col("lang") == lang, F.lit(thr)).otherwise(keep)
    return d.filter(h < keep).select("doc_id", "lang", "source")
