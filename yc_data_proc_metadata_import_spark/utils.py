"""Cross-engine determinism helpers.

The driver hash-compares Spark results against DuckDB (SURVEY.md SS5).
Floating-point SUM/AVG are accumulation-order dependent — a 600k-row double
sum differs between engines in the last few ulps, which a value-hash sees.
The fix used across the operator suite: aggregate EXACTLY in decimal, then
cast the exact result to double.  Decimal sums are associative, so Spark
and DuckDB produce bit-identical doubles regardless of partitioning; AVG is
expressed as exact-sum / count (IEEE division of identical operands is
identical).  Variance/stddev/corr are likewise derived from exact moment
sums instead of the engines' (order-sensitive) streaming implementations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 money sums (~1e11) with plenty of headroom; scale 4
# preserves cents and tax/discount precision exactly.
DEC = "decimal(28,4)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column, alias: str | None = None) -> Column:
    """Exact decimal sum surfaced as double (order-independent bits)."""
    out = F.sum(dec(c)).cast("double")
    return out.alias(alias) if alias else out


def davg(c: str | Column, alias: str | None = None) -> Column:
    """avg = exact-decimal sum / count, evaluated in double."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.sum(dec(col)).cast("double") / F.count(col)
    return out.alias(alias) if alias else out


# Narrower decimal for products: decimal(19,4) x decimal(19,4) ->
# precision 38 exactly, so sums of squares / cross products are still exact
# (used by the stats operators).  19, not 18: DuckDB stores p<=18 decimals
# in int64 and overflows on multiply; p=19 forces its int128 path.
DEC_N = "decimal(19,4)"


def dec_n(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC_N)


def dsum_prod(a: str | Column, b: str | Column, alias: str | None = None) -> Column:
    """Exact decimal sum of a*b surfaced as double."""
    out = F.sum(dec_n(a) * dec_n(b)).cast("double")
    return out.alias(alias) if alias else out


# SQL-side twins for oracle strings.
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,4))) AS DOUBLE) / COUNT({expr}))"


def sql_dsum_prod(a: str, b: str) -> str:
    return (
        f"CAST(SUM(CAST({a} AS DECIMAL(19,4)) * CAST({b} AS DECIMAL(19,4))) AS DOUBLE)"
    )


# Every dict ever passed to session_cached, so long-lived harnesses (the
# scale rungs run 40+ keys in ONE session) can drop every cached artifact
# at once: cached DataFrames pin their localCheckpoint/persisted blocks
# via the py4j reference, and 40 keys of pinned blocks ground an 8 GB
# driver heap into GC thrash (measured r17: llm_ann_ivf 42 s fresh vs
# 117 s as the rung's 37th key, then an invariance-pass OOM two entries
# later).
_ALL_CACHES: list[dict] = []


def session_cached(cache: dict, spark, suffix, build):
    """Get-or-build a per-(session, suffix) cached value.

    Keys on ``spark.sparkContext.applicationId`` — NEVER ``id(spark)``:
    CPython reuses object ids after GC, so a new session allocated at a
    dead session's address could be served a DataFrame bound to the
    stopped context (round-5 ADVICE). Entries from other application
    ids are evicted on insert — they reference dead contexts and would
    otherwise leak. Shared by the token, shingle, and k-means caches so
    the hazard fix lives in exactly one place.
    """
    if not any(c is cache for c in _ALL_CACHES):
        _ALL_CACHES.append(cache)
    app_id = spark.sparkContext.applicationId
    key = (app_id, suffix)
    cached = cache.get(key)
    if cached is None:
        cached = build()
        for k in [k for k in cache if k[0] != app_id]:
            del cache[k]
        cache[key] = cached
    return cached


def clear_session_caches() -> int:
    """Drop every session-cached artifact; returns the entry count
    dropped. The caller should follow with gc.collect() (and a JVM GC)
    so the ContextCleaner actually releases the pinned blocks."""
    n = sum(len(c) for c in _ALL_CACHES)
    for c in _ALL_CACHES:
        c.clear()
    return n
