"""Set operations & key-based dedup (SURVEY.md SS2.9).

unionByName (never positional union) for safety under schema evolution;
intersect/except use the ALL (bag) variants to exercise true multiset
semantics against DuckDB's INTERSECT ALL / EXCEPT ALL.  Distinct-style ops
shuffle on the full row hash — at 100 TB prefer dedup on an explicit key
subset (dedup_exact_keys) which shuffles on just the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey", "o_orderstatus")
    )


def _big(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select("o_custkey", "o_orderstatus")
    )


_URGENT_SQL = "SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'"
_BIG_SQL = "SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 150000.0"


@query(
    "set_union_all",
    oracle=f"({_URGENT_SQL}) UNION ALL ({_BIG_SQL})",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union: duplicates retained; a metadata-only operation in Spark
    (partitions concatenated, zero shuffle)."""
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir))


@query(
    "set_union_distinct",
    oracle=f"({_URGENT_SQL}) UNION ({_BIG_SQL})",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: bag union + distinct (one hash shuffle on the full
    row)."""
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle=f"({_URGENT_SQL}) INTERSECT ALL ({_BIG_SQL})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset): each row appears min(count_left,
    count_right) times."""
    return _urgent(spark, sf_dir).intersectAll(_big(spark, sf_dir))


@query(
    "set_except",
    oracle=f"({_URGENT_SQL}) EXCEPT ALL ({_BIG_SQL})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset): left counts minus right counts."""
    return _urgent(spark, sf_dir).exceptAll(_big(spark, sf_dir))


@query(
    "dedup_exact_keys",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        FROM orders
    ) t
    WHERE rn = 1
    """,
)
def dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based dedup with a DETERMINISTIC survivor (earliest order per
    customer).  ``dropDuplicates([key])`` keeps an arbitrary row — fine
    when any representative works, but not reproducible; the window
    keep-first spelling shuffles once on the key and pins the survivor."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           o_orderpriority
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-DRIFT UNION: ``unionByName(allowMissingColumns=True)``
    aligns two inputs BY COLUMN NAME and null-fills columns either side
    lacks — the ingestion primitive for feeds whose schema evolved
    between extracts (positional UNION would silently misalign or
    reject).  Here an open-orders extract carries price+status while a
    finished-orders extract carries priority; the union holds all four
    columns with NULLs where a side had no value — exactly the
    null-padded relational spelling the oracle states explicitly.

    Map-only: no shuffle, the union is plan-level concatenation of the
    two pruned scans; at 100 TB each leg keeps its own pushed filters
    and the combined schema is resolved at plan time, not per row."""
    o = load(spark, sf_dir, "orders")
    open_extract = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    finished_extract = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    return open_extract.unionByName(
        finished_extract, allowMissingColumns=True
    )
