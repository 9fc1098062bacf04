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
