"""Projection / filter / predicate operators (SURVEY.md SS2.4).

Capability surface of the SPARK service the reference provisions
(metastore-import.tf:196); each operator is a declarative DataFrame
expression so Catalyst pushes predicates into the Parquet scan and prunes
columns — at 100 TB every one of these is scan-bound with zero shuffle.

Determinism notes: all outputs are per-row scalar expressions, so Spark and
DuckDB produce bit-identical values (IEEE arithmetic on identical inputs);
no rounding fudge is needed anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load


@query(
    "project_select",
    oracle="""
    SELECT c_custkey, c_name AS customer_name, c_mktsegment
    FROM customer
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection + rename; reads 3 of 5 columns (column pruning
    reaches the Parquet footer — ReadSchema shows only these fields)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("customer_name"),
        "c_mktsegment",
    )


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS gross,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS gross_taxed
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns via withColumn; pure row-local double arithmetic
    (same expression tree as the oracle => identical IEEE bits)."""
    return (
        load(spark, sf_dir, "lineitem")
        .withColumn("gross", F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .withColumn("gross_taxed", F.col("gross") * (F.lit(1.0) + F.col("l_tax")))
        .select("l_orderkey", "l_linenumber", "gross", "gross_taxed")
    )


@query(
    "filter_basic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus <> 'F'
    """,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean algebra; both predicates push down to the
    Parquet row-group level (PushedFilters in the physical plan)."""
    o = load(spark, sf_dir, "orders")
    return o.filter((F.col("o_totalprice") > 150000.0) & (F.col("o_orderstatus") != "F")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


@query(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000.0 AND 150000.0
    """,
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN (inclusive both ends, matching SQL semantics)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000.0, 150000.0)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%a%' AND regexp_matches(p_type, '^[A-Z]+')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern + regexp predicate (rlike). The regex is anchored and
    class-only so Java and RE2 semantics agree."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%") & F.col("p_type").rlike("^[A-Z]+")).select(
        "p_partkey", "p_name", "p_type"
    )


@query(
    "filter_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_filled,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL) AS was_negative
    FROM customer
    WHERE CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL
       OR c_acctbal > 1000.0
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: the fixtures carry no natural NULLs, so nulls are
    introduced with a guarded expression, then isNull / coalesce / boolean
    null-semantics are exercised on them."""
    c = load(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return (
        c.withColumn("bal", bal)
        .withColumn("bal_filled", F.coalesce(F.col("bal"), F.lit(0.0)))
        .withColumn("was_negative", F.col("bal").isNull())
        .filter(F.col("bal").isNull() | (F.col("c_acctbal") > 1000.0))
        .select("c_custkey", "bal", "bal_filled", "was_negative")
    )


@query(
    "project_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000.0 THEN 'large'
                WHEN o_totalprice >= 100000.0 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_name
    FROM orders
    """,
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched CASE (chained when/otherwise) + simple CASE on a key."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000.0, "large")
        .when(F.col("o_totalprice") >= 100000.0, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


@query(
    "project_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_orderkey AS VARCHAR) AS orderkey_str,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str
    FROM lineitem
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast suite: double->int via explicit FLOOR (Spark truncates,
    DuckDB rounds — FLOOR makes both identical), timestamp->date,
    bigint->string, double->decimal(12,2) surfaced as its canonical
    string."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
    )
