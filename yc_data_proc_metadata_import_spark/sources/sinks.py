"""Sinks: Parquet + hive-style partitioned writes (SURVEY.md SS2.3).

The tutorial workflow writes tables into the shared bucket
(metastore-import.tf:165-179) so both clusters can read them.  These
queries write to scratch and read the result back, proving the round-trip;
the driver's check is rows-only for sinks, but we attach full oracles by
returning the re-read data.

Scale notes: a partitioned sink is how 100 TB stays prunable — downstream
readers with a predicate on the partition column scan only matching
directories (static partition pruning).  Writers should aim for
~128 MB-1 GB files per partition: repartition by the partition column
before writing so each directory is produced by few tasks (avoids the
small-files problem at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .io import SCRATCH, load


@query(
    "sink_parquet",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write supplier to Parquet, read it back."""
    out = os.path.join(SCRATCH, f"sink_supplier_{os.path.basename(os.path.normpath(sf_dir))}")
    load(spark, sf_dir, "supplier").write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@query(
    "sink_partitioned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, o_orderstatus
    FROM orders
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: status-partition dirs under the sink.

    The partition column has ~3 distinct values, so repartitioning on it
    alone would funnel the whole table through ≤3 write tasks (the round-1
    scale-killer).  Instead repartition on (partition_col, high-cardinality
    key): every task holds a slice of each status, writes go wide in
    parallel, and ``maxRecordsPerFile`` bounds file size; AQE coalescing
    keeps the task count sane.  Reading back with a partition-column filter
    still prunes to matching directories only.
    """
    out = os.path.join(SCRATCH, f"sink_orders_part_{os.path.basename(os.path.normpath(sf_dir))}")
    orders = load(spark, sf_dir, "orders")
    (
        orders.withColumn("o_status_part", F.col("o_orderstatus"))
        .repartition(F.col("o_status_part"), F.col("o_orderkey"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .partitionBy("o_status_part")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        F.col("o_status_part").cast("string").alias("o_orderstatus"),
    )
