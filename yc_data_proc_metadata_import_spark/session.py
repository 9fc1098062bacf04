"""SparkSession builder.

The reference provisions stock Spark clusters and sets exactly one Spark
property: ``spark.sql.hive.metastore.sharedPrefixes =
"com.amazonaws,ru.yandex.cloud"`` (metastore-import.tf:198-201, :247-250),
needed so the Hive-metastore client's isolated classloader can see the
S3/cloud SDK classes.  We keep that as a passthrough slot: callers can hand
any config dict through ``extra_conf`` and the defaults mirror a sane
100 TB-era cluster setup (AQE on, skew-join handling on, Arrow on) scaled
down to local mode.

Scale notes (local[32] today, 1000-executor cluster tomorrow):
- ``spark.sql.adaptive.enabled`` + coalescePartitions + skewJoin: runtime
  re-planning is how a fixed shuffle-partition count survives a 100x data
  change.
- ``spark.sql.shuffle.partitions`` is set to a small local value but AQE
  coalescing makes the exact number non-critical; on a real cluster set it
  to ~2-3x total cores and let AQE coalesce.
- Arrow execution keeps the pandas-UDF path (the only Python hot path we
  allow) batched instead of per-row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The single engine config the reference sets (metastore-import.tf:200).
REFERENCE_SHARED_PREFIXES = "com.amazonaws,ru.yandex.cloud"

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader + pushdown are on by default; pin
    # them so a misconfigured parent session can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # ANSI off: match the permissive Hive/Spark-3.0.2 semantics of the
    # clusters the reference provisions (metastore-import.tf:193).
    "spark.sql.ansi.enabled": "false",
    "spark.sql.hive.metastore.sharedPrefixes": REFERENCE_SHARED_PREFIXES,
}


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "yc-dp-metadata-import-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
    enable_hive: bool = False,
) -> SparkSession:
    """Build (or fetch) a configured SparkSession.

    ``enable_hive`` attaches a persistent (Derby-backed) catalog, the local
    stand-in for the managed Hive Metastore the reference talks to over
    thrift:9083 (metastore-import.tf:112-117).
    """
    cpus = cpu_count()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    # NOTE: driver memory only takes effect when THIS call creates the JVM;
    # getOrCreate() against an already-running session silently ignores it
    # (set it via spark-submit/env in that case — ADVICE.md round 1).
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if warehouse_dir:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    if enable_hive:
        builder = builder.enableHiveSupport()
    return builder.getOrCreate()


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to a session we didn't build.

    The driver contract hands us an externally built session; timestamps
    must render in UTC for oracle parity (pyspark timestamps are
    session-TZ, DuckDB's are UTC-naive) and AQE should be on.
    """
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
    ):
        spark.conf.set(k, DEFAULT_CONF.get(k, "true"))
    return spark
