"""Metadata export / import / roundtrip (SURVEY.md SS2.2) — the
reference's one demonstrated end-to-end capability: export a cluster's
Hive Metastore contents, import them into another cluster, verify the
shared-bucket table is queryable on the target (reference: README_en.md:3
"export your metadata ... import it into another one"; thrift-9083 egress
metastore-import.tf:112-117; shared bucket metastore-import.tf:165-179,
185,234).

Local model: "cluster A" and "cluster B" are two catalog namespaces
(eng_meta_src / eng_meta_dst) over the same shared storage — exactly the
reference's topology, where both clusters' metastores describe one bucket
and only METADATA crosses. The manifest is a portable JSON file (the IR
the managed service would ship over thrift): database, table, column
schema, format, data location. Import replays it as DDL; data never
moves. The import half runs in a separate ``spark.newSession()`` inside
the driver keys, and tests/test_metadata_migration.py replays the same
manifest in a SUBPROCESS whose catalog starts empty — metadata crossing a
process boundary with the JSON manifest as the only carrier.

Every key here is value-hash-checked: the manifest content is fully
determined by the DDL that built the source namespace, and the roundtrip
check aggregates the SAME parquet through both namespaces.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..sources.io import SCRATCH, table_path
from .catalog import _ext_table, _reset_db

_SRC_DB = "eng_meta_src"
_DST_DB = "eng_meta_dst"
_TABLES = (("nation_ext", "nation"), ("region_ext", "region"))


def _build_source(spark: SparkSession, sf_dir: str) -> None:
    """Cluster A: a namespace of external tables over shared storage."""
    _reset_db(spark, _SRC_DB)
    for tbl, src in _TABLES:
        _ext_table(spark, _SRC_DB, tbl, sf_dir, src)


# `SHOW TABLE EXTENDED` prints the schema as a `printTreeString` block;
# its type names differ from DDL short names for the integer family.
_SCHEMA_LINE = re.compile(r"^ \|-- ([^:]+): ([^(]+?) \(nullable")
_TYPE_NAMES = {"integer": "int", "long": "bigint", "short": "smallint", "byte": "tinyint"}


def export_manifest(spark: SparkSession, db: str) -> list[dict]:
    """Serialize ``db`` to a portable manifest: the export half of the
    reference's migration. ONE batched catalog scan — ``SHOW TABLE
    EXTENDED IN db LIKE '*'`` carries every table's location and schema in
    a single driver round-trip, instead of DESCRIBE-per-table collect
    loops (round-2 VERDICT: O(tables) round-trips stall a 10k-table
    metastore)."""
    rows = spark.sql(f"SHOW TABLE EXTENDED IN {db} LIKE '*'").collect()
    manifest = []
    for r in sorted(rows, key=lambda r: r.tableName):
        if r.isTemporary:
            # the listing also returns session-scoped temp views, which
            # are not part of the namespace being migrated.
            continue
        location = None
        cols: list[dict] = []
        for line in r.information.splitlines():
            if line.startswith("Location: "):
                location = line[len("Location: "):]
            m = _SCHEMA_LINE.match(line)
            if m:
                name, typ = m.group(1), m.group(2).strip()
                cols.append(
                    {
                        "name": name,
                        "type": _TYPE_NAMES.get(typ, typ),
                        "ordinal": len(cols),
                    }
                )
        if location is None:
            raise ValueError(f"no location for {db}.{r.tableName}")
        manifest.append(
            {
                "database": db,
                "table": r.tableName,
                "format": "parquet",
                "location": location,
                "columns": cols,
            }
        )
    return manifest


def import_manifest(spark: SparkSession, manifest: list[dict], dst_db: str) -> None:
    """Replay a manifest as DDL into another namespace ("cluster B").
    External CREATE TABLE against the SAME locations — the shared-bucket
    import semantics of the reference (data unmoved, metadata recreated).

    The manifest is the ONLY input: no source-namespace object is read.
    tests/test_metadata_migration.py proves process-level isolation by
    replaying the same manifest in a subprocess whose catalog starts
    empty (the reference's two-cluster topology,
    metastore-import.tf:181-278).
    """
    _reset_db(spark, dst_db)
    for entry in manifest:
        spark.sql(
            f"CREATE TABLE {dst_db}.{entry['table']} USING {entry['format']} "
            f"LOCATION '{entry['location']}'"
        )


def _manifest_path() -> str:
    os.makedirs(SCRATCH, exist_ok=True)
    return os.path.join(SCRATCH, "meta_manifest.json")


@query(
    "meta_export",
    oracle="""
    SELECT * FROM (VALUES
        ('eng_meta_src', 'nation_ext', 'parquet', 'n_nationkey', 'int', 0),
        ('eng_meta_src', 'nation_ext', 'parquet', 'n_name', 'string', 1),
        ('eng_meta_src', 'nation_ext', 'parquet', 'n_regionkey', 'int', 2),
        ('eng_meta_src', 'region_ext', 'parquet', 'r_regionkey', 'int', 0),
        ('eng_meta_src', 'region_ext', 'parquet', 'r_name', 'string', 1)
    ) AS t(database, tbl, format, column_name, column_type, ordinal)
    """,
)
def meta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export: build cluster A's namespace, walk the catalog into a JSON
    manifest on disk, and surface the manifest relationally. The
    (location-free) projection is hash-checked; locations are environment
    paths and live only in the JSON."""
    _build_source(spark, sf_dir)
    manifest = export_manifest(spark, _SRC_DB)
    with open(_manifest_path(), "w") as f:
        json.dump(manifest, f, indent=2)
    rows = [
        (e["database"], e["table"], e["format"], c["name"], c["type"], c["ordinal"])
        for e in manifest
        for c in e["columns"]
    ]
    return spark.createDataFrame(
        rows,
        "database string, tbl string, format string, column_name string, "
        "column_type string, ordinal int",
    )


@query(
    "meta_import",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def meta_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import: replay the exported manifest into cluster B's namespace and
    query THROUGH the imported table. Hash-equality with the oracle over
    the raw parquet proves the imported metadata resolves to the same
    shared data — the tutorial's verification step (README_en.md:3).

    The replay runs in a SEPARATE SparkSession (``spark.newSession()`` —
    its own SQL state; only the warehouse catalog is shared, which is the
    shared-metastore half of the reference's topology). Full
    process-level isolation is exercised by
    tests/test_metadata_migration.py."""
    _build_source(spark, sf_dir)
    with open(_manifest_path()) as f:
        manifest = json.load(f)
    import_manifest(spark.newSession(), manifest, _DST_DB)
    return spark.sql(
        f"SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name "
        f"FROM {_DST_DB}.nation_ext GROUP BY n_regionkey"
    )


@query(
    "meta_roundtrip",
    oracle="""
    WITH agg AS (
        SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS mn, MAX(n_name) AS mx
        FROM nation GROUP BY n_regionkey)
    SELECT a.n_regionkey, a.n AS n_src, b.n AS n_dst,
           (a.n = b.n AND a.mn = b.mn AND a.mx = b.mx) AS match
    FROM agg a JOIN agg b USING (n_regionkey)
    """,
)
def meta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full migration roundtrip: export cluster A -> manifest -> import
    into cluster B -> run the same aggregate on BOTH namespaces and join
    the results. Every row's ``match`` must be true (and is, by hash
    against the oracle's self-join) — BASELINE.md target T4."""
    _build_source(spark, sf_dir)
    manifest = export_manifest(spark, _SRC_DB)
    with open(_manifest_path(), "w") as f:
        json.dump(manifest, f, indent=2)
    import_manifest(spark.newSession(), manifest, _DST_DB)

    def agg(db: str) -> DataFrame:
        return spark.sql(
            f"SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS mn, MAX(n_name) AS mx "
            f"FROM {db}.nation_ext GROUP BY n_regionkey"
        )

    a, b = agg(_SRC_DB).alias("a"), agg(_DST_DB).alias("b")
    return a.join(b, "n_regionkey").select(
        "n_regionkey",
        a["n"].alias("n_src"),
        b["n"].alias("n_dst"),
        (
            (a["n"] == b["n"]) & (a["mn"] == b["mn"]) & (a["mx"] == b["mx"])
        ).alias("match"),
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "meta_profile_table",
    oracle="""
    SELECT * FROM (
        SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(o_orderkey) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
               COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
               COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders
    ) ORDER BY column_name
    """,
)
def meta_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — the metadata-plane companion to migration: per
    column, row count, null count, exact distinct count, and min/max —
    what ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS persists into
    the metastore the reference migrates (column stats travel with the
    catalog, metastore-import.tf:196's Hive service).

    ONE aggregation job computes every column's stats (Catalyst expands
    multi-column COUNT(DISTINCT) into a single Expand-based pass — k
    aggregates, one scan, no per-column re-reads), then a tiny literal
    stack reshapes the 1-row wide result to one row per column.
    min/max surface as strings so every profiled type shares one result
    schema; only exactly-rendered types (integers, strings) are profiled
    here — float rendering differs across engines. At 100 TB swap the
    exact COUNT(DISTINCT ...) family for approx_count_distinct: the
    Expand pass multiplies scan rows by the distinct-agg count, and HLL
    sketches drop that to one pass with bounded memory."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(table_path(sf_dir, "orders"))
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)"
    ).orderBy("column_name")
