"""Fixture-regeneration regression tests (round-4 VERDICT item 6).

``scan_typed_columns`` hash-failed in rounds 3 AND 4 because its derived
table rebuilt only when a ``_SUCCESS`` marker was missing — a condition a
testdata regeneration under an unchanged path never triggers, so a
session with a persistent catalog served stale pre-regeneration data.

The fix keys every derived scratch path and derived TABLE NAME on a
content fingerprint of the source dir (``io.sf_tag``).  These tests
simulate the exact failure: build a derived fixture, REGENERATE the
source under the same path with different data, and assert the derived
result reflects the new data within the same SparkSession (whose catalog
still holds the old derived table).
"""

from __future__ import annotations

import os
import shutil

import pytest

from yc_data_proc_metadata_import_spark.registry import QUERIES
from yc_data_proc_metadata_import_spark.sources.io import (
    _fixture_dir,
    _sf_fingerprint,
    sf_tag,
    table_path,
)


@pytest.fixture()
def regen_sf(tmp_path, sf_dir):
    """A private copy of the sf dir that tests may regenerate in place."""
    dst = tmp_path / "sfregen"
    dst.mkdir()
    for name in os.listdir(sf_dir):
        src = os.path.join(sf_dir, name)
        if os.path.isdir(src):
            shutil.copytree(src, dst / name)
        else:
            shutil.copy2(src, dst / name)
    return str(dst)


def test_sf_tag_changes_on_touch(regen_sf):
    """The fingerprint must react to a bare mtime bump (the weakest
    possible regeneration signal)."""
    before = sf_tag(regen_sf)
    target = table_path(regen_sf, "orders")
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    after = sf_tag(regen_sf)
    assert before != after


def test_sf_tag_stable_without_changes(regen_sf):
    assert sf_tag(regen_sf) == sf_tag(regen_sf)


def _regenerate_orders(regen_sf: str) -> None:
    """Rewrite orders.parquet under the SAME path with half the rows —
    what a driver-side testdata regeneration does between rounds."""
    import duckdb

    path = table_path(regen_sf, "orders")
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE o AS SELECT * FROM read_parquet('{path}') "
        "WHERE o_orderkey % 2 = 1"
    )
    os.remove(path)
    con.execute(f"COPY o TO '{path}' (FORMAT parquet)")
    con.close()


def test_typed_orders_rebuilds_after_regen(spark, regen_sf):
    """The round-3/4 red key, replayed: same session, same sf path,
    regenerated source data -> the derived DDL-typed table must rebuild
    and serve the NEW row counts (the broken guard served the old)."""
    q = QUERIES["scan_typed_columns"]
    before = {r["status_c"]: r["n"] for r in q(spark, regen_sf).collect()}
    _regenerate_orders(regen_sf)
    after = {r["status_c"]: r["n"] for r in q(spark, regen_sf).collect()}
    assert sum(after.values()) < sum(before.values()), (
        "derived typed_orders table served stale pre-regeneration data: "
        f"before={before} after={after}"
    )


def test_partitioned_sink_rebuilds_after_regen(spark, regen_sf):
    """Same hazard class for path-cached derived fixtures: the
    partition-pruned scan must observe regenerated source data."""
    q = QUERIES["scan_partition_pruned"]
    before = q(spark, regen_sf).count()
    _regenerate_orders(regen_sf)
    after = q(spark, regen_sf).count()
    assert after < before, (
        f"sink_orders_part fixture served stale data: before={before} after={after}"
    )


def test_stale_sibling_cleanup(regen_sf):
    """_fixture_dir removes same-kind dirs with an outdated fingerprint
    (testdata regenerates every round; dead copies must not accumulate)."""
    old = _fixture_dir("fptest_kind", regen_sf)
    os.makedirs(old, exist_ok=True)
    target = table_path(regen_sf, "orders")
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    new = _fixture_dir("fptest_kind", regen_sf)
    assert new != old
    assert not os.path.exists(old), "stale fixture sibling not cleaned up"
    shutil.rmtree(new, ignore_errors=True)


def test_fingerprint_covers_nested_files(tmp_path):
    """Directory-valued tables (multi-part parquet dirs) must contribute
    every member file."""
    d = tmp_path / "sf"
    sub = d / "t.parquet"
    sub.mkdir(parents=True)
    (sub / "part-0.parquet").write_bytes(b"a")
    fp1 = _sf_fingerprint(str(d))
    (sub / "part-1.parquet").write_bytes(b"b")
    assert _sf_fingerprint(str(d)) != fp1


def test_bucketed_warehouse_stale_cleanup(spark, sf_dir):
    """bucketed_join_noshuffle must delete warehouse table copies whose
    fingerprint suffix is stale (they live outside .scratch, so the
    fixture-dir sibling cleanup can't reach them)."""
    from yc_data_proc_metadata_import_spark.sources.io import sf_tag

    base, _fp = sf_tag(sf_dir).rsplit("_", 1)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    wh_db = os.path.join(wh, "bucketed_db.db")
    os.makedirs(wh_db, exist_ok=True)
    stale = os.path.join(wh_db, f"orders_b_{base}_{'0' * 10}")
    os.makedirs(stale, exist_ok=True)
    QUERIES["bucketed_join_noshuffle"](spark, sf_dir).count()
    assert not os.path.exists(stale), "stale bucketed warehouse copy not cleaned"


def test_fixture_version_forces_rebuild(regen_sf):
    """Bumping a builder's version constant must re-key (and therefore
    rebuild) exactly that fixture, and reap the old-version dir — the
    stale-by-CODE hazard (round-5 VERDICT item 7)."""
    v1 = _fixture_dir("fpver_kind", regen_sf)
    v2 = _fixture_dir("fpver_kind", regen_sf, version="2")
    assert v1 != v2
    assert _fixture_dir("fpver_kind", regen_sf, version="2") == v2
    other = _fixture_dir("fpother_kind", regen_sf)
    os.makedirs(v1, exist_ok=True)
    os.makedirs(other, exist_ok=True)
    _fixture_dir("fpver_kind", regen_sf, version="2")
    assert not os.path.exists(v1), "old-version fixture dir not reaped"
    assert os.path.exists(other), "unrelated fixture wrongly reaped"
    shutil.rmtree(other, ignore_errors=True)


def test_fixture_version_alternation_raises(regen_sf):
    """Two live call sites disagreeing on a kind's version would reap
    each other's dirs on every access; returning to a previously-used
    version is that signature and must fail loudly (code-review round 6).
    A forward bump (the legitimate mechanism) stays allowed."""
    import pytest

    _fixture_dir("fpalt_kind", regen_sf, version="1")
    _fixture_dir("fpalt_kind", regen_sf, version="2")  # forward bump: fine
    with pytest.raises(AssertionError, match="alternating"):
        _fixture_dir("fpalt_kind", regen_sf, version="1")


def test_width_sibling_spared_stale_fp_reaped(regen_sf):
    """Width-suffixed fixture dirs (round-8 ADVICE, both findings): a
    sibling at the CURRENT fingerprint but a DIFFERENT width is a
    concurrent session's live layout and must survive; a sibling at a
    STALE fingerprint is pre-regeneration debris and must be reaped at
    ANY width (previously width-suffixed dirs escaped reaping entirely
    and accumulated across testdata regenerations)."""
    cur = _fixture_dir("fpwidth_kind", regen_sf, width=32)
    assert cur.endswith("_w32"), cur
    base = cur[: -len("_w32")]
    other_width = base + "_w8"
    os.makedirs(cur, exist_ok=True)
    os.makedirs(other_width, exist_ok=True)
    prefix_dir, _fp = base.rsplit("_", 1)
    stale_w = f"{prefix_dir}_{'0' * 10}_w32"
    stale_other_w = f"{prefix_dir}_{'0' * 10}_w8"
    stale_bare = f"{prefix_dir}_{'0' * 10}"  # legacy hashed-width layout
    for d in (stale_w, stale_other_w, stale_bare):
        os.makedirs(d, exist_ok=True)
    assert _fixture_dir("fpwidth_kind", regen_sf, width=32) == cur
    assert os.path.exists(other_width), "concurrent other-width layout reaped"
    for d in (stale_w, stale_other_w, stale_bare):
        assert not os.path.exists(d), f"stale-fingerprint sibling survived: {d}"
    for d in (cur, other_width):
        shutil.rmtree(d, ignore_errors=True)


def test_media_fixture_width_visible_in_name(spark, sf_dir):
    """The media fixtures must encode the building session's parallelism
    as a VISIBLE _w<N> suffix, not hash it into the fingerprint — hashed,
    a concurrent different-parallelism session's committed fixture looks
    like a stale-fingerprint sibling and gets reaped mid-scan (round-8
    ADVICE, medium)."""
    from yc_data_proc_metadata_import_spark.llm.multimodal import (
        _media_fixture_dir,
    )

    out = _media_fixture_dir(spark, "ppm_media", sf_dir)
    par = spark.sparkContext.defaultParallelism
    assert out.endswith(f"_w{par}"), out


def test_commit_fixture_first_wins(tmp_path):
    """A late racer must DROP its identical copy, never delete a
    committed fixture another session may be scanning (code-review
    round 8): _commit_fixture is first-wins on a _SUCCESS-complete
    destination."""
    from yc_data_proc_metadata_import_spark.sources.io import _commit_fixture

    out = tmp_path / "fix"
    out.mkdir()
    (out / "_SUCCESS").touch()
    (out / "part-0.parquet").write_bytes(b"winner")
    tmp = tmp_path / f"fix.tmp{os.getpid()}"
    tmp.mkdir()
    (tmp / "_SUCCESS").touch()
    (tmp / "part-0.parquet").write_bytes(b"late copy")
    _commit_fixture(str(tmp), str(out))
    assert (out / "part-0.parquet").read_bytes() == b"winner"
    assert not tmp.exists(), "late racer's staging dir not dropped"


def test_commit_fixture_replaces_markerless_debris(tmp_path):
    """Marker-less debris (an interrupted pre-PID-suffix write) is the
    one thing promotion may remove; the staged copy must land."""
    from yc_data_proc_metadata_import_spark.sources.io import _commit_fixture

    out = tmp_path / "fix"
    out.mkdir()
    (out / "part-0.parquet").write_bytes(b"torn write, no _SUCCESS")
    tmp = tmp_path / f"fix.tmp{os.getpid()}"
    tmp.mkdir()
    (tmp / "_SUCCESS").touch()
    (tmp / "part-0.parquet").write_bytes(b"fresh build")
    _commit_fixture(str(tmp), str(out))
    assert (out / "_SUCCESS").exists()
    assert (out / "part-0.parquet").read_bytes() == b"fresh build"
    assert not tmp.exists()
    # The debris is shunted aside atomically (never rmtree'd in place —
    # round-8 ADVICE TOCTOU) and cleaned up after the commit lands. The
    # 0-byte flock file that serializes promotion (round-9 ADVICE) is
    # the one permitted leftover — it must NEVER be deleted (unlinking a
    # lock another process holds open would let two committers into the
    # critical section on different inodes).
    assert sorted(os.listdir(tmp_path)) == ["fix", "fix.lock"], os.listdir(tmp_path)
    assert os.path.getsize(tmp_path / "fix.lock") == 0


def test_reap_scratch_orphans(monkeypatch, tmp_path):
    """Dead builders' PID-suffixed staging dirs and legacy
    pre-width-suffix layouts are reaped; live-PID staging, width-suffixed
    layouts, and the one-time 3-batch fixture are left alone."""
    import yc_data_proc_metadata_import_spark.sources.io as io_mod

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    keep = [
        f"docs_wide_sf0_01_ab12cd34ef_w32",      # current width-keyed layout
        f"stream_events_sf0_01_ab12cd34ef_w32",  # current width-keyed layout
        "stream_events_3b_sf0_01_ab12cd34ef",    # 3-batch fixture: no width rule
        f"thing.tmp{os.getpid()}",               # live builder (this process)
    ]
    keep.append("stream_restart_stage_sf0_01_ab12cd34ef")  # live shared fixture
    reap = [
        "docs_wide_sf0_01_ab12cd34ef",           # legacy, pre-width-suffix
        "stream_events_sf0_01_ab12cd34ef",       # legacy, pre-width-suffix
        "stream_events_dup_sf0_01_ab12cd34ef",   # legacy, pre-width-suffix
        "thing.tmp",                             # legacy fixed staging name
        "thing.tmp999999999",                    # dead builder (pid_max < 2^22 + 1)
        "checkpoints",                           # pre-relocation checkpoint root
        "stream_rate_sf0_01_ab12cd34ef",         # pre-relocation per-run dirs
        "stream_restart_src_sf0_01_ab12cd34ef",
        "stream_restart_out_sf0_01_ab12cd34ef",
        "stream_sink_parquet_sf0_01_ab12cd34ef",
        "upsert_state_sf0_01_ab12cd34ef",
    ]
    # _commit_fixture's flock files are PERMANENT (deleting one while a
    # committer holds it would hand a second committer a fresh inode at
    # the same path — both "locked" at once). The exclusion must win even
    # over a name that would otherwise match a reap pattern (round-10
    # ADVICE: enforce the invariant in code, not only a comment).
    keep_locks = [
        "csv_nation_sf0_01_ab12cd34ef.lock",
        "thing.tmp999999999.lock",
    ]
    for d in keep + reap:
        (scratch / d).mkdir()
    for f in keep_locks:
        (scratch / f).touch()
    monkeypatch.setattr(io_mod, "SCRATCH", str(scratch))
    monkeypatch.setattr(io_mod, "_ORPHANS_REAPED", False)
    io_mod._reap_scratch_orphans()
    for d in keep:
        assert (scratch / d).exists(), f"wrongly reaped {d}"
    for f in keep_locks:
        assert (scratch / f).exists(), f"wrongly reaped lock {f}"
    for d in reap:
        assert not (scratch / d).exists(), f"orphan survived: {d}"
