"""Cross-validation between the approximate near-dup paths and the exact
oracle-checked one: LSH may MISS pairs (recall < 1) but must never invent
them (precision = 1), because its verify stage recomputes exact Jaccard.
The planted high-similarity duplicates must always be found.
"""

from __future__ import annotations

import yc_data_proc_metadata_import_spark as engine

QUERIES = engine.queries()


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_minhash_lsh_subset_of_exact(spark, sf_dir):
    exact = _pairs(QUERIES["llm_dedup_ngram"](spark, sf_dir))
    lsh = _pairs(QUERIES["llm_dedup_near"](spark, sf_dir))
    assert set(lsh) <= set(exact), "LSH invented pairs the exact join lacks"
    # identical verify math: jaccard values must agree bit-for-bit
    for k, v in lsh.items():
        assert v == exact[k], (k, v, exact[k])


def test_minhash_lsh_recall_on_planted_dups(spark, sf_dir):
    """8x4 banding recalls J>=0.9 pairs with p ~ 0.9998 per pair; the
    fixtures plant near-identical duplicates well above that bar."""
    exact = _pairs(QUERIES["llm_dedup_ngram"](spark, sf_dir))
    lsh = set(_pairs(QUERIES["llm_dedup_near"](spark, sf_dir)))
    planted = {k for k, v in exact.items() if v >= 0.9}
    missed = planted - lsh
    assert not missed, f"LSH missed planted near-identical dups: {missed}"


def test_embedding_lsh_subset_of_exact_simjoin(spark, sf_dir):
    exact = {(r.doc_a, r.doc_b) for r in QUERIES["llm_sim_join"](spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in QUERIES["llm_sim_join_lsh"](spark, sf_dir).collect()}
    assert lsh <= exact, "SRP-LSH invented pairs the exact block join lacks"


def test_shared_derived_indexes_build_once(spark, sf_dir):
    """Round-7 contract: the dedup family's derived inputs (hashed
    shingle inverted index, simhash fingerprints, BPE merge table,
    cluster labels) are built ONCE per (session, scale) and fanned out
    to every consumer — re-invoking a consumer must hand back the same
    materialized object, not a rebuild. This is what keeps the bench's
    per-key cost the steady-state query cost and, at scale, what turns
    N key runs into one index build + N index joins."""
    from yc_data_proc_metadata_import_spark.llm import dedup, text
    from yc_data_proc_metadata_import_spark.registry import QUERIES

    idx1 = dedup.hashed_index_cached(spark, sf_dir)
    for key in ("llm_dedup_ngram", "llm_lsh_recall_audit", "llm_contamination_check"):
        QUERIES[key](spark, sf_dir).count()
    assert dedup.hashed_index_cached(spark, sf_dir) is idx1
    fp1 = dedup.simhash_fingerprints_cached(spark, sf_dir)
    QUERIES["llm_dedup_simhash"](spark, sf_dir).count()
    assert dedup.simhash_fingerprints_cached(spark, sf_dir) is fp1
    merges = text._bpe_merges_cached(spark, sf_dir)
    QUERIES["llm_bpe_apply"](spark, sf_dir).count()
    assert text._bpe_merges_cached(spark, sf_dir) is merges
    labels = dedup.dedup_clusters_cached(spark, sf_dir)
    QUERIES["llm_curation_pipeline"](spark, sf_dir).count()
    assert dedup.dedup_clusters_cached(spark, sf_dir) is labels
