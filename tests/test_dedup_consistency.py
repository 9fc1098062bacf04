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
