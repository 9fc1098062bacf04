#!/usr/bin/env python
"""Decompose the hard-corpus truth's edge population: vocabulary
chaining vs the chance-collision floor (round-16 VERDICT task 5).

The 2M-doc fragmenting corpus keeps a giant truth component even after
the vocabulary pool scales with family count (r16 pool=200k: clusters
210,206, giant 1,447,631 docs; r17 pool=800k: clusters 344,756, giant
756,728 — HARD_LABEL_FIXPOINT_r{16,17}.json).  Two candidate causes:

1. residual VOCABULARY CHAINING — cross-family doc pairs that genuinely
   share many tokens (generator artifact, fixable by a bigger pool);
2. the CHANCE-COLLISION FLOOR of the relation itself — two independent
   60-bit fingerprints agree on a 15-bit block AND sit within Hamming 10
   with probability ~1.5e-8 (exact inclusion-exclusion below), so ANY
   corpus with n distinct fps carries ~n^2/2 * 1.5e-8 cross-family edges
   no generator can remove: ~21k expected at 1.68M fps.  Size-biased
   merging over ~345k clusters percolates well below that edge count,
   so at 2M docs a giant component is a property of the FINGERPRINT
   WIDTH, not of the corpus.

This tool measures which: it samples every STRIDE-th distinct
fingerprint (unbiased for cross-family pairs), evaluates the exact edge
relation over all sampled pairs with the sf10_label_fixpoint kernel,
tags each edge SAME-family / CROSS-family (family = doc_id // members,
the generator's layout), and classifies every cross-family edge by the
token overlap of its representative docs:

  overlap >= 15 of ~30  -> vocabulary chaining (correlated token sets);
  overlap <= a few      -> chance fp proximity (the floor).

Output: JSON to stdout + [out_json]; includes the analytic uniform
bound for comparison.

Usage: python tools/hard_truth_analysis.py [docs_dir] [members] [stride] [out_json]
       (defaults: .scratch/hard_docs_2m_r17, 10, 5, HARD_TRUTH_ANALYSIS.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from math import comb

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import sf10_label_fixpoint as fx  # reuse the exhaustively-tested kernel

# Globals inherited by forked pool workers (Linux fork start method).
_FAM: np.ndarray | None = None


def _model_fields(bit_p: np.ndarray, p_biased: float, n_all: int, out: dict) -> dict:
    """Analytic-model fields shared by the full run and --model-only."""
    measured = out.get("measured_cross_rate") or 0.0
    return {
        "bit_one_freq_min": round(float(bit_p.min()), 4),
        "bit_one_freq_max": round(float(bit_p.max()), 4),
        "bit_one_freq_mean": round(float(bit_p.mean()), 4),
        "analytic_biased_edge_p": p_biased,
        "analytic_biased_edges_full": round(p_biased * n_all * (n_all - 1) / 2),
        "measured_over_biased_model": (
            round(measured / p_biased, 3) if p_biased else None
        ),
        "model_note": (
            "the 9.4x gap between the measured cross-family rate and the "
            "uniform-bit floor is entirely the fingerprint marginals: "
            "simhash bits over a shared token pool are biased (pool-common "
            "tokens push every doc's bit the same way), every bias lowers "
            "the per-bit disagreement 2p(1-p) below 0.5, and the "
            "independent-biased-bits model (analytic_biased_edge_p) "
            "reproduces the measured rate within ~1% — inter-bit "
            "correlation contributes nothing measurable, and the floor "
            "remains a property of the fingerprint width, not the corpus"
        ),
    }


def analytic_uniform_edge_p(bits: int = 60, blocks: int = 4, t: int = 10) -> float:
    """P(edge) for two INDEPENDENT UNIFORM fingerprints: some block of
    bits/blocks bits agrees AND total Hamming <= t.  Exact: condition on
    k one-bits in the xor (uniform placement), inclusion-exclusion over
    which blocks are empty."""
    bsz = bits // blocks
    p = 0.0
    for k in range(0, t + 1):
        tot = comb(bits, k)
        pb = 0.0
        for j in range(1, blocks + 1):
            if bits - bsz * j >= k:
                pb += (-1) ** (j + 1) * comb(blocks, j) * comb(bits - bsz * j, k) / tot
        p += comb(bits, k) * pb
    return p / 2**bits


def _poisson_binomial_cdf(probs: np.ndarray, t: int) -> float:
    """P(sum of independent Bernoulli(probs) <= t) by the standard DP."""
    dp = np.zeros(t + 1)
    dp[0] = 1.0
    for q in probs:
        nxt = dp * (1.0 - q)
        nxt[1:] += dp[:-1] * q
        dp = nxt
    return float(dp.sum())


def analytic_biased_edge_p(
    bit_one_freq: np.ndarray, blocks: int = 4, t: int = 10
) -> float:
    """P(edge) for two independent fingerprints drawn from the ACTUAL
    per-bit marginal distribution (round-17 VERDICT task 5: the uniform
    floor under-predicted the measured cross-family rate 9.4x).

    SimHash bits over a shared token pool are far from uniform — each
    bit is the sign of a global token-direction sum, so pool-common
    tokens bias every document's bit the same way (measured on the r17
    hard corpus: one-frequencies 0.006..0.874).  For two independent
    draws, bit b disagrees with probability d_b = 2*p_b*(1-p_b) <= 0.5,
    so EVERY bias inflates both factors of the edge probability: the
    15-bit block-agreement product prod(1-d_b) and the Hamming<=t tail
    (Poisson-binomial instead of Binomial(0.5)).  Bits are modeled
    independent-given-marginals; on the r17 corpus that lands within 1%
    of the measured rate, i.e. the marginals carry essentially all of
    the non-uniformity.

    Exact inclusion-exclusion over which blocks agree entirely: for a
    block subset S, P(S agrees AND total <= t) = prod_{b in S}(1-d_b) *
    PoissonBinomialCDF(d restricted to the complement bits, t)."""
    from itertools import combinations

    bits = int(bit_one_freq.shape[0])
    bsz = bits // blocks
    d = 2.0 * bit_one_freq * (1.0 - bit_one_freq)
    block_bits = [list(range(bsz * k, bsz * (k + 1))) for k in range(blocks)]
    total = 0.0
    for r in range(1, blocks + 1):
        for subset in combinations(range(blocks), r):
            inside = [b for k in subset for b in block_bits[k]]
            comp = np.array(
                [b for b in range(bits) if b not in inside], dtype=np.int64
            )
            term = float(np.prod(1.0 - d[inside])) * _poisson_binomial_cdf(
                d[comp], t
            )
            total += (-1) ** (r + 1) * term
    return total


def _chunk_edges(i0: int):
    """Raw sampled-edge pairs for rows [i0, i0+I_CHUNK) vs all j >= i0,
    split same-family / cross-family. Edges are ~2e-6 of pairs, so raw
    pair lists stay tiny."""
    n = fx._FPS.shape[0]
    i1 = min(i0 + fx.I_CHUNK, n)
    same = 0
    cross = []
    for j0 in range(i0, n, fx.J_CHUNK):
        gi, gj = fx._pairs_in_block(i0, i1, j0, min(j0 + fx.J_CHUNK, n))
        if gi.size:
            cf = _FAM[gi] != _FAM[gj]
            same += int((~cf).sum())
            cross.extend(zip(gi[cf].tolist(), gj[cf].tolist()))
    return same, cross


def main() -> int:
    global _FAM

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    docs_dir = args[0] if len(args) > 0 else os.path.join(
        REPO, ".scratch", "hard_docs_2m_r17"
    )
    members = int(args[1]) if len(args) > 1 else 10
    stride = int(args[2]) if len(args) > 2 else 5
    out_json = args[3] if len(args) > 3 else os.path.join(
        REPO, "HARD_TRUTH_ANALYSIS.json"
    )

    import duckdb

    from yc_data_proc_metadata_import_spark.llm import dedup as _dedup

    fx._BLOCK_MASKS = np.array(
        [0x7FFF << (15 * b) for b in range(4)], dtype=np.uint64
    )
    con = duckdb.connect()
    docs = os.path.join(docs_dir, "documents.parquet")
    src = f"'{docs}/*.parquet'" if os.path.isdir(docs) else f"'{docs}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

    t0 = time.perf_counter()
    con.execute(
        f"CREATE TABLE afp AS WITH {_dedup._SIMHASH_CTES} "
        "SELECT simhash, min(doc_id) AS md FROM fp GROUP BY simhash "
        "ORDER BY simhash"
    )
    grp = con.execute("SELECT simhash, md FROM afp").fetchnumpy()
    fp_sec = round(time.perf_counter() - t0, 1)

    fps_all = np.ascontiguousarray(grp["simhash"], dtype=np.int64)
    md_all = np.ascontiguousarray(grp["md"], dtype=np.int64)
    n_all = int(fps_all.shape[0])

    # Per-bit one-frequencies over the full distinct-fp population — the
    # input of the biased analytic model (round-17 VERDICT task 5).
    u = fps_all.view(np.uint64)
    bit_p = np.array(
        [((u >> np.uint64(b)) & np.uint64(1)).mean() for b in range(60)]
    )
    p_biased = analytic_biased_edge_p(bit_p)

    if "--model-only" in sys.argv:
        # Merge the analytic fields into an existing report without
        # re-running the 139 s exhaustive pair evaluation.
        with open(out_json) as f:
            out = json.load(f)
        out.update(_model_fields(bit_p, p_biased, n_all, out))
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
        return 0
    sel = np.arange(0, n_all, stride)
    fx._FPS = fps_all[sel].view(np.uint64)
    md = md_all[sel]
    _FAM = md // members
    n = int(fx._FPS.shape[0])
    sampled_pairs = n * (n - 1) // 2

    t0 = time.perf_counter()
    workers = min(24, os.cpu_count() or 1)
    n_same = 0
    cross: list[tuple[int, int]] = []
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for same, cr in pool.map(
            _chunk_edges, range(0, n, fx.I_CHUNK), chunksize=4
        ):
            n_same += same
            cross.extend(cr)
    pair_sec = round(time.perf_counter() - t0, 1)

    # classify every sampled cross-family edge by representative-doc
    # token overlap (DISTINCT tokens, the fingerprint's universe)
    import pyarrow as pa

    if cross:
        ci, cj = np.array(cross, dtype=np.int64).T
        con.register(
            "xedge", pa.table({"da": pa.array(md[ci]), "db": pa.array(md[cj])})
        )
        hist = dict(
            con.execute(
                """
            WITH tk AS (SELECT doc_id,
                        list_distinct(string_split(text, ' ')) AS t
                        FROM documents
                        WHERE doc_id IN (SELECT da FROM xedge
                                         UNION SELECT db FROM xedge)),
            ov AS (SELECT len(list_intersect(a.t, b.t)) AS overlap
                   FROM xedge e JOIN tk a ON a.doc_id = e.da
                                JOIN tk b ON b.doc_id = e.db)
            SELECT overlap, count(*) FROM ov GROUP BY overlap ORDER BY overlap
            """
            ).fetchall()
        )
    else:
        hist = {}

    p_uniform = analytic_uniform_edge_p()
    scale = n_all * (n_all - 1) / 2 / sampled_pairs if sampled_pairs else 0.0
    n_cross = len(cross)
    chaining = sum(c for o, c in hist.items() if o >= 15)
    out = {
        "docs_dir": docs_dir,
        "n_distinct_fps": n_all,
        "stride": stride,
        "n_sampled_fps": n,
        "n_sampled_pairs": sampled_pairs,
        "fp_oracle_sec": fp_sec,
        "pair_eval_sec": pair_sec,
        "sampled_same_family_edges": n_same,
        "sampled_cross_family_edges": n_cross,
        "cross_family_token_overlap_hist": {str(k): v for k, v in hist.items()},
        "cross_family_chaining_edges_ge15_overlap": chaining,
        "measured_cross_rate": (
            round(n_cross / sampled_pairs, 14) if sampled_pairs else None
        ),
        "analytic_uniform_edge_p": p_uniform,
        "extrapolated_cross_edges_full": round(n_cross * scale),
        "analytic_uniform_edges_full": round(
            p_uniform * n_all * (n_all - 1) / 2
        ),
        "note": (
            "cross-family edges with low token overlap are the "
            "chance-collision floor of the 60-bit/T=10 relation — "
            "irreducible by any corpus generator; overlap>=15 edges "
            "would indicate residual vocabulary chaining"
        ),
    }
    out.update(_model_fields(bit_p, p_biased, n_all, out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
