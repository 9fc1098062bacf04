"""Pin tools/sf10_label_fixpoint.py's numpy kernel against brute force.

The tool is the round-15 evidence producer that upgrades the sf10
`llm_dedup_simhash_labels` adjudication from invariants+sampled-edges to
a FULL exact fixpoint (SF10_LABEL_FIXPOINT_r15.json).  Its claim rests on
two pure-numpy pieces this test checks independently of any fixture:

- `_pairs_in_block` must enumerate EXACTLY the banded edge relation
  (one 15-bit block agrees AND Hamming <= T) over every (i, j) tile
  shape, including the diagonal tile's strict-upper-triangle mask;
- `_chunk_star_edges` + `_propagate` must reproduce brute-force
  union-find components when the tile/chunk sizes are shrunk far below
  the fp count (so the multi-tile + star-compression + driver-fixpoint
  path is actually exercised, not the single-chunk trivial case).

Fingerprints are seeded near-dup families (flip <= 6 of 60 bits) plus
uniform noise — both intra-family edges and the occasional cross-family
collision appear, matching the shapes the real corpus produces.
"""

from __future__ import annotations

import importlib.util
import os
import random

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixtool():
    spec = importlib.util.spec_from_file_location(
        "sf10_label_fixpoint", os.path.join(REPO, "tools", "sf10_label_fixpoint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_fps(n_families: int, fam_size: int, n_noise: int, seed: int) -> np.ndarray:
    rng = random.Random(seed)
    fps: list[int] = []
    for _ in range(n_families):
        base = rng.getrandbits(60)
        fps.append(base)
        for _ in range(fam_size - 1):
            v = base
            for b in rng.sample(range(60), rng.randint(1, 6)):
                v ^= 1 << b
            fps.append(v)
    fps.extend(rng.getrandbits(60) for _ in range(n_noise))
    # tool contract: distinct fps (the GROUP BY upstream guarantees it)
    return np.array(sorted(set(fps)), dtype=np.uint64)


def _brute_edges(fps: np.ndarray, t: int) -> set[tuple[int, int]]:
    masks = [0x7FFF << (15 * b) for b in range(4)]
    out = set()
    vals = [int(v) for v in fps]
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            x = vals[i] ^ vals[j]
            if any((x & m) == 0 for m in masks) and bin(x).count("1") <= t:
                out.add((i, j))
    return out


def _brute_components(n: int, edges: set[tuple[int, int]]) -> list[int]:
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    roots = [find(i) for i in range(n)]
    # canonical: min index per component
    comp_min: dict[int, int] = {}
    for i, r in enumerate(roots):
        comp_min[r] = min(comp_min.get(r, i), i)
    return [comp_min[r] for r in roots]


@pytest.mark.parametrize("seed", [7, 41])
def test_pairs_in_block_matches_brute_force(fixtool, seed, monkeypatch):
    fps = _make_fps(n_families=8, fam_size=6, n_noise=40, seed=seed)
    monkeypatch.setattr(fixtool, "_FPS", fps)
    monkeypatch.setattr(
        fixtool,
        "_BLOCK_MASKS",
        np.array([0x7FFF << (15 * b) for b in range(4)], dtype=np.uint64),
    )
    n = fps.shape[0]
    want = _brute_edges(fps, fixtool._HAM_T)
    got: set[tuple[int, int]] = set()
    step_i, step_j = 16, 24  # deliberately tiny, non-divisor tile shapes
    for i0 in range(0, n, step_i):
        i1 = min(i0 + step_i, n)
        for j0 in range(i0, n, step_j):
            gi, gj = fixtool._pairs_in_block(i0, i1, j0, min(j0 + step_j, n))
            got.update(zip(gi.tolist(), gj.tolist()))
    # tiles with j0 > i0 may emit j < i duplicates of pairs the diagonal
    # tile already holds? no — assert orientation to catch that too
    assert all(i < j for i, j in got)
    assert got == want


@pytest.mark.parametrize("seed", [3, 99])
def test_chunked_star_edges_reproduce_union_find(fixtool, seed, monkeypatch):
    fps = _make_fps(n_families=10, fam_size=7, n_noise=60, seed=seed)
    monkeypatch.setattr(fixtool, "_FPS", fps)
    monkeypatch.setattr(
        fixtool,
        "_BLOCK_MASKS",
        np.array([0x7FFF << (15 * b) for b in range(4)], dtype=np.uint64),
    )
    monkeypatch.setattr(fixtool, "I_CHUNK", 16)
    monkeypatch.setattr(fixtool, "J_CHUNK", 32)
    n = fps.shape[0]
    edges = _brute_edges(fps, fixtool._HAM_T)
    assert edges, "fixture must produce edges or the test proves nothing"
    want = _brute_components(n, edges)

    all_nodes, all_labels, n_edges = [], [], 0
    for i0 in range(0, n, fixtool.I_CHUNK):
        nodes, labels, cnt = fixtool._chunk_star_edges(i0)
        if nodes.size:
            all_nodes.append(nodes)
            all_labels.append(labels)
        n_edges += cnt
    assert n_edges == len(edges)
    final = np.arange(n, dtype=np.int64)
    fixtool._propagate(
        final, np.concatenate(all_nodes), np.concatenate(all_labels)
    )
    assert final.tolist() == want
