"""The BPE merge is implemented twice — a Spark higher-order fold
(llm/text._bpe_apply_merge) and the oracle's gaps-and-islands SQL — both
claiming greedy leftmost-nonoverlapping semantics. This test pins the
Spark fold to a direct python reference scan over adversarial and
random spellings in one job (the oracle side is pinned by the
llm_bpe_train parity test)."""

from __future__ import annotations

import random

from yc_data_proc_metadata_import_spark.llm.text import _bpe_apply_merge


def _greedy_merge(sp: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(sp):
        if i + 1 < len(sp) and sp[i] == a and sp[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sp[i])
            i += 1
    return out


def test_spark_fold_matches_greedy_reference(spark):
    rng = random.Random(42)
    cases = [
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["b", "a", "b", "b"], "a", "b"),
        (["x"], "a", "b"),
        (["a", "b"], "a", "b"),
        (["b", "a"], "a", "b"),
    ]
    for _ in range(200):
        n = rng.randint(1, 12)
        sp = [rng.choice("ab x") for _ in range(n)]
        pair = (rng.choice("abx"), rng.choice("abx"))
        cases.append((sp, *pair))
    rows = [(i, sp, a, b) for i, (sp, a, b) in enumerate(cases)]
    # one merge expression per distinct pair, applied to that pair's rows
    results: dict[int, list] = {}
    by_pair: dict[tuple, list] = {}
    for i, sp, a, b in rows:
        by_pair.setdefault((a, b), []).append((i, sp))
    for (a, b), members in by_pair.items():
        df = spark.createDataFrame(members, "i long, sp array<string>")
        merged = _bpe_apply_merge(df, a, b).collect()
        for r in merged:
            results[r["i"]] = list(r["sp"])
    for i, (sp, a, b) in enumerate(cases):
        want = _greedy_merge(sp, a, b)
        assert results[i] == want, (
            f"case {i}: sp={sp} pair=({a},{b}) spark={results[i]} want={want}"
        )
