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


def test_cdc_static_hash_equals_rolling_fold():
    """Round-6 ADVICE: the DuckDB oracle's static window hash must be the
    IDENTICAL polynomial the Spark Rabin-Karp fold accumulates — not
    merely boundary-equivalent under the 31^2 ≡ 1 (mod 64) coincidence.
    Pin per-position hash equality (not just zero sets) for arbitrary
    text and for a divisor (128) where the old reversed pairing would
    diverge."""
    import re

    from yc_data_proc_metadata_import_spark.llm.text import (
        _CDC_POWS,
        _CDC_W,
        _cdc_hash_terms_duck,
    )

    # Evaluate the oracle's SQL term string in pure Python: at[i - k] is
    # 1-based indexing into the codepoint list.
    terms = re.findall(
        r"CAST\(cs\[i - (\d+)\] AS BIGINT\) \* (\d+)", _cdc_hash_terms_duck("cs", "i")
    )
    assert len(terms) == _CDC_W

    def static_hash(cs, i):  # i is 1-based like the SQL
        return sum(cs[i - int(k) - 1] * int(p) for k, p in terms)

    text = "the quick brown fox, jumps over 13 lazy dogs! éü中"
    cs = [ord(c) for c in text]

    def rolling(cs):
        """The Spark fold: warmup h*31+c, then (h-c_out*31^(W-1))*31+c_in;
        yields (i, h) for every 1-based position i >= W."""
        h = 0
        for i, c in enumerate(cs, start=1):
            if i <= _CDC_W:
                h = h * 31 + c
            else:
                h = (h - cs[i - _CDC_W - 1] * _CDC_POWS[_CDC_W - 1]) * 31 + c
            if i >= _CDC_W:
                yield i, h

    for i, h in rolling(cs):
        assert static_hash(cs, i) == h, f"position {i}: static != rolling"
    # The property that actually protects the oracle: equality holds as
    # raw integers, so boundary sets agree for ANY divisor.
    for div in (64, 128, 101):
        assert {i for i, h in rolling(cs) if h % div == 0} == {
            i for i, h in rolling(cs) if static_hash(cs, i) % div == 0
        }


def test_winnowing_hex_fold_matches_conv():
    """The winnowing oracle folds md5's first 8 hex chars with
    a*16 + digit (big-endian); the Spark side uses conv(hex, 16, 10).
    Pin that the fold IS base-16 big-endian positional value — the same
    audit class as the CDC exponent pairing (engine results must agree
    as raw integers, not by coincidence). Replays the oracle's
    digit-decode CASE (0-9 via -48, a-f via -87) in Python against
    int(hex, 16) over every digit combination class and random md5
    prefixes."""
    import hashlib
    import random

    def duck_fold(hex8: str) -> int:
        acc = 0
        for c in hex8:
            d = ord(c) - 48 if "0" <= c <= "9" else ord(c) - 87
            acc = acc * 16 + d
        return acc

    rng = random.Random(7)
    samples = ["00000000", "ffffffff", "0123abcd", "deadbeef"]
    samples += [
        hashlib.md5(str(rng.random()).encode()).hexdigest()[:8] for _ in range(200)
    ]
    for h in samples:
        assert duck_fold(h) == int(h, 16), h
