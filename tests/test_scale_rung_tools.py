"""Pin the scale-rung evidence tools (round-12 VERDICT task 5).

tools/make_sf1.py (the sf1/sf10 fixture generator) and tools/sf1_rung.py's
checksum comparator are load-bearing evidence producers: the judge reads
SF1_RUNG_r*.json / SF10_RUNG_r*.json as the measured 10x/100x scale proof,
and a silent edit to either tool would invalidate cross-round rung
comparisons without failing anything. These tests make that class of edit
loud:

- generator determinism: same inputs => byte-identical parquet output
  (the bit-reproducibility the tool's docstring claims — rung fixtures can
  be reaped and rebuilt between rounds without changing what was measured);
- generator integrity: the tool's own FK/uniqueness audit must pass (the
  subprocess exit code IS the audit);
- schema byte-compatibility: replicated tables keep the SOURCE column
  types — the copy-offset arithmetic must not widen 32-bit keys to BIGINT
  (round-12 ADVICE), or the rung would exercise different types than the
  driver tier;
- checksum comparator: integer sums widen to DECIMAL(38,0) (Spark
  sum(bigint) wraps at 2^63, DuckDB widens to HUGEINT — the live sf10
  win_sessionize finding), decimals keep their scale, doubles are
  excluded, and a no-summable-column schema raises instead of silently
  degrading to a count-only "match".
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAKE_SF1 = os.path.join(REPO, "tools", "make_sf1.py")
SRC = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _load_rung_module():
    spec = importlib.util.spec_from_file_location(
        "sf1_rung_for_test", os.path.join(REPO, "tools", "sf1_rung.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    """Run the generator TWICE (COPIES=3 over sf0.001) into separate dirs."""
    outs = []
    for i in (1, 2):
        out = str(tmp_path_factory.mktemp(f"rung{i}"))
        env = dict(
            os.environ,
            SPARK_GRAFT_SF1_SRC=SRC,
            SPARK_GRAFT_SF1_OUT=out,
            SPARK_GRAFT_SF1_COPIES="3",
        )
        r = subprocess.run(
            [sys.executable, MAKE_SF1],
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        # exit code 0 == the tool's own FK-join / key-uniqueness /
        # n_chars-consistency audit passed on the generated output
        assert r.returncode == 0, f"generator audit failed:\n{r.stdout}\n{r.stderr}"
        outs.append(out)
    return outs


def test_generator_deterministic_bytes(generated):
    a, b = generated
    for t in TABLES:
        with open(os.path.join(a, f"{t}.parquet"), "rb") as fa, open(
            os.path.join(b, f"{t}.parquet"), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f"{t}: two identical runs differ"


def test_generator_preserves_source_schema(generated):
    out = generated[0]
    for t in TABLES:
        src = pq.read_schema(os.path.join(SRC, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(out, f"{t}.parquet"))
        assert [(f.name, f.type) for f in src] == [
            (f.name, f.type) for f in got
        ], f"{t}: rung schema diverged from source"


def test_generator_scales_rowcounts(generated):
    out = generated[0]
    for t in TABLES:
        n_src = pq.read_metadata(os.path.join(SRC, f"{t}.parquet")).num_rows
        n_out = pq.read_metadata(os.path.join(out, f"{t}.parquet")).num_rows
        want = n_src if t in ("region", "nation") else 3 * n_src
        assert n_out == want, f"{t}: {n_out} rows, want {want}"


def test_checksum_plan_widens_bigint_past_wrap(spark):
    rung = _load_rung_module()
    # two values whose bigint sum exceeds 2^63 (Spark sum(bigint) would
    # wrap negative); the DECIMAL(38,0) widening must keep it exact
    big = 2**62 + 7
    df = spark.createDataFrame([(big,), (big,), (big,)], "v: bigint")
    num_cols, exprs, sums = rung.checksum_plan(df, "t")
    assert num_cols == ["v"]
    row = df.agg(*exprs).collect()[0].asDict()
    assert int(row["s_v"]) == 3 * big  # > 2^63: wrapped sum would be negative
    assert row["n"] == 3
    assert "CAST(v AS DECIMAL(38,0))" in sums


def test_checksum_plan_keeps_decimal_scale(spark):
    from decimal import Decimal

    rung = _load_rung_module()
    df = spark.createDataFrame(
        [(Decimal("1.25"),), (Decimal("2.50"),)], "d: decimal(10,2)"
    )
    num_cols, exprs, sums = rung.checksum_plan(df, "t")
    assert num_cols == ["d"]
    row = df.agg(*exprs).collect()[0].asDict()
    assert row["s_d"] == Decimal("3.75")  # scale preserved, not truncated
    assert "CAST(d AS DECIMAL(38,0))" not in sums


def test_checksum_plan_rejects_unsummable_schema(spark):
    rung = _load_rung_module()
    df = spark.createDataFrame([(1.5, "x")], "a: double, b: string")
    with pytest.raises(ValueError, match="no int/decimal columns"):
        rung.checksum_plan(df, "t")


def test_hard_truth_biased_model_degenerates_to_uniform():
    """The biased-bit edge model (round-17 VERDICT task 5) must agree
    with the closed-form uniform floor when fed uniform marginals — the
    two derivations (inclusion-exclusion over xor weight vs over
    agreeing blocks + Poisson-binomial tail) are independent, so
    equality is a real cross-check of both."""
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "hard_truth_for_test", os.path.join(REPO, "tools", "hard_truth_analysis.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    uniform = mod.analytic_uniform_edge_p()
    biased_at_half = mod.analytic_biased_edge_p(np.full(60, 0.5))
    assert abs(biased_at_half - uniform) < 1e-15

    # Any bias lowers per-bit disagreement, so the edge probability is
    # monotone: the r17 corpus's measured marginal shape must predict
    # MORE edges than uniform (the direction of the 9.4x gap).
    skewed = np.full(60, 0.42)
    skewed[0] = 0.006
    assert mod.analytic_biased_edge_p(skewed) > uniform

    # Poisson-binomial DP sanity: Binomial(4, 0.5) tail.
    assert abs(mod._poisson_binomial_cdf(np.full(4, 0.5), 1) - 5 / 16) < 1e-12
