"""Permutation entropy, JL projection, association rules."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.eventstats import assoc_rules
from orange3_timeseries_spark.operators.randomness import (
    permutation_entropy,
)
from orange3_timeseries_spark.operators.similarity import jl_project


def _series(spark, values, sid="a"):
    rows = [(sid, float(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["sid", "t", "v"])


class TestPermutationEntropy:
    def test_monotone_pe_zero(self, spark):
        row = permutation_entropy(_series(spark, range(50)), "t", "v",
                                  ["sid"]).collect()[0]
        assert row["pe"] == pytest.approx(0.0)
        assert row["n_patterns"] == 1
        assert row["n_triples"] == 48

    def test_white_noise_pe_near_one(self, spark):
        rng = np.random.RandomState(0)
        row = permutation_entropy(_series(spark, rng.normal(size=2000)),
                                  "t", "v", ["sid"]).collect()[0]
        assert row["pe"] > 0.97
        assert row["n_patterns"] == 6

    def test_period2_oscillation_two_patterns(self, spark):
        # 1,9,1,9,... -> only (acb) and (bac)-family patterns appear
        row = permutation_entropy(_series(spark, [1, 9] * 40), "t", "v",
                                  ["sid"]).collect()[0]
        assert row["n_patterns"] == 2
        # two equiprobable patterns: H = ln2, pe = ln2/ln6
        assert row["pe"] == pytest.approx(
            round(math.log(2) / math.log(6), 6), abs=2e-2)

    def test_matches_direct_count(self, spark):
        rng = np.random.RandomState(1)
        v = np.round(rng.normal(size=200), 1)  # forces ties
        row = permutation_entropy(_series(spark, v), "t", "v",
                                  ["sid"]).collect()[0]
        counts = {}
        for a, b, c in zip(v, v[1:], v[2:]):
            # stable argsort of (value, index) = Bandt-Pompe tie rule
            order = tuple(np.argsort([a, b, c], kind="stable"))
            counts[order] = counts.get(order, 0) + 1
        n = sum(counts.values())
        h = -sum(k / n * math.log(k / n) for k in counts.values())
        assert row["n_triples"] == n
        assert row["n_patterns"] == len(counts)
        assert row["pe"] == pytest.approx(h / math.log(6), abs=1e-6)


class TestJLProject:
    def test_distance_preservation(self, spark):
        rng = np.random.RandomState(2)
        vecs = rng.normal(size=(60, 64)).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
        out = jl_project(df).toPandas().set_index("vec_id").sort_index()
        p = out.values
        dn = np.linalg.norm(vecs[:, None] - vecs[None, :], axis=2)
        dp = np.linalg.norm(p[:, None] - p[None, :], axis=2)
        m = dn > 0
        ratio = dp[m] / dn[m]
        assert 0.8 < ratio.mean() < 1.2        # norms preserved on avg
        assert ratio.std() < 0.5               # k=8 JL concentration

    def test_deterministic_and_linear(self, spark):
        v = [float(i) / 64 for i in range(64)]
        df = spark.createDataFrame(
            [(1, v), (2, v), (3, [2 * x for x in v])],
            "vec_id long, embedding array<float>")
        out = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df).collect()}
        assert out[1] == out[2]                       # same input
        for a, b in zip(out[1], out[3]):              # 2x input ~ 2x out
            assert b == pytest.approx(2 * a, abs=1e-4)

    def test_rows_differ_across_dims(self, spark):
        # regression: an affine mod-3 hash repeated rows every 3 dims
        rng = np.random.RandomState(3)
        v = [float(x) for x in rng.normal(size=64)]
        df = spark.createDataFrame([(1, v)],
                                   "vec_id long, embedding array<float>")
        row = jl_project(df).collect()[0]
        vals = [row[f"p{t}"] for t in range(8)]
        assert len(set(vals)) == 8

    def test_gemm_engine_bit_identical(self, spark):
        # the Pandas-UDF GEMM fast path must reproduce the Catalyst
        # HOF path EXACTLY: same LCG matrix, same HALF_UP integer
        # quantization, exact int64 sums -> identical doubles
        rng = np.random.RandomState(17)
        vecs = rng.normal(size=(120, 64)).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
        hof = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(8))
               for r in jl_project(df).collect()}
        gemm = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(8))
                for r in jl_project(df, engine="gemm").collect()}
        assert hof == gemm      # exact equality, not approx

    def test_gemm_engine_other_dims(self, spark):
        # equivalence holds at a non-default (out_dim, unit_scale) too
        rng = np.random.RandomState(23)
        vecs = rng.normal(size=(40, 16))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        hof = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(4))
               for r in jl_project(df, out_dim=4,
                                   unit_scale=5).collect()}
        gemm = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(4))
                for r in jl_project(df, out_dim=4, unit_scale=5,
                                    engine="gemm").collect()}
        assert hof == gemm

    def test_unknown_engine_raises(self, spark):
        df = spark.createDataFrame([(1, [1.0, 2.0])],
                                   "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            jl_project(df, engine="numpy")

    def test_gemm_half_up_boundary_matches_catalyst(self, spark):
        # ties and near-tie values through the full e*1e6 pipeline on
        # both signs (NOTE: the truly divergent double 0.5 - 2^-54 is
        # unreachable as e*1e6 at unit_scale=6 — the direct unit test
        # below is the regression catcher for the rounding form; this
        # test pins end-to-end tie agreement)
        eps = 0.49999999999999994 / 1e6
        tie = 1.5 / 1e6                        # exactly representable .5
        vecs = [[eps] * 8, [-eps] * 8, [tie] * 8, [-tie] * 8,
                [2.4999999999999996 / 1e6] * 8]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        hof = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(8))
               for r in jl_project(df).collect()}
        gemm = {r["vec_id"]: tuple(r[f"p{t}"] for t in range(8))
                for r in jl_project(df, engine="gemm").collect()}
        assert hof == gemm

    def test_half_up_exact_matches_spark_semantics_directly(self):
        # drive the raw boundary doubles straight into the rounding
        # helper: Spark's F.round(x) is BigDecimal(shortest-repr of x)
        # HALF_UP, replayed here via decimal.Decimal(repr(x)).  The
        # add-based floor(x+0.5) form FAILS this test at 0.5 - 2^-54
        # (the IEEE add rounds half-even up to exactly 1.0), which is
        # exactly the regression this pins against.
        import decimal

        from orange3_timeseries_spark.operators.similarity import (
            _half_up_exact,
        )

        def spark_round(x):
            return float(decimal.Decimal(repr(x)).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))

        boundary = 0.5 - 2.0 ** -54            # largest double < 0.5
        cases = [boundary, -boundary, 0.5, -0.5, 1.5, -1.5, 2.5,
                 2.4999999999999996, -2.4999999999999996,
                 0.49999999999999994, 1e6 + 0.5, -(1e6 + 0.5),
                 123456.49999999999, 0.0, 7.0, -7.0]
        got = _half_up_exact(np.array(cases))
        for x, g in zip(cases, got):
            assert g == spark_round(x), x
        # and the old add-based form demonstrably diverges here, so
        # this test genuinely discriminates the two implementations
        assert np.floor(boundary + 0.5) == 1.0
        assert _half_up_exact(np.array([boundary]))[0] == 0.0

    def test_half_up_exact_property_sweep(self):
        # hypothesis: on arbitrary finite doubles in the |x| < 2^52
        # contract range, the helper equals Spark's shortest-string
        # HALF_UP semantics (Decimal of repr)
        import decimal

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from orange3_timeseries_spark.operators.similarity import (
            _half_up_exact,
        )

        @settings(max_examples=500, deadline=None)
        @given(st.floats(allow_nan=False, allow_infinity=False,
                         min_value=-1e12, max_value=1e12))
        def check(x):
            want = float(decimal.Decimal(repr(x)).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
            assert _half_up_exact(np.array([x]))[0] == want, x

        check()

    def test_gemm_null_and_ragged_vectors(self, spark):
        # NULL embeddings must yield NULL projections (the Catalyst
        # behavior), and mixed vector lengths in one batch must not
        # crash — each length group gets its own hash matrix
        rows = [(1, [1.0] * 8), (2, None), (3, [2.0] * 4)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        got = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df, engine="gemm").collect()}
        assert got[2] == [None] * 8
        hof = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df).collect()}
        assert got[1] == hof[1] and got[3] == hof[3]

    def test_gemm_nonfinite_elements_yield_null(self, spark):
        # regression (ADVICE r8): an element-level NULL/NaN used to
        # flow through .astype(int64) as INT64_MIN and emit a huge
        # wrong projection — it must yield NULL outputs instead, in
        # BOTH the homogeneous batch path and the ragged path
        nan = float("nan")
        inf = float("inf")
        # homogeneous batch (all length 8) with dirty rows mixed in
        rows = [(1, [1.0] * 8), (2, [1.0] * 4 + [nan] + [1.0] * 3),
                (3, [inf] * 8), (4, [2.0] * 8),
                (5, [1.0] * 7 + [None])]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        got = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df, engine="gemm").collect()}
        assert got[2] == [None] * 8
        assert got[3] == [None] * 8
        assert got[5] == [None] * 8
        hof = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df).collect()}
        assert got[1] == hof[1] and got[4] == hof[4]
        # ragged batch: dirty rows inside one length group, clean
        # rows of another length still project exactly
        rows = [(1, [1.0] * 8), (2, [nan] * 4), (3, [2.0] * 4)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        got = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df, engine="gemm").collect()}
        assert got[2] == [None] * 8
        hof = {r["vec_id"]: [r[f"p{t}"] for t in range(8)]
               for r in jl_project(df).collect()}
        assert got[1] == hof[1] and got[3] == hof[3]


class TestAssocRules:
    def test_known_counts(self, spark):
        # 6 baskets: A in all, B in 4, AB together in 4, C alone in 2
        rows = ([(i, "A") for i in range(6)]
                + [(i, "B") for i in range(4)]
                + [(i, "C") for i in (4, 5)])
        df = spark.createDataFrame(rows, ["b", "i"])
        out = {(r["antecedent"], r["consequent"]): r
               for r in assoc_rules(df, "b", "i", min_both=1).collect()}
        ab = out[("A", "B")]
        assert ab["n_both"] == 4
        assert ab["support"] == pytest.approx(4 / 6, abs=1e-6)
        assert ab["confidence"] == pytest.approx(4 / 6, abs=1e-6)
        assert ab["lift"] == pytest.approx((4 * 6) / (6 * 4), abs=1e-6)
        ba = out[("B", "A")]
        assert ba["confidence"] == pytest.approx(1.0)   # A in every B
        assert ba["lift"] == pytest.approx(1.0)          # A is universal

    def test_duplicate_events_count_once(self, spark):
        rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
        df = spark.createDataFrame(rows, ["b", "i"])
        out = {(r["antecedent"], r["consequent"]): r["n_both"]
               for r in assoc_rules(df, "b", "i", min_both=1).collect()}
        assert out[("A", "B")] == 2

    def test_negative_association_lift_below_one(self, spark):
        # A and B never co-occur except forced once; C co-occurs with A
        rows = ([(i, "A") for i in range(5)]
                + [(i, "B") for i in range(5, 9)] + [(0, "B")]
                + [(i, "C") for i in range(5)])
        df = spark.createDataFrame(rows, ["b", "i"])
        out = {(r["antecedent"], r["consequent"]): r
               for r in assoc_rules(df, "b", "i", min_both=1).collect()}
        assert out[("A", "B")]["lift"] < 1.0
        assert out[("A", "C")]["lift"] > 1.0
