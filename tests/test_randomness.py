"""Runs test, variance-ratio test, Newey-West HAC mean inference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.randomness import (
    hac_mean,
    runs_test,
    variance_ratio,
)


def _series(spark, values, sid="a"):
    rows = [(sid, float(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["sid", "t", "v"])


class TestRunsTest:
    def test_alternating_too_many_runs(self, spark):
        # low,high,low,high,... = maximal runs -> large positive z
        lows, highs = np.arange(15.0), 100 + np.arange(15.0)
        vals = np.ravel(np.column_stack([lows, highs]))
        row = runs_test(_series(spark, vals), "t", "v",
                        ["sid"]).collect()[0]
        # median element (=14.0) dropped mid-sequence, merging one run
        assert row["n_runs"] >= row["n_above"] + row["n_below"] - 1
        assert row["z"] > 1.959964 and row["nonrandom_5pct"]

    def test_blocked_too_few_runs(self, spark):
        # 15 lows then 15 highs = 2 runs -> large negative z
        vals = list(np.arange(15.0)) + list(100 + np.arange(15.0))
        row = runs_test(_series(spark, vals), "t", "v",
                        ["sid"]).collect()[0]
        assert row["n_runs"] == 2
        assert row["z"] < -1.959964 and row["nonrandom_5pct"]

    def test_hand_computed_moments(self, spark):
        # a=3 above, b=3 below the median element after tie-drop
        vals = [10, 1, 10, 1, 10, 1, 5]   # median element = 5, dropped
        row = runs_test(_series(spark, vals), "t", "v", ["sid"],
                        min_n=4).collect()[0]
        a, b, r = row["n_above"], row["n_below"], row["n_runs"]
        assert (a, b, r) == (3, 3, 6)
        e = 2 * a * b / (a + b) + 1
        var = (2 * a * b * (2 * a * b - a - b)
               / ((a + b) ** 2 * (a + b - 1)))
        assert row["z"] == pytest.approx(round((r - e) / var ** 0.5, 6))

    def test_random_series_not_flagged(self, spark):
        rng = np.random.RandomState(0)
        row = runs_test(_series(spark, rng.normal(size=200)), "t", "v",
                        ["sid"]).collect()[0]
        assert abs(row["z"]) < 1.959964 and not row["nonrandom_5pct"]


class TestVarianceRatio:
    def test_random_walk_vr_near_one(self, spark):
        rng = np.random.RandomState(1)
        walk = np.round(np.cumsum(rng.normal(size=400)), 2)
        row = variance_ratio(_series(spark, walk), "t", "v",
                             ["sid"]).collect()[0]
        assert row["vr"] == pytest.approx(1.0, abs=0.35)
        assert not row["reject_rw_5pct"]

    def test_mean_reverting_vr_below_one(self, spark):
        rng = np.random.RandomState(2)
        noise = np.round(rng.normal(size=400), 2)  # iid level = AR(-ish)
        row = variance_ratio(_series(spark, noise), "t", "v",
                             ["sid"]).collect()[0]
        assert row["vr"] < 0.6 and row["z"] < -1.959964
        assert row["reject_rw_5pct"]

    def test_trending_vr_above_one(self, spark):
        # persistent increments (momentum): VR > 1
        rng = np.random.RandomState(3)
        incr = np.repeat(rng.normal(size=100), 4)  # 4-sticky increments
        walk = np.round(np.cumsum(incr), 2)
        row = variance_ratio(_series(spark, walk), "t", "v",
                             ["sid"]).collect()[0]
        assert row["vr"] > 1.5 and row["reject_rw_5pct"]

    def test_matches_direct_formula(self, spark):
        rng = np.random.RandomState(4)
        v = np.round(np.cumsum(rng.normal(size=120)), 2)
        row = variance_ratio(_series(spark, v), "t", "v",
                             ["sid"]).collect()[0]
        q = 4
        x = np.diff(v)
        n = len(x)
        mu = (v[-1] - v[0]) / n
        s1 = np.sum((x - mu) ** 2) / (n - 1)
        y = v[q:] - v[:-q]
        sq = np.sum((y - q * mu) ** 2) / (q * (n - q + 1) * (1 - q / n))
        vr = sq / s1
        z = (vr - 1) / np.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * n))
        assert row["vr"] == pytest.approx(vr, abs=1e-6)
        assert row["z"] == pytest.approx(z, abs=1e-5)


class TestHacMean:
    def test_iid_n_eff_near_n(self, spark):
        rng = np.random.RandomState(5)
        v = np.round(rng.normal(10, 2, size=500), 2)
        row = hac_mean(_series(spark, v), "t", "v", ["sid"]).collect()[0]
        assert row["n_eff"] == pytest.approx(500, rel=0.25)
        assert row["mean"] == pytest.approx(v.mean(), abs=1e-9)

    def test_autocorrelated_n_eff_shrinks(self, spark):
        # strong AR(1): lrv >> gamma0, n_eff << n
        rng = np.random.RandomState(6)
        v = np.zeros(500)
        for i in range(1, 500):
            v[i] = 0.9 * v[i - 1] + rng.normal()
        v = np.round(v + 50, 2)
        row = hac_mean(_series(spark, v), "t", "v", ["sid"]).collect()[0]
        assert row["lrv"] > 3 * row["gamma0"]
        assert row["n_eff"] < 200

    def test_matches_direct_formula(self, spark):
        rng = np.random.RandomState(7)
        v = np.round(rng.normal(size=100) + 0.5 * np.sin(
            np.arange(100) / 3), 2)
        row = hac_mean(_series(spark, v), "t", "v", ["sid"]).collect()[0]
        d = v - v.mean()
        n, L = len(v), 5
        gammas = [np.sum(d[j:] * d[:n - j] if j else d * d) / n
                  for j in range(L + 1)]
        lrv = gammas[0] + 2 * sum(
            (1 - j / (L + 1)) * gammas[j] for j in range(1, L + 1))
        assert row["gamma0"] == pytest.approx(gammas[0], abs=1e-5)
        assert row["lrv"] == pytest.approx(lrv, abs=1e-5)
        assert row["se_mean"] == pytest.approx(np.sqrt(lrv / n), abs=1e-5)
        assert row["n_eff"] == pytest.approx(n * gammas[0] / lrv, abs=1e-3)

    def test_constant_series_dropped(self, spark):
        out = hac_mean(_series(spark, [5.0] * 50), "t", "v", ["sid"])
        assert out.count() == 0
