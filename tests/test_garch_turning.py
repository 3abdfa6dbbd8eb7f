"""GARCH(1,1) variance-targeting grid and the turning-points test."""

import math

import numpy as np
import pytest

from orange3_timeseries_spark.models.garch import garch_grid
from orange3_timeseries_spark.operators.randomness import (
    turning_points_test,
)


def _series(spark, values, sid="a"):
    rows = [(sid, float(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["sid", "t", "v"])


def _ref_garch(r, alpha, beta):
    r = np.asarray(r, dtype=float)
    n = len(r)
    vbar = (n * np.sum(r * r) - np.sum(r) ** 2) / n ** 2
    omega = (1 - alpha - beta) * vbar
    s2, ll = vbar, 0.0
    for x in r:
        r2 = x * x
        ll -= math.log(s2) + r2 / s2
        s2 = omega + alpha * r2 + beta * s2
    return ll, s2


class TestGarchGrid:
    def test_matches_direct_recursion(self, spark):
        rng = np.random.RandomState(0)
        r = np.round(rng.normal(0, 3, size=120), 2)
        v = np.round(np.cumsum(r), 2)
        out = garch_grid(_series(spark, v), "t", "v", ["sid"]).collect()
        assert len(out) == 9
        diffs = np.diff(np.round(v * 100)) / 100.0  # the engine's units
        for row in out:
            ll, s2 = _ref_garch(diffs, row["alpha"], row["beta"])
            assert row["loglik"] == pytest.approx(ll, abs=1e-4)
            assert row["sigma2_next"] == pytest.approx(s2, abs=1e-4)

    def test_volatility_clustering_prefers_high_persistence(self, spark):
        # simulated GARCH with alpha=.2, beta=.75: among beta choices at
        # alpha=.2, the true beta should beat the mismatched one
        rng = np.random.RandomState(1)
        n = 3000
        s2, r = 4.0, np.zeros(n)
        for i in range(n):
            r[i] = rng.normal(0, math.sqrt(s2))
            s2 = 1.0 + 0.2 * r[i] ** 2 + 0.75 * s2
        v = np.round(np.cumsum(np.round(r, 2)), 2)
        out = {(row["alpha"], row["beta"]): row["loglik"]
               for row in garch_grid(_series(spark, v), "t", "v",
                                     ["sid"]).collect()}
        assert out[(0.2, 0.75)] > out[(0.05, 0.7)]

    def test_constant_series_dropped(self, spark):
        assert garch_grid(_series(spark, [5.0] * 60), "t", "v",
                          ["sid"]).count() == 0

    def test_omega_is_variance_targeted(self, spark):
        rng = np.random.RandomState(2)
        v = np.round(np.cumsum(rng.normal(size=80)), 2)
        for row in garch_grid(_series(spark, v), "t", "v",
                              ["sid"]).collect():
            diffs = np.diff(np.round(v * 100)) / 100.0
            n = len(diffs)
            vbar = (n * np.sum(diffs ** 2) - np.sum(diffs) ** 2) / n ** 2
            assert row["omega"] == pytest.approx(
                (1 - row["alpha"] - row["beta"]) * vbar, abs=1e-5)


class TestTurningPoints:
    def test_monotone_no_turns(self, spark):
        row = turning_points_test(_series(spark, range(40)), "t", "v",
                                  ["sid"]).collect()[0]
        assert row["n_turning"] == 0
        assert row["z"] < -1.959964 and row["nonrandom_5pct"]

    def test_alternating_max_turns(self, spark):
        vals = [i % 2 * 10 + i * 0.01 for i in range(40)]  # strict zigzag
        row = turning_points_test(_series(spark, vals), "t", "v",
                                  ["sid"]).collect()[0]
        assert row["n_turning"] == 38
        assert row["z"] > 1.959964 and row["nonrandom_5pct"]

    def test_iid_near_expectation(self, spark):
        rng = np.random.RandomState(3)
        row = turning_points_test(_series(spark, rng.normal(size=300)),
                                  "t", "v", ["sid"]).collect()[0]
        n = 300
        assert abs(row["n_turning"] - 2 * (n - 2) / 3) < 20
        assert not row["nonrandom_5pct"]

    def test_hand_moments(self, spark):
        rng = np.random.RandomState(4)
        v = rng.normal(size=50)
        row = turning_points_test(_series(spark, v), "t", "v",
                                  ["sid"]).collect()[0]
        t = sum(1 for a, b, c in zip(v, v[1:], v[2:])
                if (a < b and c < b) or (a > b and c > b))
        n = 50
        z = (t - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
        assert row["n_turning"] == t
        assert row["z"] == pytest.approx(round(z, 6))
