"""Page-Hinkley drift detector and transition conditional entropy."""

import math

import numpy as np
import pytest

from orange3_timeseries_spark.operators.drift import page_hinkley
from orange3_timeseries_spark.operators.eventstats import (
    transition_entropy,
)


def _series(spark, values, sid="a"):
    rows = [(sid, float(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["sid", "t", "v"])


def _events(spark, types, sid="a"):
    rows = [(sid, float(i), t) for i, t in enumerate(types)]
    return spark.createDataFrame(rows, ["sid", "t", "e"])


def ref_ph(values, delta_sigma=0.5, lambda_sigma=5.0):
    u = np.round(np.asarray(values) * 100).astype(np.int64)
    n = len(u)
    sig = math.sqrt((n * np.sum(u.astype(float) ** 2)
                     - float(np.sum(u)) ** 2) / (n * n * 10000.0))
    delta, lam = delta_sigma * sig, lambda_sigma * sig
    s = np.cumsum(u)
    t = np.arange(1, n + 1)
    term = (u * t - s) / (100.0 * t)
    mu = np.cumsum(term - delta)
    md = np.cumsum(term + delta)
    pu = mu - np.minimum.accumulate(mu)
    pd = np.maximum.accumulate(md) - md
    return pu.max(), pd.max(), lam


class TestPageHinkley:
    def test_stationary_no_alarm(self, spark):
        rng = np.random.RandomState(0)
        v = np.round(rng.normal(50, 5, size=400), 2)
        row = page_hinkley(_series(spark, v), "t", "v",
                           ["sid"]).collect()[0]
        assert not row["alarm"] and row["alarm_ts"] is None

    def test_mean_shift_up_alarms(self, spark):
        rng = np.random.RandomState(1)
        v = np.concatenate([rng.normal(50, 3, 200),
                            rng.normal(80, 3, 200)])
        v = np.round(v, 2)
        row = page_hinkley(_series(spark, v), "t", "v",
                           ["sid"]).collect()[0]
        assert row["alarm"]
        assert row["ph_up"] > row["lambda_thr"]
        assert 180 <= row["alarm_ts"] <= 280   # fires near the break

    def test_mean_shift_down_alarms(self, spark):
        rng = np.random.RandomState(2)
        v = np.round(np.concatenate([rng.normal(80, 3, 200),
                                     rng.normal(50, 3, 200)]), 2)
        row = page_hinkley(_series(spark, v), "t", "v",
                           ["sid"]).collect()[0]
        assert row["alarm"] and row["ph_down"] > row["lambda_thr"]

    def test_matches_direct_recursion(self, spark):
        rng = np.random.RandomState(3)
        v = np.round(np.concatenate([rng.normal(10, 1, 60),
                                     rng.normal(14, 1, 60)]), 2)
        row = page_hinkley(_series(spark, v), "t", "v",
                           ["sid"]).collect()[0]
        pu, pd, lam = ref_ph(v)
        assert row["ph_up"] == pytest.approx(pu, abs=1e-4)
        assert row["ph_down"] == pytest.approx(pd, abs=1e-4)
        assert row["lambda_thr"] == pytest.approx(lam, abs=1e-4)


class TestTransitionEntropy:
    def test_deterministic_cycle_zero_entropy(self, spark):
        row = transition_entropy(_events(spark, list("ABC" * 20)), "t",
                                 "e", ["sid"]).collect()[0]
        assert row["h_cond"] == pytest.approx(0.0)
        assert row["predictability"] == pytest.approx(1.0)
        assert row["n_states"] == 3

    def test_uniform_random_near_max(self, spark):
        rng = np.random.RandomState(4)
        types = [chr(65 + i) for i in rng.randint(0, 4, size=4000)]
        row = transition_entropy(_events(spark, types), "t", "e",
                                 ["sid"]).collect()[0]
        assert row["h_cond"] == pytest.approx(math.log(4), abs=0.02)
        assert row["predictability"] < 0.05

    def test_matches_direct_count(self, spark):
        rng = np.random.RandomState(5)
        types = [chr(65 + i) for i in rng.randint(0, 3, size=200)]
        row = transition_entropy(_events(spark, types), "t", "e",
                                 ["sid"]).collect()[0]
        from collections import Counter
        pairs = Counter(zip(types, types[1:]))
        firsts = Counter(t for t, _ in pairs.elements())
        n = sum(pairs.values())
        h = -sum(c / n * math.log(c / firsts[a])
                 for (a, b), c in pairs.items())
        assert row["n_transitions"] == n
        assert row["h_cond"] == pytest.approx(h, abs=1e-6)
