"""k-anonymity audit and Syntetos-Boylan demand classification."""

import datetime as dt

import numpy as np
import pytest

from orange3_timeseries_spark.operators.eventstats import (
    sbc_classification,
)
from orange3_timeseries_spark.operators.profile import k_anonymity


class TestKAnonymity:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "seg string, nat int, bal double")

    def test_small_group_risky(self, spark):
        rows = ([("A", 1, float(100 + 20 * i)) for i in range(20)]
                + [("B", 2, 500.0)] * 3)       # 3 < k=10 -> risky
        out = {(r["seg"], r["nat"]): r for r in
               k_anonymity(self._df(spark, rows), ["seg", "nat"],
                           "bal").collect()}
        assert not out[("A", 1)]["risky"]
        assert out[("B", 2)]["risky"] and out[("B", 2)]["n_rows"] == 3

    def test_homogeneous_group_fails_l_diversity(self, spark):
        # big group but every sensitive value identical -> l=1 -> risky
        rows = ([("A", 1, 100.0)] * 30
                + [("B", 2, float(i * 50)) for i in range(30)])
        out = {(r["seg"], r["nat"]): r for r in
               k_anonymity(self._df(spark, rows), ["seg", "nat"],
                           "bal").collect()}
        assert out[("A", 1)]["l_diversity"] == 1
        assert out[("A", 1)]["risky"]
        assert out[("B", 2)]["l_diversity"] >= 5
        assert not out[("B", 2)]["risky"]

    def test_constant_sensitive_everywhere(self, spark):
        rows = [("A", 1, 7.0)] * 15
        row = k_anonymity(self._df(spark, rows), ["seg", "nat"],
                          "bal").collect()[0]
        assert row["l_diversity"] == 1 and row["risky"]


class TestSbc:
    def _df(self, spark, day_amount, sid="a"):
        base = dt.datetime(2024, 1, 1)
        rows = [(sid, base + dt.timedelta(days=d), float(v))
                for d, v in day_amount]
        return spark.createDataFrame(rows, "sid string, ts timestamp, "
                                           "v double")

    def test_smooth_every_day_stable(self, spark):
        rows = [(d, 10.0 + (d % 3) * 0.5) for d in range(30)]
        r = sbc_classification(self._df(spark, rows), "ts", "v",
                               ["sid"]).collect()[0]
        assert r["demand_class"] == "smooth"
        assert r["adi"] == pytest.approx(1.0)
        assert r["cv2"] < 0.49

    def test_intermittent_sparse_stable_sizes(self, spark):
        rows = [(d, 10.0) for d in range(0, 60, 3)]   # every 3rd day
        r = sbc_classification(self._df(spark, rows), "ts", "v",
                               ["sid"]).collect()[0]
        assert r["demand_class"] == "intermittent"
        assert r["adi"] == pytest.approx(58 / 20)

    def test_erratic_dense_wild_sizes(self, spark):
        rng = np.random.RandomState(0)
        rows = [(d, float(round(abs(rng.lognormal(2, 1.2)) + 0.5, 2)))
                for d in range(40)]
        r = sbc_classification(self._df(spark, rows), "ts", "v",
                               ["sid"]).collect()[0]
        assert r["adi"] == pytest.approx(1.0)
        assert r["demand_class"] in ("erratic", "smooth")
        if r["cv2"] >= 0.49:
            assert r["demand_class"] == "erratic"

    def test_lumpy_sparse_and_wild(self, spark):
        rng = np.random.RandomState(1)
        rows = [(int(d), float(round(abs(rng.lognormal(2, 1.5)) + 0.5, 2)))
                for d in sorted(rng.choice(120, size=25, replace=False))]
        r = sbc_classification(self._df(spark, rows), "ts", "v",
                               ["sid"]).collect()[0]
        assert r["adi"] >= 1.32
        if r["cv2"] >= 0.49:
            assert r["demand_class"] == "lumpy"
        else:
            assert r["demand_class"] == "intermittent"

    def test_multi_event_days_roll_up(self, spark):
        # two purchases the same day count as ONE demand day
        rows = [(0, 5.0), (0, 5.0), (2, 5.0), (4, 5.0), (6, 10.0)]
        r = sbc_classification(self._df(spark, rows), "ts", "v",
                               ["sid"], min_demand_days=4).collect()[0]
        assert r["n_demand_days"] == 4
        assert r["n_days"] == 7
