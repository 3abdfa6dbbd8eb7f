"""Forecast combination, histogram quantiles, binary segmentation."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.backtest import ensemble_forecast
from orange3_timeseries_spark.operators.profile import histogram_quantiles
from orange3_timeseries_spark.operators.trend import (
    binseg_changepoints,
    pettitt_test,
)


def _daily_df(spark, values, sid="a"):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(sid, t0 + dt.timedelta(days=i), float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["user_id", "day", "x"])


class TestEnsembleForecast:
    def test_weights_favor_better_model(self, spark):
        # strongly seasonal series: snaive MAE ~0, so its weight
        # dominates and the ensemble hugs the seasonal forecast
        n = 32
        vals = [10.0 * (i % 7) for i in range(n)]
        df = _daily_df(spark, vals)
        out = {r["step"]: r for r in ensemble_forecast(
            df, "x", "day", ["user_id"], origins=(18, 22, 26),
            horizon=4, season=7).collect()}
        assert set(out) == {1, 2, 3, 4}
        for h in (1, 2, 3, 4):
            r = out[h]
            assert r["w_snaive"] > 100 * max(r["w_naive"], r["w_drift"])
            assert r["fc_ensemble"] == pytest.approx(r["fc_snaive"],
                                                     abs=0.5)
            # arr is 1-based: arr[n+h-7] = vals[n+h-8]
            assert r["fc_snaive"] == pytest.approx(
                10.0 * ((n + h - 8) % 7))

    def test_combination_matches_direct(self, spark):
        rng = np.random.RandomState(2)
        vals = np.round(np.cumsum(rng.normal(size=30)) + 50, 6)
        df = _daily_df(spark, vals)
        out = ensemble_forecast(df, "x", "day", ["user_id"],
                                origins=(18, 22, 26), horizon=4,
                                season=7).collect()
        r = [x for x in out if x["step"] == 1][0]
        # reconstruct the weighted average from emitted parts
        wn, wd, ws = r["w_naive"], r["w_drift"], r["w_snaive"]
        direct = (wn * r["fc_naive"] + wd * r["fc_drift"]
                  + ws * r["fc_snaive"]) / (wn + wd + ws)
        assert r["fc_ensemble"] == pytest.approx(direct, abs=1e-4)

    def test_short_series_dropped(self, spark):
        df = _daily_df(spark, range(12))
        out = ensemble_forecast(df, "x", "day", ["user_id"],
                                origins=(18, 22, 26))
        assert out.count() == 0


class TestHistogramQuantiles:
    def test_within_one_bin_of_exact(self, spark):
        rng = np.random.RandomState(9)
        vals = rng.normal(50, 10, 5000)
        df = spark.createDataFrame([("g", float(v)) for v in vals],
                                   ["g", "v"])
        out = {r["prob"]: r["quantile"]
               for r in histogram_quantiles(df, "v", ["g"],
                                            bins=256).collect()}
        width = (vals.max() - vals.min()) / 256
        for p in (0.25, 0.5, 0.75, 0.9, 0.99):
            exact = float(np.quantile(vals, p))
            assert abs(out[p] - exact) <= width + 1e-9, (p, out[p], exact)

    def test_degenerate_group_constant(self, spark):
        df = spark.createDataFrame([("g", 7.0)] * 10, ["g", "v"])
        out = histogram_quantiles(df, "v", ["g"]).collect()
        assert len(out) == 5
        assert all(r["quantile"] == pytest.approx(7.0) for r in out)
        assert all(r["n_values"] == 10 for r in out)

    def test_uniform_interpolation_exact_on_uniform_grid(self, spark):
        # 0..255 with 256 bins: one value per bin, p=0.5 -> t=128 ->
        # bin 127 full -> q = 127 + 1 = 128 * width... check monotone
        df = spark.createDataFrame([("g", float(i)) for i in range(256)],
                                   ["g", "v"])
        out = {r["prob"]: r["quantile"]
               for r in histogram_quantiles(df, "v", ["g"],
                                            bins=256).collect()}
        assert out[0.25] <= out[0.5] <= out[0.75] <= out[0.9] <= out[0.99]
        # t = 0.5*256 = 128 falls at the top of bin 127 (values 0..127)
        # -> q = width * 128 = (255/256)*128 = 127.5
        assert out[0.5] == pytest.approx(127.5, abs=1e-6)


class TestBinsegChangepoints:
    def _steps(self, spark, segs, sid="a"):
        vals = []
        for level, ln in segs:
            vals += [float(level)] * ln
        rng = np.random.RandomState(1)
        vals = [v + rng.normal(0, 0.1) for v in vals]
        return _daily_df(spark, vals, sid).withColumnRenamed("day", "ts") \
            .withColumnRenamed("x", "value")

    def test_two_changepoints_recovered(self, spark):
        # up-then-down square pulse: boundaries after positions 20 and
        # 40 (1-based) are both Pettitt extrema, so level 1 locks one
        # and level 2 recovers the other on the long side
        df = self._steps(spark, [(0, 20), (10, 20), (0, 20)])
        out = binseg_changepoints(df, "ts", "value", ["user_id"])
        rows = {(r["level"], r["segment"]): r for r in out.collect()}
        assert (1, 0) in rows and rows[(1, 0)]["significant_5pct"]
        t0 = dt.datetime(2024, 1, 1)
        lvl1_pos = (rows[(1, 0)]["change_ts"] - t0).days + 1
        assert min(abs(lvl1_pos - 20), abs(lvl1_pos - 40)) <= 1
        other = 40 if abs(lvl1_pos - 20) <= 1 else 20
        sig2 = [r for (lv, _), r in rows.items()
                if lv == 2 and r["significant_5pct"]]
        assert sig2
        pos2 = {(r["change_ts"] - t0).days + 1 for r in sig2}
        assert any(abs(p - other) <= 1 for p in pos2)

    def test_no_change_stops_at_level_one(self, spark):
        rng = np.random.RandomState(4)
        df = _daily_df(spark, rng.normal(size=40)) \
            .withColumnRenamed("day", "ts").withColumnRenamed("x", "value")
        out = binseg_changepoints(df, "ts", "value", ["user_id"]).collect()
        lvl1 = [r for r in out if r["level"] == 1]
        assert len(lvl1) == 1
        if not lvl1[0]["significant_5pct"]:
            assert all(r["level"] == 1 for r in out)

    def test_level1_matches_pettitt(self, spark):
        df = self._steps(spark, [(0, 15), (8, 15)])
        l1 = [r for r in binseg_changepoints(
            df, "ts", "value", ["user_id"]).collect() if r["level"] == 1][0]
        pt = pettitt_test(df, "ts", "value", ["user_id"]).collect()[0]
        assert l1["k_stat"] == pt["k_stat"]
        assert l1["change_ts"] == pt["change_ts"]
        assert l1["p_value"] == pt["p_value"]
