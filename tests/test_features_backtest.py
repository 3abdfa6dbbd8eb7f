"""Lag-feature matrix, calendar features, rolling-origin backtesting."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestLagFeatures:
    def test_lags_exact_and_leakage_free(self, spark):
        from orange3_timeseries_spark.operators.features import (
            lag_features,
        )

        vals = [float(v) for v in range(1, 13)]
        df = spark.createDataFrame(
            [(1, i, vals[i], i) for i in range(12)],
            "user_id int, ts int, value double, event_id int")
        rows = {r.ts: r for r in lag_features(
            df, "value", "ts", ["user_id"], lags=(1, 2, 3, 4), roll=4,
            tie_cols=("event_id",)).collect()}
        # first complete example needs 4 history rows
        assert set(rows) == set(range(4, 12))
        for t, r in rows.items():
            assert r.y == vals[t]
            assert (r.lag_1, r.lag_2, r.lag_3, r.lag_4) == (
                vals[t - 1], vals[t - 2], vals[t - 3], vals[t - 4])
            # rolling mean EXCLUDES the current row (no target leakage)
            assert r.roll_mean_4 == pytest.approx(
                sum(vals[t - 4:t]) / 4, abs=1e-6)

    def test_null_values_dropped_before_lagging(self, spark):
        from orange3_timeseries_spark.operators.features import (
            lag_features,
        )

        vals = [1.0, 2.0, None, 3.0, 4.0, 5.0, 6.0, 7.0]
        df = spark.createDataFrame(
            [(1, i, vals[i], i) for i in range(8)],
            "user_id int, ts int, value double, event_id int")
        rows = sorted(lag_features(
            df, "value", "ts", ["user_id"], tie_cols=("event_id",))
            .collect(), key=lambda r: r.ts)
        # 7 non-null rows -> 3 complete examples; lags skip the null
        assert [r.ts for r in rows] == [5, 6, 7]
        assert rows[0].lag_4 == 1.0  # lag over the compacted sequence


class TestCalendarFeatures:
    def test_dow_matches_python_calendar(self, spark):
        from orange3_timeseries_spark.operators.features import (
            calendar_features,
        )

        days = [dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
                for i in range(400)]
        df = spark.createDataFrame([(d,) for d in days],
                                   "day timestamp")
        rows = {r.day: r for r in
                calendar_features(df, "day").collect()}
        assert len(rows) == 400
        for d in days:
            r = rows[d]
            assert r.dow_iso == d.isoweekday()
            assert r.dom == d.day and r.month == d.month
            assert r.week_iso == d.isocalendar()[1]
            assert r.doy == d.timetuple().tm_yday
            ang = 2 * np.pi / 7 * (d.isoweekday() - 1)
            assert r.sin_w1 == pytest.approx(np.sin(ang), abs=1e-6)
            assert r.cos_w2 == pytest.approx(np.cos(2 * ang), abs=1e-6)

    def test_fourier_annual_period(self, spark):
        from orange3_timeseries_spark.operators.features import (
            calendar_features,
        )

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1),)], "day timestamp")
        r = calendar_features(df, "day").collect()[0]
        assert r.sin_a1 == 0.0 and r.cos_a1 == 1.0  # doy=1 -> angle 0


class TestRollingOriginEval:
    def test_hand_computed_baselines(self, spark):
        from orange3_timeseries_spark.operators.backtest import (
            rolling_origin_eval,
        )

        y = [float(v) for v in
             [10, 12, 11, 13, 12, 14, 13, 15, 14, 16, 15, 17, 16, 18]]
        df = spark.createDataFrame(
            [(1, i, y[i]) for i in range(14)],
            "user_id int, ts int, value double")
        out = rolling_origin_eval(df, "value", "ts", ["user_id"],
                                  origins=(10,), horizon=4, season=7)
        rows = {r.model: r for r in out.collect()}
        assert set(rows) == {"naive", "drift", "snaive"}
        t = 10
        actual = y[t:t + 4]
        naive = [y[t - 1]] * 4
        drift = [y[t - 1] + h * (y[t - 1] - y[0]) / (t - 1)
                 for h in (1, 2, 3, 4)]
        snaive = [y[t + h - 1 - 7] for h in (1, 2, 3, 4)]
        for model, preds in [("naive", naive), ("drift", drift),
                             ("snaive", snaive)]:
            mae = sum(abs(p - a) for p, a in zip(preds, actual)) / 4
            sm = sum(2 * abs(p - a) / (abs(p) + abs(a))
                     for p, a in zip(preds, actual)) / 4
            assert rows[model].mae == pytest.approx(mae, abs=1e-6), model
            assert rows[model].smape == pytest.approx(sm, abs=1e-6), model

    def test_invalid_origins_filtered(self, spark):
        from orange3_timeseries_spark.operators.backtest import (
            rolling_origin_eval,
        )

        df = spark.createDataFrame(
            [(1, i, float(i)) for i in range(12)],
            "user_id int, ts int, value double")
        out = rolling_origin_eval(df, "value", "ts", ["user_id"],
                                  origins=(5, 8, 10, 20), horizon=4,
                                  season=7)
        got = {r.origin_t for r in out.collect()}
        # t=5 fails t>season; t=10 fails n>=t+4 (n=12); t=20 both
        assert got == {8}


class TestCalendarPre1970:
    def test_dow_correct_for_negative_epoch_days(self, spark):
        from orange3_timeseries_spark.operators.features import (
            calendar_features,
        )

        days = [dt.datetime(1969, 12, 20) + dt.timedelta(days=i)
                for i in range(20)]  # spans the epoch boundary
        df = spark.createDataFrame([(d,) for d in days],
                                   "day timestamp")
        rows = {r.day: r for r in
                calendar_features(df, "day").collect()}
        for d in days:
            assert rows[d].dow_iso == d.isoweekday(), d


class TestBacktestEmptyOrigins:
    def test_all_invalid_origins_returns_empty_not_crash(self, spark):
        from orange3_timeseries_spark.operators.backtest import (
            rolling_origin_eval,
        )

        df = spark.createDataFrame(
            [(1, i, float(i)) for i in range(12)],
            "user_id int, ts int, value double")
        out = rolling_origin_eval(df, "value", "ts", ["user_id"],
                                  origins=(3, 5), horizon=4, season=7)
        assert out.count() == 0
        assert out.columns == ["user_id", "origin_t", "model", "mae",
                               "smape"]

    def test_small_season_allows_t2_boundary(self, spark):
        from orange3_timeseries_spark.operators.backtest import (
            rolling_origin_eval,
        )

        df = spark.createDataFrame(
            [(1, i, float(i % 3 + 1)) for i in range(10)],
            "user_id int, ts int, value double")
        out = rolling_origin_eval(df, "value", "ts", ["user_id"],
                                  origins=(2,), horizon=2, season=1)
        # t=2 > season=1 and t>=2: emitted (was silently dropped by
        # the old t <= max(season, 2) filter)
        assert {r.origin_t for r in out.collect()} == {2}
