"""MASE of the naive forecaster (operators/backtest.py:naive_mase)."""

import datetime as dt

import pytest

from orange3_timeseries_spark.operators.backtest import naive_mase


def _daily(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, d, 9), k, v) for d, k, v in rows],
        "ts timestamp, user_id long, value double")


class TestNaiveMase:
    def test_known_values(self, spark):
        # user 1: 12 days, values 1..12 → anchor = day 7 value (7.0);
        # test = days 8..12, errors |8-7|..|12-7| = 1+2+3+4+5 = 15;
        # train diffs (days 2..7): 6 × 1.0 → scale 1.0; mase = 3.0
        rows = [(d, 1, float(d)) for d in range(1, 13)]
        [r] = naive_mase(_daily(spark, rows), "ts", "user_id",
                         "value").collect()
        assert r.n_days == 12
        assert r.mae == pytest.approx(3.0)
        assert r.naive_scale == pytest.approx(1.0)
        assert r.mase == pytest.approx(3.0)

    def test_flat_train_yields_null_mase(self, spark):
        rows = [(d, 1, 5.0 if d <= 7 else 9.0) for d in range(1, 13)]
        [r] = naive_mase(_daily(spark, rows), "ts", "user_id",
                         "value").collect()
        assert r.naive_scale == 0.0 or r.naive_scale is None
        assert r.mase is None

    def test_short_series_skipped(self, spark):
        rows = [(d, 1, float(d)) for d in range(1, 9)]   # 8 < min_obs
        rows += [(d, 2, float(d * d % 7)) for d in range(1, 15)]
        out = naive_mase(_daily(spark, rows), "ts", "user_id", "value")
        assert [r.user_id for r in out.collect()] == [2]

    def test_multiple_rows_per_day_rolled_up(self, spark):
        # two rows per day sum into one daily unit total
        rows = [(d, 1, float(d)) for d in range(1, 13)]
        rows += [(d, 1, float(d)) for d in range(1, 13)]
        [r] = naive_mase(_daily(spark, rows), "ts", "user_id",
                         "value").collect()
        assert r.mae == pytest.approx(6.0)   # everything doubles
        assert r.mase == pytest.approx(3.0)  # scale-free: unchanged

    def test_scale_free_across_magnitudes(self, spark):
        rows = [(d, 1, float(d)) for d in range(1, 13)]
        rows += [(d, 2, 1000.0 * d) for d in range(1, 13)]
        out = {r.user_id: r.mase
               for r in naive_mase(_daily(spark, rows), "ts",
                                   "user_id", "value").collect()}
        assert out[1] == pytest.approx(out[2])
