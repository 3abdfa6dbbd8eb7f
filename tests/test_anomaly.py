"""Monitoring operators: closed prefix forms vs naive recursions,
robust-median exactness, flag semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _series_df(spark, values, user=1):
    rows = [(user, i, float(v) if v is not None else None, i)
            for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "user_id int, ts int, value double, event_id int")


class TestRollingMad:
    def test_matches_numpy_lower_median(self, spark):
        from orange3_timeseries_spark.operators.anomaly import (
            rolling_mad_flags,
        )

        rng = np.random.RandomState(3)
        vals = rng.standard_normal(60).round(3).tolist()
        vals[40] = 25.0  # planted spike
        df = _series_df(spark, vals)
        out = rolling_mad_flags(df, "value", "ts", ["user_id"],
                                window=25, thresh=3.5,
                                tie_cols=("event_id",))
        rows = {r.ts: r for r in out.collect()}
        assert set(rows) == set(range(24, 60))
        for t, r in rows.items():
            w = sorted(vals[t - 24:t + 1])
            med = w[(25 + 1) // 2 - 1]          # lower median
            devs = sorted(abs(y - med) for y in w)
            mad = devs[(25 + 1) // 2 - 1]
            assert r.med == pytest.approx(med, abs=1e-6)
            assert r.mad == pytest.approx(mad, abs=1e-6)
            if mad > 0:
                mz = 0.6745 * (vals[t] - med) / mad
                assert r.mod_z == pytest.approx(mz, abs=1e-5)
                assert r.is_outlier == (abs(round(mz, 6)) > 3.5)
        assert rows[40].is_outlier  # the spike flags

    def test_null_values_dropped_not_windowed(self, spark):
        from orange3_timeseries_spark.operators.anomaly import (
            rolling_mad_flags,
        )

        vals = [1.0] * 20 + [None] * 5 + [1.0] * 10
        df = _series_df(spark, vals)
        out = rolling_mad_flags(df, "value", "ts", ["user_id"],
                                window=25, tie_cols=("event_id",))
        # 30 non-null rows -> windows complete from the 25th non-null on
        assert out.count() == 6

    def test_zero_mad_flags_nothing(self, spark):
        from orange3_timeseries_spark.operators.anomaly import (
            rolling_mad_flags,
        )

        df = _series_df(spark, [5.0] * 30)
        rows = rolling_mad_flags(df, "value", "ts", ["user_id"],
                                 window=25,
                                 tie_cols=("event_id",)).collect()
        assert rows and all(r.mad == 0 for r in rows)
        assert all(r.mod_z is None for r in rows)
        assert not any(r.is_outlier for r in rows)


class TestCusum:
    def test_closed_form_equals_naive_recursion(self, spark):
        from orange3_timeseries_spark.operators.anomaly import cusum

        rng = np.random.RandomState(7)
        vals = rng.standard_normal(80).tolist()
        vals[50:] = [v + 2.5 for v in vals[50:]]  # planted level shift
        df = _series_df(spark, vals)
        out = cusum(df, "value", "ts", ["user_id"], k=0.5, h=4.0,
                    tie_cols=("event_id",))
        rows = sorted(out.collect(), key=lambda r: r.ts)

        x = np.array(vals)
        z = np.round((x - x.mean()) / x.std(), 6)
        su = sd_ = 0.0
        for i, r in enumerate(rows):
            su = max(0.0, su + z[i] - 0.5)
            sd_ = max(0.0, sd_ - z[i] - 0.5)
            assert r.s_up == pytest.approx(su, abs=1e-5), i
            assert r.s_dn == pytest.approx(sd_, abs=1e-5), i
            assert r.alarm_up == (round(su, 6) > 4.0)
        # the level shift must raise an upper alarm eventually
        assert any(r.alarm_up for r in rows if r.ts >= 50)
        assert not any(r.alarm_up for r in rows if r.ts < 50)

    def test_zero_variance_series_dropped(self, spark):
        from orange3_timeseries_spark.operators.anomaly import cusum

        df = _series_df(spark, [2.0] * 10)
        assert cusum(df, "value", "ts", ["user_id"],
                     tie_cols=("event_id",)).count() == 0


class TestEwmaControl:
    def test_closed_form_equals_naive_recursion(self, spark):
        from orange3_timeseries_spark.operators.anomaly import (
            ewma_control,
        )

        rng = np.random.RandomState(11)
        vals = rng.standard_normal(40).tolist()
        vals[30:] = [v + 3.0 for v in vals[30:]]
        df = _series_df(spark, vals)
        out = ewma_control(df, "value", "ts", ["user_id"],
                           lam=0.2, L=3.0)
        rows = sorted(out.collect(), key=lambda r: r.ts)

        x = np.array(vals)
        mu, sd = x.mean(), x.std()
        e = mu
        for i, r in enumerate(rows):
            e = 0.2 * x[i] + 0.8 * e
            assert r.t == i + 1
            assert r.ewma == pytest.approx(e, abs=1e-5), i
            width = 3.0 * sd * math.sqrt(
                0.2 / 1.8 * (1 - 0.8 ** (2 * (i + 1))))
            assert r.ucl == pytest.approx(mu + width, abs=1e-5)
            assert r.lcl == pytest.approx(mu - width, abs=1e-5)
            assert r.violation == (r.ewma > r.ucl or r.ewma < r.lcl)
        assert any(r.violation for r in rows if r.ts >= 30)

    def test_limits_widen_monotonically_to_asymptote(self, spark):
        from orange3_timeseries_spark.operators.anomaly import (
            ewma_control,
        )

        rng = np.random.RandomState(5)
        df = _series_df(spark, rng.standard_normal(50).tolist())
        rows = sorted(ewma_control(df, "value", "ts",
                                   ["user_id"]).collect(),
                      key=lambda r: r.t)
        widths = [r.ucl - r.lcl for r in rows]
        assert all(b >= a - 1e-9 for a, b in zip(widths, widths[1:]))


class TestEwmaLongSeries:
    def test_no_overflow_on_long_series(self, spark):
        """The geometric rescaling form overflowed double around
        t~3200; the fold form must stay finite on a 4000-point series
        and still equal the naive recursion at the tail."""
        from orange3_timeseries_spark.operators.anomaly import (
            ewma_control,
        )

        rng = np.random.RandomState(17)
        vals = rng.standard_normal(4000).tolist()
        df = _series_df(spark, vals)
        rows = sorted(ewma_control(df, "value", "ts",
                                   ["user_id"]).collect(),
                      key=lambda r: r.t)
        assert len(rows) == 4000
        assert all(math.isfinite(r.ewma) for r in rows)
        x = np.array(vals)
        e = x.mean()
        for v in x:
            e = 0.2 * v + 0.8 * e
        assert rows[-1].ewma == pytest.approx(e, abs=1e-5)
        assert rows[-1].violation is not None
