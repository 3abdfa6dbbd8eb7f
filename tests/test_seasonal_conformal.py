"""Seasonal Mann-Kendall and split-conformal AR(1) vs direct references."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ts_df(spark, values, user=1, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(start)
    rows = [(user, t0 + dt.timedelta(days=i), float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double")


def SEASON():
    return F.expr("pmod(unix_micros(ts) div 86400000000 + 3, 7)")


def _smk_reference(values, start="2024-01-01"):
    """Direct seasonal MK with day-of-week seasons on daily data."""
    t0 = dt.datetime.fromisoformat(start)
    epoch_day0 = (t0 - dt.datetime(1970, 1, 1)).days
    y = np.asarray(values, dtype=float)
    seasons = [(epoch_day0 + i + 3) % 7 for i in range(len(y))]
    s_tot, var_tot, slopes = 0, 0.0, []
    for g in sorted(set(seasons)):
        idx = [i for i, ss in enumerate(seasons) if ss == g]
        yg = y[idx]
        n = len(yg)
        if n < 2:
            continue
        s_tot += sum(np.sign(yg[j] - yg[i])
                     for i in range(n) for j in range(i + 1, n))
        _, counts = np.unique(yg, return_counts=True)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in counts)
        var_tot += (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append(round(
                    (yg[j] - yg[i]) / (idx[j] - idx[i]), 7))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1] if slopes else None
    if var_tot <= 0:
        return s_tot, var_tot, None, med
    if s_tot > 0:
        z = (s_tot - 1) / math.sqrt(var_tot)
    elif s_tot < 0:
        z = (s_tot + 1) / math.sqrt(var_tot)
    else:
        z = 0.0
    return s_tot, var_tot, z, med


class TestSeasonalMannKendall:
    def test_pure_seasonal_cycle_no_trend(self, spark):
        from orange3_timeseries_spark.operators.trend import (
            seasonal_mann_kendall,
        )

        rng = np.random.RandomState(1)
        effect = [0, 10, -5, 3, 7, -8, 2]
        vals = [effect[(i + 3) % 7] + rng.standard_normal() * 0.1
                for i in range(56)]
        out = seasonal_mann_kendall(
            _ts_df(spark, vals), "ts", "value", ["user_id"],
            SEASON()).collect()
        assert len(out) == 1
        assert not out[0].significant_5pct
        assert out[0].n_seasons == 7

    def test_trend_under_seasonality_detected(self, spark):
        from orange3_timeseries_spark.operators.trend import (
            seasonal_mann_kendall,
        )

        effect = [0, 10, -5, 3, 7, -8, 2]
        vals = [effect[(i + 3) % 7] + 0.5 * i for i in range(56)]
        r = seasonal_mann_kendall(
            _ts_df(spark, vals), "ts", "value", ["user_id"],
            SEASON()).collect()[0]
        assert r.trend == "increasing" and r.significant_5pct
        assert r.sen_slope == pytest.approx(0.5, abs=1e-6)

    def test_matches_direct_reference(self, spark):
        from orange3_timeseries_spark.operators.trend import (
            seasonal_mann_kendall,
        )

        rng = np.random.RandomState(17)
        vals = np.round(rng.standard_normal(42), 2).tolist()
        r = seasonal_mann_kendall(
            _ts_df(spark, vals), "ts", "value", ["user_id"],
            SEASON()).collect()[0]
        s, var, z, med = _smk_reference(vals)
        assert r.s_stat == s
        assert r.var_s == pytest.approx(var, abs=1e-6)
        assert r.z == pytest.approx(z, abs=1e-5)
        assert r.sen_slope == pytest.approx(med, abs=1e-6)


def _conformal_reference(values, alpha=0.1, train_frac=0.8):
    """Exact replay of the operator's arithmetic (incl. rounding)."""
    y = np.asarray(values, dtype=float)
    n = len(y)
    ntr = math.floor(n * train_frac)
    tr = [(y[t - 2], y[t - 1]) for t in range(2, ntr + 1)]
    m = float(len(tr))
    if m < 10:
        return None
    sx = round(sum(a for a, _ in tr), 7)
    sy = round(sum(b for _, b in tr), 7)
    sxy = round(sum(a * b for a, b in tr), 7)
    sxx = round(sum(a * a for a, b in tr), 7)
    det = m * sxx - sx * sx
    phi = (m * sxy - sx * sy) / det
    c = (sy - phi * sx) / m
    resid = sorted(round(abs(y[t - 1] - (c + phi * y[t - 2])), 7)
                   for t in range(ntr + 1, n + 1))
    mc = len(resid)
    if mc < 5:
        return None
    qi = min(math.ceil((1 - alpha) * (mc + 1)), mc)
    q = resid[qi - 1]
    fc = c + phi * y[-1]
    return (n, mc, round(fc, 6), round(q, 6),
            round(fc - q, 6), round(fc + q, 6))


class TestConformalAR1:
    def test_matches_direct_reference(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            conformal_ar1_interval,
        )

        rng = np.random.RandomState(23)
        y = [0.0]
        for _ in range(99):
            y.append(2.0 + 0.5 * y[-1] + rng.standard_normal())
        out = conformal_ar1_interval(
            _ts_df(spark, y), "ts", "value", ["user_id"]).collect()
        assert len(out) == 1
        n, mc, fc, q, lo, hi = _conformal_reference(y)
        r = out[0]
        assert (r.n_obs, r.n_cal) == (n, mc)
        assert r.fc1 == pytest.approx(fc, abs=1e-6)
        assert r.q_hat == pytest.approx(q, abs=1e-6)
        assert r.lo == pytest.approx(lo, abs=1e-6)
        assert r.hi == pytest.approx(hi, abs=1e-6)
        assert r.lo < r.fc1 < r.hi

    def test_short_series_dropped(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            conformal_ar1_interval,
        )

        df = _ts_df(spark, list(np.random.RandomState(1)
                                .standard_normal(12)))
        # 12 obs -> 8 train pairs < min_train=10
        assert conformal_ar1_interval(
            df, "ts", "value", ["user_id"]).count() == 0

    def test_empirical_coverage_near_nominal(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            conformal_ar1_interval,
        )

        # 40 independent AR(1) series; check the next value falls in
        # [lo, hi] at roughly the nominal 90% rate (binomial slack)
        rng = np.random.RandomState(31)
        rows, futures = [], {}
        t0 = dt.datetime(2024, 1, 1)
        for u in range(40):
            y = [0.0]
            for _ in range(120):
                y.append(1.0 + 0.6 * y[-1] + rng.standard_normal())
            futures[u] = y[-1]
            for i, v in enumerate(y[:-1]):
                rows.append((u, t0 + dt.timedelta(days=i), float(v)))
        df = spark.createDataFrame(
            rows, "user_id int, ts timestamp, value double")
        out = conformal_ar1_interval(df, "ts", "value", ["user_id"])
        covered = sum(1 for r in out.collect()
                      if r.lo <= futures[r.user_id] <= r.hi)
        assert covered >= 0.75 * 40   # nominal 0.9, generous slack
