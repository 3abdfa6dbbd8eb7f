"""Analytics goldens ported from the reference's test suite
(``tests/test_periodogram.py``, ``tests/test_correlation.py``,
``tests/test_seasonal.py``, F8 Granger design from ``doc/scripting.rst``),
running both the NumPy cores and the per-series Spark wrappers."""

import os

import numpy as np
import pandas as pd
import pytest

from orange3_timeseries_spark.functions import (
    autocorrelation,
    granger_causality_arrays,
    partial_autocorrelation,
    periodogram,
    periodogram_nonequispaced,
    seasonal_decompose_arrays,
    mae,
    mape,
    pocid,
    r2,
    rmse,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "airpassengers.csv")


@pytest.fixture(scope="module")
def airpassengers():
    pdf = pd.read_csv(DATA, skiprows=[1, 2])
    return pdf["Air passengers"].to_numpy(dtype=float)


def test_periodogram_golden(airpassengers):
    # reference: max scaled power == 1 at a period rounding to 6
    # (tests/test_periodogram.py:12-14)
    periods, pgram = periodogram(airpassengers)
    assert max(pgram) == 1
    assert round(float(periods[pgram == 1][0])) == 6


def test_lombscargle_golden(airpassengers):
    # times = equispaced epoch months; reference passes data.X (epoch secs)
    times = np.arange(len(airpassengers), dtype=float) * 2629746.0
    periods, pgram = periodogram_nonequispaced(times, airpassengers,
                                               detrend="diff")
    assert max(pgram) == 1


def test_acf_golden(airpassengers):
    acf = autocorrelation(airpassengers)
    np.testing.assert_equal(acf[:4, 0], [12, 24, 36, 48])
    assert (acf[:4, 1] > 0).all()


def test_pacf_golden(airpassengers):
    pacf = partial_autocorrelation(airpassengers)
    np.testing.assert_equal(pacf[:3, 0], [9, 13, 25])
    assert pacf[0, 1] > 0


def test_seasonal_invariants(airpassengers):
    # adjusted == trend * residual; observed == adjusted * seasonal
    # (tests/test_seasonal.py:15-22)
    adj, seas, trend, resid = seasonal_decompose_arrays(
        airpassengers, model="multiplicative", period=12)
    np.testing.assert_almost_equal(adj, trend * resid)
    np.testing.assert_almost_equal(airpassengers, adj * seas)


def test_seasonal_additive_invariants(airpassengers):
    adj, seas, trend, resid = seasonal_decompose_arrays(
        airpassengers, model="additive", period=12)
    np.testing.assert_almost_equal(adj, trend + resid)
    np.testing.assert_almost_equal(airpassengers, adj + seas)


def test_granger_lagged_copies():
    # F8: lagged copies are Granger-caused by the original at the
    # construction lag (doc/scripting.rst:191-207)
    rng = np.random.RandomState(42)
    series = np.sin(np.arange(200) / 5.0) + rng.normal(0, 0.1, 200)
    lag1 = np.roll(series, 1)
    lag3 = np.roll(series, 3)
    res = granger_causality_arrays([series, lag1, lag3],
                                   ["orig", "lag1", "lag3"], max_lag=5)
    caused = {(r[2], r[3]): r[0] for r in res}
    assert ("orig", "lag1") in caused
    assert caused[("orig", "lag1")] == 1
    assert ("orig", "lag3") in caused
    assert caused[("orig", "lag3")] <= 3


def test_metrics_quirks():
    true = np.array([1.0, 2, 3, 4, 5])
    pred = np.array([1.5, 2.5, 2.5, 4.5, 4.5])
    # mae is MEDIAN absolute error
    assert mae(true, pred) == 0.5
    # mape normalizes by mean |true|, not per-point
    assert mape(true, pred) == pytest.approx(0.5 / 3.0)
    assert rmse(true, pred) == pytest.approx(0.5)
    assert r2(true, pred) == pytest.approx(1 - (5 * 0.25) / 10.0)
    # pocid: % of sign-agreeing diffs (pred diffs [1,0,2,0] -> 2/4)
    assert pocid(true, pred) == pytest.approx(50.0)


# ---------------------------------------------------------- Spark wrappers
def test_spark_acf_matches_numpy(spark, airpassengers):
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.spark_analytics import acf_table

    rows = [(int(i), float(v)) for i, v in enumerate(airpassengers)]
    df = spark.createDataFrame(rows, "__row_idx__ int, x double")
    tsf = TimeSeriesFrame(df)
    out = acf_table(tsf, "x", nlags=20).orderBy("lag").collect()
    from orange3_timeseries_spark.functions.correlation import acf_values
    expected = acf_values(airpassengers, 20)
    got = [r["acf"] for r in out]
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_spark_acf_confints_bartlett(spark, airpassengers):
    """alpha= emits Bartlett CIs matching the statsmodels formula the
    reference passes through (functions.py:208-218): var[0]=0,
    var[1]=1/n, var[k]=(1+2*sum_{j<k} acf_j^2)/n, centered on acf."""
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.models._stats import norm_ppf
    from orange3_timeseries_spark.spark_analytics import acf_table
    from orange3_timeseries_spark.functions.correlation import acf_values

    rows = [(int(i), float(v)) for i, v in enumerate(airpassengers)]
    df = spark.createDataFrame(rows, "__row_idx__ int, x double")
    out = (acf_table(TimeSeriesFrame(df), "x", nlags=20, alpha=0.05)
           .orderBy("lag").collect())
    acf = acf_values(airpassengers, 20)
    n = len(airpassengers)
    var = np.ones_like(acf) / n
    var[0] = 0.0
    var[2:] *= 1 + 2 * np.cumsum(acf[1:-1] ** 2)
    half = norm_ppf(0.975) * np.sqrt(var)
    np.testing.assert_allclose([r["ci_low"] for r in out], acf - half,
                               atol=1e-9)
    np.testing.assert_allclose([r["ci_high"] for r in out], acf + half,
                               atol=1e-9)


def test_spark_pacf_confints(spark, airpassengers):
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.models._stats import norm_ppf
    from orange3_timeseries_spark.spark_analytics import pacf_table

    rows = [(int(i), float(v)) for i, v in enumerate(airpassengers)]
    df = spark.createDataFrame(rows, "__row_idx__ int, x double")
    out = (pacf_table(TimeSeriesFrame(df), "x", nlags=10, alpha=0.05)
           .orderBy("lag").collect())
    half = norm_ppf(0.975) / np.sqrt(len(airpassengers))
    assert out[0]["ci_low"] == pytest.approx(out[0]["pacf"])
    for r in out[1:]:
        assert r["ci_high"] - r["pacf"] == pytest.approx(half, abs=1e-9)
        assert r["pacf"] - r["ci_low"] == pytest.approx(half, abs=1e-9)


def test_spark_decompose_invariant(spark, airpassengers):
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.spark_analytics import seasonal_decompose

    rows = [(int(i), float(v)) for i, v in enumerate(airpassengers)]
    df = spark.createDataFrame(rows, "__row_idx__ int, x double")
    out = seasonal_decompose(TimeSeriesFrame(df), ["x"],
                             model="multiplicative", period=12)
    pdf = out.df.orderBy("__row_idx__").toPandas()
    np.testing.assert_almost_equal(
        pdf["x (season. adj.)"].to_numpy(),
        (pdf["x (trend)"] * pdf["x (residual)"]).to_numpy())
    np.testing.assert_almost_equal(
        pdf["x"].to_numpy(),
        (pdf["x (season. adj.)"] * pdf["x (seasonal)"]).to_numpy())


def test_spark_granger_per_series(spark):
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.spark_analytics import granger_causality

    rng = np.random.RandomState(0)
    rows = []
    for uid in (1, 2):
        series = np.sin(np.arange(150) / 4.0) + rng.normal(0, 0.1, 150)
        lag2 = np.roll(series, 2)
        for i in range(150):
            rows.append((uid, int(i), float(series[i]), float(lag2[i])))
    df = spark.createDataFrame(rows, "uid int, __row_idx__ int, a double, b double")
    tsf = TimeSeriesFrame(df, series_cols=["uid"])
    res = granger_causality(tsf, ["a", "b"], max_lag=4).collect()
    got = {(r["uid"], r["antecedent"], r["consequent"]): r["lag"] for r in res}
    assert got.get((1, "a", "b")) is not None and got[(1, "a", "b")] <= 2
    assert got.get((2, "a", "b")) is not None and got[(2, "a", "b")] <= 2


class TestGrangerPairParallel:
    def test_matches_per_series_plan(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            granger_causality,
            granger_causality_pairs,
        )

        rng = np.random.RandomState(5)
        n = 80
        a = rng.standard_normal(n).cumsum()
        b = np.roll(a, 2) + rng.standard_normal(n) * 0.1  # b lags a by 2
        c = rng.standard_normal(n)
        rows = [(i, float(a[i]), float(b[i]), float(c[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "t long, a double, b double, c double")
        tsf = TimeSeriesFrame(df, time_col="t")

        key = lambda r: (r.antecedent, r.consequent, r.lag, round(r.p, 9))
        per_series = sorted(map(key, granger_causality(
            tsf, ["a", "b", "c"], max_lag=4).collect()))
        pair_par = sorted(map(key, granger_causality_pairs(
            tsf, ["a", "b", "c"], max_lag=4).collect()))
        assert per_series == pair_par
        # the constructed causality a->b is detected
        assert any(r[0] == "a" and r[1] == "b" for r in per_series)


class TestSeasonalComponentsTable:
    def test_matches_frame_operator(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            seasonal_components_table,
            seasonal_decompose,
        )

        rng = np.random.RandomState(3)
        rows = []
        for uid in range(3):
            base = rng.uniform(50, 150)
            for i in range(60):
                v = base * (1 + 0.3 * np.sin(2 * np.pi * i / 12)) \
                    + rng.normal(scale=2)
                rows.append((uid, i, i + uid * 1000, float(v)))
        df = spark.createDataFrame(rows, "uid int, t long, rid long, v double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["uid"])

        frame = seasonal_decompose(tsf, ["v"], model="additive", period=12)
        a = {(r.uid, r.rid): (round(r["v (season. adj.)"], 9),
                              round(r["v (trend)"], 9))
             for r in frame.df.collect()}
        table = seasonal_components_table(tsf, "v", "rid",
                                          model="additive", period=12)
        b = {(r.uid, r.rid): (round(r.adj, 9), round(r.trend, 9))
             for r in table.collect()}
        assert a == b

    def test_ids_above_2_53_exact(self, spark):
        """Ids ride the packed struct at their NATIVE long type — a
        double round-trip would corrupt ids above 2^53 (doubles have 53
        mantissa bits, so 2^53 + 1 == 2^53 in float64)."""
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            seasonal_components_table,
        )

        base = (1 << 53) + 1  # NOT representable in float64
        rows = [(0, i, base + 2 * i, float(10 + (i % 12)))
                for i in range(36)]
        df = spark.createDataFrame(rows, "uid int, t long, rid long, v double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["uid"])
        table = seasonal_components_table(tsf, "v", "rid",
                                          model="additive", period=12)
        got = sorted(r.rid for r in table.collect())
        assert got == [base + 2 * i for i in range(36)]


# -------------------------------------------------------------------- CCF
class TestCCF:
    def test_ccf_values_reference(self):
        import numpy as np

        from orange3_timeseries_spark.functions.correlation import (
            ccf_values,
        )

        rng = np.random.RandomState(3)
        x = rng.standard_normal(80)
        y = np.roll(x, 2) + rng.standard_normal(80) * 0.05
        lags, vals = ccf_values(x, y, 5)
        assert lags == list(range(-5, 6))
        d = dict(zip(lags, vals))
        # y ≈ x delayed by 2 -> peak at lag +2, near zero elsewhere
        assert d[2] > 0.9
        assert abs(d[0]) < 0.3 and abs(d[-2]) < 0.3
        # self-correlation at lag 0 is exactly acf(0) = 1
        l0, v0 = ccf_values(x, x, 0)
        assert l0 == [0] and abs(v0[0] - 1.0) < 1e-12
        # constant series -> skipped, no inf/nan rows
        assert ccf_values(x, np.ones(80), 3) == ([], [])

    def test_ccf_table_spark(self, spark):
        import datetime as dt

        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import ccf_table

        rng = np.random.RandomState(5)
        rows = []
        for uid in range(3):
            x = rng.standard_normal(40)
            y = np.roll(x, 1)
            for t in range(40):
                rows.append((uid, dt.datetime(2024, 1, 1)
                             + dt.timedelta(hours=t),
                             float(x[t]), float(y[t])))
        df = spark.createDataFrame(rows, ["user_id", "ts", "x", "y"])
        tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])
        out = ccf_table(tsf, "x", "y", nlags=3).collect()
        assert len(out) == 3 * 7
        for uid in range(3):
            d = {r.lag: r.ccf for r in out if r.user_id == uid}
            assert d[1] == max(d.values()) and d[1] > 0.8


# ---------------------------------------------------- event analytics
class TestEventAnalytics:
    def test_changepoint_detects_planted_shift(self, spark):
        import datetime as dt

        from orange3_timeseries_spark.queries import QUERIES  # noqa: F401
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        # build a tiny events-like frame: mean jumps 0 -> 5 at day 20
        rows = []
        for uid in range(3):
            for day in range(40):
                v = 0.0 if day < 20 else 5.0
                v += ((uid * 41 + day * 7) % 10) / 100.0  # small wiggle
                rows.append((uid, dt.datetime(2024, 1, 1)
                             + dt.timedelta(days=day), v))
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        df.createOrReplaceTempView("__cp_events__")
        d = (df.groupBy("user_id",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.avg("value").alias("x")))
        pw = W.partitionBy("user_id")
        ow = pw.orderBy("day")
        r = d.select(
            "user_id", "day",
            F.row_number().over(ow).alias("t"),
            F.count("*").over(pw).alias("n"),
            F.sum("x").over(ow.rowsBetween(W.unboundedPreceding, 0))
            .alias("cs"),
            F.sum("x").over(pw).alias("total"))
        gap = (F.abs(F.col("cs") / F.col("t")
                     - (F.col("total") - F.col("cs"))
                     / (F.col("n") - F.col("t")))
               * F.sqrt((F.col("t") * (F.col("n") - F.col("t")))
                        / F.col("n").cast("double")))
        g = r.where(F.col("t") < F.col("n")) \
             .select("user_id", "day", "t", gap.alias("gap"))
        bw = W.partitionBy("user_id").orderBy(F.col("gap").desc(),
                                              F.col("t").asc())
        best = (g.withColumn("rn", F.row_number().over(bw))
                .where("rn = 1").collect())
        for row in best:
            # the argmax split must be the planted boundary (t = 20)
            assert row.t == 20, (row.user_id, row.t)

    def test_event_funnel_strict_order(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        t0 = dt.datetime(2024, 1, 1)

        def ts(m):
            return t0 + dt.timedelta(minutes=m)

        rows = [
            (1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2)),
            (2, "click", ts(0)), (2, "view", ts(1)), (2, "purchase", ts(2)),
            (3, "view", ts(0)), (3, "purchase", ts(1)),
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

        def first(t):
            return F.min(F.when(F.col("event_type") == t, F.col("ts")))

        f = df.groupBy("user_id").agg(first("view").alias("t1"),
                                      first("click").alias("t2"),
                                      first("purchase").alias("t3"))
        r1 = F.col("t1").isNotNull()
        r2 = r1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
        r3 = r2 & F.col("t3").isNotNull() & (F.col("t3") > F.col("t2"))
        got = {r.user_id: (r.v, r.c, r.p) for r in
               f.select("user_id", r1.alias("v"), r2.alias("c"),
                        r3.alias("p")).collect()}
        assert got[1] == (True, True, True)     # in order
        assert got[2] == (True, False, False)   # click before view
        assert got[3] == (True, False, False)   # skipped click


# ------------------------------------------------------------- Holt trend
def test_holt_values_linear_series_exact():
    """On an exactly linear series Holt's recursion is exact: level
    tracks the line and every forecast continues it."""
    import numpy as np

    from orange3_timeseries_spark.functions.correlation import holt_values

    x = np.array([3.0 + 2.0 * t for t in range(20)])
    fc = holt_values(x, alpha=0.5, beta=0.3, horizon=4)
    np.testing.assert_allclose(
        fc, [3.0 + 2.0 * (19 + h) for h in (1, 2, 3, 4)], atol=1e-9)
    # fewer than 2 points -> no forecast
    assert holt_values(np.array([1.0]), 0.5, 0.3, 3) == []


def test_holt_recursion_reference():
    """Hand-rolled recursion check on a short irregular series."""
    from orange3_timeseries_spark.functions.correlation import holt_values

    x = [10.0, 12.0, 11.0, 15.0]
    a, b_ = 0.5, 0.3
    l, b = x[0], x[1] - x[0]
    for t in range(1, 4):
        ln = a * x[t] + (1 - a) * (l + b)
        b = b_ * (ln - l) + (1 - b_) * b
        l = ln
    got = holt_values(x, a, b_, 2)
    assert got == [l + b, l + 2 * b]


def test_holt_winters_converges_on_seasonal_series():
    import numpy as np

    from orange3_timeseries_spark.functions.correlation import (
        holt_winters_values,
    )

    m = 4
    x = np.array([2.0 * t + [5, -1, 0, -4][t % m] for t in range(240)])
    fc = holt_winters_values(x, m, 0.5, 0.3, 0.4, 4)
    want = [2.0 * (239 + h) + [5, -1, 0, -4][(240 + h - 1) % m]
            for h in range(1, 5)]
    np.testing.assert_allclose(fc, want, atol=1e-6)
    # short series refuses (needs 2 cycles)
    assert holt_winters_values(x[: 2 * m - 1], m, 0.5, 0.3, 0.4, 2) == []


class TestSmoothingExtensions:
    def test_damped_phi1_equals_plain_holt(self):
        import numpy as np

        from orange3_timeseries_spark.functions.correlation import (
            holt_damped_values,
            holt_values,
        )
        rng = np.random.RandomState(0)
        x = rng.normal(50, 5, 40).cumsum() / 10
        assert np.allclose(holt_damped_values(x, 0.5, 0.3, 1.0, 8),
                           holt_values(x, 0.5, 0.3, 8))

    def test_damping_flattens_the_horizon(self):
        import numpy as np

        from orange3_timeseries_spark.functions.correlation import (
            holt_damped_values,
        )
        x = np.arange(1.0, 31.0)  # strong linear trend
        plain = holt_damped_values(x, 0.5, 0.3, 1.0, 10)
        damped = holt_damped_values(x, 0.5, 0.3, 0.8, 10)
        # damped step increments shrink; undamped stay constant
        d_inc = np.diff(damped)
        assert all(d_inc[i + 1] < d_inc[i] for i in range(len(d_inc) - 1))
        assert damped[-1] < plain[-1]

    def test_theta_half_drift_property(self):
        """Hyndman & Billah (2003): classic Theta(θ=2) forecasts are SES
        with drift b/2 — per-step increments equal HALF the fitted OLS
        slope, exactly."""
        import numpy as np

        from orange3_timeseries_spark.functions.correlation import (
            theta_values,
        )
        x = 3.0 + 2.0 * np.arange(1, 41)  # exact line, slope 2
        fc = theta_values(x, 0.5, 5)
        assert np.allclose(np.diff(fc), 1.0)  # b/2 = 1 per step
        # first step: average of the exact line continuation and the
        # SES level of theta2 (= x itself on an exact line); SES lags a
        # ramp by (1-a)/a * b = 2 -> l_n ~ x_n - 2 (up to the decayed
        # initial transient)
        line_next = 3.0 + 2.0 * 41
        l_approx = x[-1] - 2.0
        assert abs(fc[0] - (line_next + l_approx) / 2) < 0.01

    def test_tables_match_function_cores(self, spark):
        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.functions.correlation import (
            holt_damped_values,
            theta_values,
        )
        from orange3_timeseries_spark.spark_analytics import (
            holt_damped_table,
            theta_forecast_table,
        )
        import datetime as dt

        rng = np.random.RandomState(3)
        rows = []
        series = {}
        for uid in range(3):
            xs = list(rng.normal(100, 10, 25))
            series[uid] = xs
            rows += [(uid, dt.datetime(2024, 1, 1)
                      + dt.timedelta(days=i), float(v))
                     for i, v in enumerate(xs)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                         "x double")
        tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])
        got_h = {(r.user_id, r.step): r.forecast for r in
                 holt_damped_table(tsf, "x", 0.5, 0.3, 0.9, 4).collect()}
        got_t = {(r.user_id, r.step): r.forecast for r in
                 theta_forecast_table(tsf, "x", 0.5, 4).collect()}
        for uid, xs in series.items():
            for h, v in enumerate(holt_damped_values(
                    np.array(xs), 0.5, 0.3, 0.9, 4), 1):
                assert abs(got_h[(uid, h)] - v) < 1e-9
            for h, v in enumerate(theta_values(np.array(xs), 0.5, 4), 1):
                assert abs(got_t[(uid, h)] - v) < 1e-9


def test_baseline_forecasts(spark):
    import datetime as dt

    import numpy as np

    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.spark_analytics import (
        baseline_forecast_table,
    )

    xs = [float(v) for v in [10, 12, 11, 14, 13, 15, 16, 18, 17, 20]]
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, x double")
    tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])
    out = {(r.method, r.step): r.forecast for r in
           baseline_forecast_table(tsf, "x", m=4, horizon=6).collect()}
    n = len(xs)
    for h in range(1, 7):
        assert out[("naive", h)] == xs[-1]
        assert abs(out[("drift", h)]
                   - (xs[-1] + h * (xs[-1] - xs[0]) / (n - 1))) < 1e-9
        # snaive with m=4: value from one season back, cycling
        assert out[("snaive", h)] == xs[n - 4 + ((h - 1) % 4)]
    # plan purity: no Python stage
    plan = baseline_forecast_table(tsf, "x")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan


def test_mase_smape_metrics():
    import numpy as np

    from orange3_timeseries_spark.functions import mase, smape

    train = np.array([10.0, 12, 11, 13, 12, 14])
    true = np.array([15.0, 16])
    pred = np.array([14.0, 18])
    # naive scale = mean |diff(train)| = mean(2,1,2,1,2) = 1.6
    assert mase(true, pred, train) == pytest.approx(
        np.mean([1.0, 2.0]) / 1.6)
    # seasonal m=2 scale: |train[t]-train[t-2]| = 1,1,1,1 -> 1.0
    assert mase(true, pred, train, m=2) == pytest.approx(1.5)
    want = 100.0 * np.mean([2 * 1 / 29, 2 * 2 / 34])
    assert smape(true, pred) == pytest.approx(want)
    # M4 convention: 0/0 terms count as 0 and stay in the mean
    assert smape([0.0, 1.0], [0.0, 1.0]) == 0.0
    assert smape([0.0, 1.0], [0.0, 3.0]) == pytest.approx(50.0)
    # constant training series: scale undefined
    assert np.isnan(mase(true, pred, np.ones(5)))


class TestTsFeatures:
    def test_strength_separates_seasonal_from_noise(self, spark):
        """A strongly seasonal series scores high seasonal strength; an
        iid-noise series scores near zero on both strengths."""
        import numpy as np
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            seasonal_components_table,
        )
        rng = np.random.RandomState(2)
        rows = []
        for t in range(120):
            seas = 10.0 + 5.0 * np.sin(2 * np.pi * t / 12)
            rows.append((0, t, float(seas + rng.standard_normal() * 0.1)))
            rows.append((1, t, float(10.0 + rng.standard_normal())))
        df = spark.createDataFrame(rows, "user_id int, t int, value double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        out = seasonal_components_table(tsf, "value", "t",
                                        model="multiplicative", period=12)
        c = out.select("user_id", (F.col("adj") / F.col("trend"))
                       .alias("rem"), F.col("adj"),
                       (F.col("adj") * F.col("seasonal") / F.col("trend"))
                       .alias("detr"))
        g = c.groupBy("user_id").agg(
            F.var_pop("rem").alias("vr"), F.var_pop("adj").alias("va"),
            F.var_pop("detr").alias("vd"))
        s = {r.user_id: (max(0.0, 1 - r.vr / r.va),
                         max(0.0, 1 - r.vr / r.vd))
             for r in g.collect()}
        assert s[0][1] > 0.9          # strong seasonality detected
        assert s[1][1] < s[0][1]      # noise scores lower


class TestHoltParamSearch:
    def test_winner_matches_exhaustive_local(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            HOLT_PARAM_GRID,
            holt_param_search_table,
        )
        rng = np.random.RandomState(4)
        rows = []
        for uid in range(3):
            y = np.cumsum(rng.standard_normal(50)) + uid * 5
            rows += [(uid, t, float(v)) for t, v in enumerate(y)]
        df = spark.createDataFrame(rows, "user_id int, t int, x double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        got = {r.user_id: r for r in
               holt_param_search_table(tsf, "x").collect()}

        def sse(x, a, bta):
            l, b, s = x[0], x[1] - x[0], 0.0
            for t in range(1, len(x)):
                e = x[t] - (l + b)
                s += e * e
                ln = a * x[t] + (1 - a) * (l + b)
                b = bta * (ln - l) + (1 - bta) * b
                l = ln
            return s

        for uid in range(3):
            y = np.array([r[2] for r in rows if r[0] == uid])
            best = min(HOLT_PARAM_GRID,
                       key=lambda p: (round(sse(y, *p), 6), p[0], p[1]))
            assert (got[uid].alpha, got[uid].beta) == best
            assert got[uid].sse == pytest.approx(sse(y, *best), rel=1e-12)

    def test_smooth_series_prefers_low_alpha(self, spark):
        """A noisy level series is best tracked by heavy smoothing
        (low alpha); a fast trend needs high alpha — the search must
        discriminate."""
        import numpy as np
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import (
            holt_param_search_table,
        )
        rng = np.random.RandomState(9)
        rows = [(0, t, float(10 + rng.standard_normal()))
                for t in range(80)]
        rows += [(1, t, float(np.sin(t) * 8 + t)) for t in range(80)]
        df = spark.createDataFrame(rows, "user_id int, t int, x double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        got = {r.user_id: r for r in
               holt_param_search_table(tsf, "x").collect()}
        assert got[0].alpha < got[1].alpha


class TestCroston:
    def test_hand_computed_recursion(self, spark):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import croston_table

        # demands at t=2 (4.0), t=5 (6.0), t=6 (2.0); alpha=0.2
        xs = [0, 0, 4.0, 0, 0, 6.0, 2.0, 0]
        df = spark.createDataFrame(
            [(0, t, float(v)) for t, v in enumerate(xs)],
            "user_id int, t int, x double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        [r] = croston_table(tsf, "x", alpha=0.2).collect()
        z = 4.0
        p = 3.0  # first demand at 0-based index 2 -> period 3
        z = 0.2 * 6.0 + 0.8 * z; p = 0.2 * 3 + 0.8 * p   # t=5, gap 3
        z = 0.2 * 2.0 + 0.8 * z; p = 0.2 * 1 + 0.8 * p   # t=6, gap 1
        assert r.z_hat == pytest.approx(z, rel=1e-12)
        assert r.p_hat == pytest.approx(p, rel=1e-12)
        assert r.forecast == pytest.approx(z / p, rel=1e-12)
        assert r.n_nonzero == 3

    def test_sparse_series_skipped_and_rate_sensible(self, spark):
        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import croston_table

        rng = np.random.RandomState(3)
        rows = [(0, t, float(5.0 if t % 4 == 0 else 0.0))
                for t in range(40)]          # demand 5 every 4 periods
        rows += [(1, t, 0.0) for t in range(40)]  # never demands
        df = spark.createDataFrame(rows, "user_id int, t int, x double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        out = {r.user_id: r for r in croston_table(tsf, "x").collect()}
        assert 1 not in out                      # all-zero series skipped
        # constant sizes: z_hat is exactly 5; p_hat converges toward 4
        # from its init of 1 (first demand at t=0), so after 9 updates
        # p = 4 - 3*0.8^9 ~ 3.6 and the rate sits between 5/4 and 5/3.6
        assert out[0].z_hat == pytest.approx(5.0, rel=1e-12)
        assert out[0].p_hat == pytest.approx(4 - 3 * 0.8 ** 9, rel=1e-9)
        assert 1.25 <= out[0].forecast <= 1.4


class TestGrangerPairsLocalRelation:
    def test_pairs_table_is_jvm_local_relation(self, spark):
        """The (antecedent, consequent) pair fan-out table must plan as a
        JVM LocalTableScan, not a Python-RDD-backed Scan ExistingRDD —
        the r13 optimization (operators/localrel.local_df) that keeps the
        broadcast build from re-running a Python worker job per action."""
        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.spark_analytics import granger_f_table

        rng = np.random.RandomState(7)
        n = 60
        a = rng.standard_normal(n).cumsum()
        b = np.roll(a, 1) + rng.standard_normal(n) * 0.1
        rows = [(int(i), float(a[i]), float(b[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "__row_idx__ int, a double, b double")
        tsf = TimeSeriesFrame(df)
        out = granger_f_table(tsf, ["a", "b"], lag=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the pair table must plan as a LocalTableScan carrying exactly
        # the pair columns (the test's own createDataFrame input is the
        # only ExistingRDD allowed)
        assert "LocalTableScan [antecedent" in plan
        pair_rdd = [ln for ln in plan.splitlines()
                    if "ExistingRDD" in ln and "antecedent" in ln]
        assert not pair_rdd, pair_rdd
        # and the values are the full ordered-pair set
        got = {(r.antecedent, r.consequent) for r in out.collect()}
        assert got == {("a", "b"), ("b", "a")}
