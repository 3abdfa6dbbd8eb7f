"""ADF unit-root test: numpy OLS cross-check, stationary vs random-walk
behavior, MacKinnon critical values, plan purity."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _series_df(spark):
    rng = np.random.RandomState(3)
    rows = []
    # user 0: stationary AR(1), phi=0.5 -> ADF must reject the unit root
    y = 0.0
    for t in range(200):
        y = 0.5 * y + rng.standard_normal()
        rows.append((0, t, float(y)))
    # user 1: pure random walk -> ADF must NOT reject
    y = 0.0
    for t in range(200):
        y = y + rng.standard_normal()
        rows.append((1, t, float(y)))
    return spark.createDataFrame(rows, "user_id int, t int, v double")


def _numpy_adf(y):
    """Independent OLS reference for the same regression."""
    y = np.asarray(y, dtype=float)
    dy = np.diff(y)
    t = dy[1:]                    # target Δy_t
    x = y[1:-1]                   # y_{t-1}
    d = dy[:-1]                   # Δy_{t-1}
    Z = np.column_stack((np.ones_like(x), x, d))
    beta, *_ = np.linalg.lstsq(Z, t, rcond=None)
    resid = t - Z @ beta
    s2 = resid @ resid / (len(t) - 3)
    inv = np.linalg.inv(Z.T @ Z)
    return beta[1], beta[1] / np.sqrt(s2 * inv[1, 1]), len(t)


class TestADF:
    def test_matches_numpy_ols(self, spark):
        from orange3_timeseries_spark.operators.stattests import adf_test

        df = _series_df(spark)
        out = {r.user_id: r for r in
               adf_test(df, "t", "v", ["user_id"]).collect()}
        for uid in (0, 1):
            y = [r.v for r in df.where(F.col("user_id") == uid)
                 .orderBy("t").collect()]
            beta, tau, n = _numpy_adf(y)
            assert out[uid].n_obs == n
            assert out[uid].beta == pytest.approx(beta, abs=1e-6)
            assert out[uid].tau == pytest.approx(tau, abs=1e-4)

    def test_stationary_vs_random_walk_verdicts(self, spark):
        from orange3_timeseries_spark.operators.stattests import adf_test

        out = {r.user_id: r for r in
               adf_test(_series_df(spark), "t", "v",
                        ["user_id"]).collect()}
        assert out[0].stationary_5pct        # AR(0.5) rejects unit root
        assert not out[1].stationary_5pct    # random walk does not

    def test_mackinnon_critical_values(self, spark):
        from orange3_timeseries_spark.operators.stattests import adf_test

        [r] = adf_test(_series_df(spark).where("user_id = 0"),
                       "t", "v", ["user_id"]).collect()
        T = r.n_obs
        assert r.cv_5pct == pytest.approx(
            -2.86154 - 2.8903 / T - 4.234 / T**2 - 40.04 / T**3,
            abs=1e-9)
        assert r.cv_1pct < r.cv_5pct < r.cv_10pct < 0

    def test_short_series_dropped(self, spark):
        from orange3_timeseries_spark.operators.stattests import adf_test

        rows = [(0, t, float(t)) for t in range(8)] + \
               [(1, t, float((t * 7) % 13)) for t in range(40)]
        df = spark.createDataFrame(rows, "user_id int, t int, v double")
        out = adf_test(df, "t", "v", ["user_id"]).collect()
        assert {r.user_id for r in out} == {1}  # 8 points -> 6 rows < 10

    def test_plan_is_catalyst_single_exchange(self, spark):
        from orange3_timeseries_spark.operators.stattests import adf_test

        plan = adf_test(_series_df(spark), "t", "v", ["user_id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        # one shuffle for the window/groupBy key (same key reused)
        assert plan.count("Exchange") <= 2


def _numpy_kpss(y):
    """Independent KPSS reference (level case, l4 bandwidth)."""
    y = np.asarray(y, dtype=float)
    T = len(y)
    e = y - y.mean()
    S = np.cumsum(e)
    l = int(np.floor(4.0 * (T / 100.0) ** 0.25))
    g0 = (e @ e) / T
    s2 = g0
    for j in range(1, l + 1):
        gj = (e[j:] @ e[:-j]) / T
        s2 += 2.0 * (1.0 - j / (l + 1.0)) * gj
    return (S @ S) / (T * T) / s2, l


class TestKPSS:
    def test_matches_numpy(self, spark):
        from orange3_timeseries_spark.operators.stattests import kpss_test

        df = _series_df(spark)
        out = {r.user_id: r for r in
               kpss_test(df, "t", "v", ["user_id"]).collect()}
        for uid in (0, 1):
            y = [r.v for r in df.where(F.col("user_id") == uid)
                 .orderBy("t").collect()]
            eta, l = _numpy_kpss(y)
            assert out[uid].lags == l
            assert out[uid].eta == pytest.approx(eta, rel=1e-6)

    def test_reversed_null_verdicts(self, spark):
        """KPSS null = stationary: the AR(0.5) series must NOT reject
        (stationary True), the random walk must reject (False) — the
        mirror image of the ADF verdicts on the same fixture."""
        from orange3_timeseries_spark.operators.stattests import kpss_test

        out = {r.user_id: r for r in
               kpss_test(_series_df(spark), "t", "v",
                         ["user_id"]).collect()}
        assert out[0].stationary_5pct
        assert not out[1].stationary_5pct

    def test_plan_is_catalyst(self, spark):
        from orange3_timeseries_spark.operators.stattests import kpss_test

        plan = kpss_test(_series_df(spark), "t", "v", ["user_id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan  # band join is an equi-join


class TestLjungBox:
    def test_matches_scipy_free_reference(self, spark):
        """Q statistic against a direct numpy computation, p-value
        against the closed-form chi2(10) survival function."""
        import math

        from orange3_timeseries_spark.operators.stattests import ljung_box

        df = _series_df(spark)
        out = {r.user_id: r for r in
               ljung_box(df, "t", "v", ["user_id"], lags=10).collect()}
        for uid in (0, 1):
            y = np.array([r.v for r in df.where(F.col("user_id") == uid)
                          .orderBy("t").collect()])
            e = y - y.mean()
            n = len(y)
            denom = e @ e
            q = 0.0
            for k in range(1, 11):
                rho = round((e[:-k] @ e[k:]) / denom, 7)
                q += rho * rho / (n - k)
            q *= n * (n + 2.0)
            assert out[uid].q_stat == pytest.approx(q, rel=1e-9)
            half = q / 2.0
            p = math.exp(-half) * sum(half ** j / math.factorial(j)
                                      for j in range(5))
            assert out[uid].p_value == pytest.approx(p, rel=1e-9,
                                                     abs=1e-12)

    def test_white_noise_vs_correlated_verdicts(self, spark):
        from orange3_timeseries_spark.operators.stattests import ljung_box

        rng = np.random.RandomState(7)
        rows = [(0, t, float(v))
                for t, v in enumerate(rng.standard_normal(300))]
        y = 0.0
        for t in range(300):
            y = 0.7 * y + rng.standard_normal()
            rows.append((1, t, float(y)))
        df = spark.createDataFrame(rows, "user_id int, t int, v double")
        out = {r.user_id: r for r in
               ljung_box(df, "t", "v", ["user_id"]).collect()}
        assert out[0].white_noise_5pct          # iid noise passes
        assert not out[1].white_noise_5pct      # AR(0.7) fails hard
        assert out[1].q_stat > out[0].q_stat

    def test_odd_lags_rejected(self, spark):
        from orange3_timeseries_spark.operators.stattests import ljung_box

        with pytest.raises(ValueError, match="even"):
            ljung_box(_series_df(spark), "t", "v", ["user_id"], lags=7)

    def test_plan_is_catalyst(self, spark):
        from orange3_timeseries_spark.operators.stattests import ljung_box

        plan = ljung_box(_series_df(spark), "t", "v", ["user_id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestEngleGranger:
    def test_cointegrated_vs_independent(self, spark):
        """y and x sharing a random-walk trend are cointegrated; two
        INDEPENDENT random walks are not."""
        from orange3_timeseries_spark.operators.stattests import (
            engle_granger,
        )
        rng = np.random.RandomState(11)
        rows = []
        trend = np.cumsum(rng.standard_normal(300))
        other = np.cumsum(rng.standard_normal(300))
        for t in range(300):
            # user 0: y = 2x + stationary noise (cointegrated pair)
            x = trend[t]
            rows.append((0, t, float(2 * x + rng.standard_normal()),
                         float(x)))
            # user 1: independent walks (no common trend)
            rows.append((1, t, float(trend[t]), float(other[t])))
        df = spark.createDataFrame(rows,
                                   "user_id int, t int, y double, x double")
        out = {r.user_id: r for r in
               engle_granger(df, "t", "y", "x", ["user_id"]).collect()}
        assert out[0].cointegrated_5pct
        assert out[0].beta == pytest.approx(2.0, abs=0.05)
        assert not out[1].cointegrated_5pct
        assert out[0].tau < out[1].tau

    def test_matches_numpy_two_step(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            engle_granger,
        )
        rng = np.random.RandomState(5)
        x = np.cumsum(rng.standard_normal(150))
        y = 1.5 * x + rng.standard_normal(150)
        df = spark.createDataFrame(
            [(0, t, float(y[t]), float(x[t])) for t in range(150)],
            "user_id int, t int, y double, x double")
        [r] = engle_granger(df, "t", "y", "x", ["user_id"]).collect()
        # step 1 OLS
        Z = np.column_stack((np.ones_like(x), x))
        coef, *_ = np.linalg.lstsq(Z, y, rcond=None)
        assert r.beta == pytest.approx(coef[1], abs=1e-5)
        # step 2 no-constant DF on residuals
        u = y - Z @ coef
        ul, du = u[:-1], np.diff(u)
        rho = (ul @ du) / (ul @ ul)
        s2 = ((du - rho * ul) @ (du - rho * ul)) / (len(du) - 1)
        tau = rho / np.sqrt(s2 / (ul @ ul))
        assert r.tau == pytest.approx(tau, abs=1e-3)

    def test_plan_is_catalyst_no_join_back(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            engle_granger,
        )
        df = spark.createDataFrame(
            [(0, t, float(t), float(t * 2)) for t in range(50)],
            "user_id int, t int, y double, x double")
        out = engle_granger(df, "t", "y", "x", ["user_id"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "Join" not in plan  # window sums, residuals in-row


class TestGapProfile:
    def test_known_gaps(self, spark):
        import datetime as dt

        from orange3_timeseries_spark.operators.stattests import (
            gap_profile,
        )
        # hourly grid with 2 skipped slots (one 3-hour gap)
        base = dt.datetime(2024, 1, 1)
        hours = [0, 1, 2, 5, 6, 7, 8]
        rows = [(0, base + dt.timedelta(hours=h)) for h in hours]
        df = spark.createDataFrame(rows, "user_id int, ts timestamp")
        [r] = gap_profile(df, "ts", ["user_id"]).collect()
        assert r.n_obs == 7 and r.n_gaps == 6
        assert r.median_gap_s == 3600.0
        assert r.max_gap_s == 3 * 3600.0
        assert r.missing_est == 2  # the 3h gap skips 2 grid points
        assert r.coverage == pytest.approx(7 / 9)

    def test_lower_median_even_count(self, spark):
        import datetime as dt

        from orange3_timeseries_spark.operators.stattests import (
            gap_profile,
        )
        # 5 observations -> 4 gaps [1h, 1h, 2h, 4h]: lower median = 1h
        base = dt.datetime(2024, 1, 1)
        hours = [0, 1, 2, 4, 8]
        df = spark.createDataFrame(
            [(0, base + dt.timedelta(hours=h)) for h in hours],
            "user_id int, ts timestamp")
        [r] = gap_profile(df, "ts", ["user_id"]).collect()
        assert r.median_gap_s == 3600.0  # element, not 1.5h midpoint


class TestWinsorize:
    def test_clamps_tails_only(self, spark):
        from orange3_timeseries_spark.operators.stattests import winsorize

        rows = [(0, t, float(t)) for t in range(1, 101)]  # 1..100
        df = spark.createDataFrame(rows, "user_id int, t int, v double")
        out = winsorize(df, "v", ["user_id"], lower=0.05,
                        upper=0.95).collect()
        # bounds: 5th element (5.0) and 95th element (95.0)
        for r in out:
            assert r.v_winsorized == min(max(r.v, 5.0), 95.0)
            assert r.v_clamped == (r.v < 5.0 or r.v > 95.0)
        assert sum(r.v_clamped for r in out) == 9  # 1..4 and 96..100
        # passthrough: original columns survive
        assert {"user_id", "t", "v"} <= set(out[0].asDict())

    def test_per_series_independent_bounds(self, spark):
        from orange3_timeseries_spark.operators.stattests import winsorize

        rows = [(0, t, float(t)) for t in range(10)] + \
               [(1, t, float(t * 100)) for t in range(10)]
        df = spark.createDataFrame(rows, "user_id int, t int, v double")
        out = winsorize(df, "v", ["user_id"], lower=0.2,
                        upper=0.8).collect()
        hi = {u: max(r.v_winsorized for r in out if r.user_id == u)
              for u in (0, 1)}
        assert hi[1] == hi[0] * 100  # series scaled independently


class TestECM:
    def test_recovers_known_coefficients(self, spark):
        """Simulate a textbook ECM and recover (alpha, gamma, beta)."""
        rng = np.random.RandomState(21)
        x = np.cumsum(rng.standard_normal(400))
        y = np.empty(400)
        y[0] = 2.0 * x[0]
        for t in range(1, 400):
            u_prev = y[t - 1] - 2.0 * x[t - 1]
            dy = 0.1 - 0.4 * u_prev + 1.2 * (x[t] - x[t - 1]) \
                + 0.05 * rng.standard_normal()
            y[t] = y[t - 1] + dy
        from orange3_timeseries_spark.operators.stattests import ecm_fit

        df = spark.createDataFrame(
            [(0, t, float(y[t]), float(x[t])) for t in range(400)],
            "user_id int, t int, y double, x double")
        [r] = ecm_fit(df, "t", "y", "x", ["user_id"]).collect()
        assert r.ec_valid
        assert r.ec_gamma == pytest.approx(-0.4, abs=0.05)
        assert r.beta_dx == pytest.approx(1.2, abs=0.05)
        # the drift is absorbed by the cointegrating intercept (step-1
        # centers u at its equilibrium u* = alpha/-gamma), so the ECM
        # constant estimates ~0 = alpha + gamma*u* — textbook behavior
        assert r.alpha == pytest.approx(0.0, abs=0.05)

    def test_plan_is_catalyst(self, spark):
        from orange3_timeseries_spark.operators.stattests import ecm_fit

        df = spark.createDataFrame(
            [(0, t, float(t), float(t * 2)) for t in range(50)],
            "user_id int, t int, y double, x double")
        plan = ecm_fit(df, "t", "y", "x", ["user_id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
