"""Model-tier tests: parameter recovery on synthetic processes, the
reference's invariant assertions (CI sandwich, ``tests/test_models.py:29-30,
46-47``; evaluation result shape, ``:61-62``), and the distributed
per-series fit path."""

import csv
import os

import numpy as np
import pytest

from orange3_timeseries_spark.models import (
    ARIMA, VAR, evaluate_by_series, forecast_by_series, model_evaluation,
)
from orange3_timeseries_spark.models.evaluation import HEADER

HERE = os.path.dirname(__file__)


def _airpassengers():
    with open(os.path.join(HERE, "data", "airpassengers.csv")) as f:
        rows = list(csv.reader(f))
    return np.array([float(r[1]) for r in rows[3:]])


def _ar1(n=400, phi=0.7, c=2.0, seed=7):
    rng = np.random.RandomState(seed)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = c + phi * y[t - 1] + rng.normal(scale=0.5)
    return y


class TestARIMAEstimatorContract:
    """The estimator contract (VERDICT r1 #8): 'hr' (default) is
    Hannan-Rissanen conditional least squares and tracks the DEPRECATED
    statsmodels goldens the reference keeps in comments
    (``tests/test_models.py:16-19``); 'mle' is exact Kalman-filter MLE
    and matches the reference's LIVE SARIMAX goldens (``:21-27``)."""

    # reference tests/test_models.py:21-27 (current statsmodels ARIMA)
    GOLD_FC = [464.2, 466.913, 460.612, 457.589, 457.872,
               458.669, 458.908, 458.818, 458.729, 458.716]
    GOLD_CL = [402.92, 362.405, 329.234, 307.603, 292.039,
               277.967, 264.189, 251.006, 238.651, 227.043]
    GOLD_CH = [525.48, 571.422, 591.989, 607.576, 623.706,
               639.37, 653.627, 666.63, 678.807, 690.389]
    # reference tests/test_models.py:16-19 (deprecated statsmodels ARMA)
    OLD_FC = [466.409, 471.787, 467.914, 467.253, 469.951,
              473.178, 475.83, 478.14, 480.454, 482.848]

    def test_mle_matches_reference_goldens(self):
        m = ARIMA((2, 1, 0), method="mle").fit(_airpassengers())
        fc, lo, hi = m.predict(10)
        np.testing.assert_allclose(np.ravel(fc), self.GOLD_FC, atol=0.01)
        np.testing.assert_allclose(np.ravel(lo), self.GOLD_CL, atol=0.02)
        np.testing.assert_allclose(np.ravel(hi), self.GOLD_CH, atol=0.02)

    def test_hr_tracks_deprecated_goldens(self):
        m = ARIMA((2, 1, 0)).fit(_airpassengers())
        fc, _, _ = m.predict(10)
        np.testing.assert_allclose(np.ravel(fc), self.OLD_FC, atol=1.0)

    def test_mle_with_ma_terms_and_mean(self):
        # d=0 keeps a mean term (statsmodels trend='c' convention);
        # an invertible MA fit must produce a sandwiched, finite forecast
        y = _airpassengers()
        m = ARIMA((1, 0, 1), method="mle").fit(y)
        fc, lo, hi = m.predict(5)
        assert np.isfinite(np.ravel(fc)).all()
        assert ((np.ravel(lo) < np.ravel(fc))
                & (np.ravel(fc) < np.ravel(hi))).all()
        assert abs(np.ravel(fc)[0] - y[-1]) < 100
        assert np.abs(m.results.phi).max() < 1  # stationarity enforced

    def test_mle_exog_free_data_matches_plain_mle(self):
        # use_exog=True with no exog supplied degrades to the plain MLE
        # fit — same params, same forecast (the 'hr'-path contract,
        # extended to 'mle' in r4)
        y = _airpassengers()
        plain = ARIMA((1, 0, 1), method="mle").fit(y)
        exogless = ARIMA((1, 0, 1), method="mle", use_exog=True).fit(y)
        np.testing.assert_allclose(exogless.results.phi, plain.results.phi)
        np.testing.assert_allclose(
            exogless.results.theta, plain.results.theta)
        np.testing.assert_allclose(np.ravel(exogless.predict(5)[0]),
                                   np.ravel(plain.predict(5)[0]))

    def test_mle_exog_recovers_regression_effect(self):
        # regression-with-ARMA-errors: y = 5 + 2 x + AR(1) noise.  The
        # joint MLE must recover beta and phi, and the forecast must
        # track the supplied future exog (statsmodels SARIMAX exog
        # convention).
        rng = np.random.default_rng(7)
        n = 300
        x = rng.normal(size=n)
        z = np.zeros(n)
        for t in range(1, n):
            z[t] = 0.6 * z[t - 1] + rng.normal(scale=0.3)
        y = 5.0 + 2.0 * x + z
        m = ARIMA((1, 0, 0), method="mle", use_exog=True).fit(y, exog=x)
        beta = float(m.results.beta_exog[0])
        phi = float(m.results.phi[0])
        assert abs(beta - 2.0) < 0.1
        assert abs(phi - 0.6) < 0.15
        x_fut = np.array([1.0, -1.0, 0.0])
        fc, lo, hi = m.predict(3, exog=x_fut.reshape(-1, 1))
        fc = np.ravel(fc)
        # step-to-step swing dominated by the exog effect: beta * dx
        assert abs((fc[0] - fc[1]) - beta * 2.0) < 0.5
        assert ((np.ravel(lo) < fc) & (fc < np.ravel(hi))).all()
        # statsmodels convention: exog adds to k in the IC penalty
        plain = ARIMA((1, 0, 0), method="mle").fit(y)
        assert m.results.aic < plain.results.aic  # exog explains variance

    def test_mle_exog_forecast_requires_future_exog(self):
        rng = np.random.default_rng(3)
        y = np.cumsum(rng.normal(size=80)) + 50
        x = rng.normal(size=80)
        m = ARIMA((1, 0, 0), method="mle", use_exog=True).fit(y, exog=x)
        with pytest.raises(ValueError):
            m.predict(3)


class TestForecastWideTable:
    def test_naming_and_ci_metadata(self, spark):
        """Wide forecast table carries the reference's ci_percent /
        ci_attrs cross-links (models.py:216-222) as column metadata."""
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models import forecast_wide_table

        y = _ar1(120)
        rows = [(uid, t, float(y[t] + uid)) for uid in (1, 2)
                for t in range(120)]
        df = spark.createDataFrame(rows, "uid int, t long, value double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["uid"])
        wide = forecast_wide_table(tsf, ["value"],
                                   lambda: ARIMA((1, 0, 0)), steps=4)
        assert "value (forecast)" in wide.columns
        assert "value (95%CI low)" in wide.columns
        assert "value (95%CI high)" in wide.columns
        md_fc = wide.schema["value (forecast)"].metadata
        assert md_fc["ci_attrs"] == ["value (95%CI low)",
                                     "value (95%CI high)"]
        assert wide.schema["value (95%CI low)"].metadata["ci_percent"] == 95
        got = wide.orderBy("uid", "step").collect()
        assert len(got) == 8  # 2 series x 4 steps
        for r in got:
            assert r["value (95%CI low)"] < r["value (forecast)"] \
                < r["value (95%CI high)"]


class TestARIMA:
    def test_ar1_recovery(self):
        y = _ar1()
        m = ARIMA((1, 0, 0)).fit(y)
        assert m.results.phi[0] == pytest.approx(0.7, abs=0.06)
        # unconditional mean c/(1-phi) ~ 6.67
        mean = m.results.const / (1 - m.results.phi[0])
        assert mean == pytest.approx(2.0 / 0.3, rel=0.1)

    def test_forecast_ci_sandwich(self):
        y = _airpassengers()
        m = ARIMA((2, 1, 1)).fit(y)
        fc, lo, hi = m.predict(10)
        assert np.all(lo <= fc) and np.all(fc <= hi)
        # CI width grows with horizon for an integrated process
        assert (hi - lo)[-1] > (hi - lo)[0]

    def test_forecast_plausible_level(self):
        y = _airpassengers()
        m = ARIMA((1, 1, 0)).fit(y)
        fc, lo, hi = m.predict(5)
        # airpassengers ends at 432; a d=1 forecast stays in the ballpark
        assert 300 < fc[0] < 600

    def test_fitted_residual_identity(self):
        y = _airpassengers()
        m = ARIMA((1, 1, 1)).fit(y)
        fitted = m.fittedvalues()
        resid = m.residuals()
        assert len(fitted) == len(y) - 1
        np.testing.assert_allclose(y[-len(fitted):] - fitted, resid,
                                   atol=1e-9)

    def test_trailing_nan_truncation(self):
        y = np.concatenate((_ar1(100), [np.nan, np.nan]))
        m = ARIMA((1, 0, 0)).fit(y)
        assert len(m._endog) == 100

    def test_aic_bic_finite(self):
        m = ARIMA((1, 0, 1)).fit(_ar1(200))
        assert np.isfinite(m.results.aic) and np.isfinite(m.results.bic)

    def test_forecast_table_naming(self):
        m = ARIMA((1, 0, 0)).fit(_ar1(100), var_names=["Close"])
        cols = m.predict(5, as_table=True)
        assert set(cols) == {"Close (forecast)", "Close (95%CI low)",
                             "Close (95%CI high)"}
        assert len(cols["Close (forecast)"]) == 5


def _var2(n=500, seed=3):
    rng = np.random.RandomState(seed)
    A = np.array([[0.5, 0.1], [0.2, 0.3]])
    c = np.array([1.0, 0.5])
    y = np.zeros((n, 2))
    for t in range(1, n):
        y[t] = c + A @ y[t - 1] + rng.normal(scale=0.3, size=2)
    return y, A, c


class TestVAR:
    def test_var1_recovery(self):
        y, A, c = _var2()
        m = VAR(1).fit(y)
        np.testing.assert_allclose(m.results.coefs[0], A, atol=0.08)
        np.testing.assert_allclose(m.results.trend_coefs[0], c, atol=0.15)

    def test_forecast_ci_sandwich(self):
        y, *_ = _var2()
        m = VAR(2).fit(y)
        fc, lo, hi = m.predict(8)
        assert fc.shape == (8, 2)
        assert np.all(lo <= fc) and np.all(fc <= hi)
        assert np.all((hi - lo)[-1] >= (hi - lo)[0])

    def test_ic_selection_picks_true_order(self):
        y, *_ = _var2()
        m = VAR(6, ic="bic").fit(y)
        assert m.order[0] == 1

    def test_magic_ic(self):
        y, *_ = _var2()
        m = VAR(4, ic="magic").fit(y)
        assert 0 <= m.order[0] <= 4

    def test_trend_ct(self):
        rng = np.random.RandomState(1)
        t = np.arange(300, dtype=float)
        y = np.column_stack((0.5 * t + rng.normal(size=300),
                             -0.2 * t + rng.normal(size=300)))
        m = VAR(1, trend="ct").fit(y)
        fc, _, _ = m.predict(10)
        # forecast continues the linear trends
        assert fc[-1, 0] > fc[0, 0] > 140
        assert fc[-1, 1] < fc[0, 1] < -55

    def test_forecast_table_naming(self):
        y, *_ = _var2(200)
        m = VAR(1).fit(y, var_names=["a", "b"])
        cols = m.predict(4, as_table=True, alpha=0.1)
        assert "a (forecast)" in cols and "b (90%CI high)" in cols


class TestEvaluation:
    def test_shape_and_header(self):
        y = _airpassengers()
        models = [ARIMA((1, 1, 0)), ARIMA((0, 1, 1))]
        res = model_evaluation(y, models, n_folds=3, forecast_steps=6)
        assert res[0] == HEADER
        assert len(res) == 1 + 2 * len(models)
        for row in res[1:]:
            assert len(row) == 8
        assert res[2][0].endswith(" (in-sample)")
        # scores are finite floats
        assert all(np.isfinite(v) for v in res[1][1:])

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="too short"):
            model_evaluation(np.arange(10.0), [ARIMA((1, 0, 0))],
                             n_folds=5, forecast_steps=5)


@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    for uid in range(4):
        y = _ar1(120, phi=0.6, c=1.0 + uid, seed=uid)
        for t, v in enumerate(y):
            rows.append((uid, t, float(v), float(v) * 0.5 + t * 0.01))
    return spark.createDataFrame(rows, "user_id int, t int, x double, z double")


class TestSparkModels:
    def test_forecast_by_series_arima(self, spark, series_df):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        out = forecast_by_series(tsf, ["x"], lambda: ARIMA((1, 0, 0)),
                                 steps=5).toPandas()
        assert len(out) == 4 * 5
        assert set(out.columns) == {"user_id", "step", "var", "forecast",
                                    "ci_low", "ci_high"}
        assert (out.ci_low <= out.forecast).all()
        assert (out.forecast <= out.ci_high).all()
        # per-series means differ (c = 1 + uid): forecasts should too
        m = out.groupby("user_id").forecast.mean()
        assert m[3] > m[0]

    def test_forecast_by_series_var(self, spark, series_df):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        out = forecast_by_series(tsf, ["x", "z"], lambda: VAR(1),
                                 steps=3).toPandas()
        assert len(out) == 4 * 3 * 2
        assert set(out["var"]) == {"x", "z"}

    def test_evaluate_by_series(self, spark, series_df):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        out = evaluate_by_series(
            tsf, "x", [lambda: ARIMA((1, 0, 0))],
            n_folds=2, forecast_steps=5).toPandas()
        # 4 series x 1 model x {cv, in-sample}
        assert len(out) == 8
        assert out.in_sample.sum() == 4
        assert np.isfinite(out.rmse).all()


class TestVectorEvaluation:
    def test_var_eval_by_series(self, spark, series_df):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models import VAR

        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        out = evaluate_by_series(
            tsf, "x", [lambda: VAR(1)], n_folds=2, forecast_steps=5,
            extra_cols=["z"]).toPandas()
        # 4 series x 1 model x {cv, in-sample}
        assert len(out) == 8
        assert np.isfinite(out.rmse).all()
        assert out.model.str.startswith("VAR").all()


class TestNamedInSample:
    def test_fitted_residual_tables(self):
        y = _ar1(150)
        m = ARIMA((1, 0, 0)).fit(y, var_names=["Close"])
        ft = m.fittedvalues(as_table=True)
        rt = m.residuals(as_table=True)
        assert set(ft) == {"Close (fitted)"}
        assert set(rt) == {"Close (residuals)"}
        np.testing.assert_allclose(
            ft["Close (fitted)"] + rt["Close (residuals)"],
            y[-len(rt["Close (residuals)"]):], atol=1e-9)


class TestArimax:
    def test_exog_improves_fit_and_forecast(self):
        rng = np.random.RandomState(11)
        n = 300
        x = rng.standard_normal(n)
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.5 * y[t - 1] + 2.0 * x[t] + rng.normal(scale=0.1)
        plain = ARIMA((1, 0, 0)).fit(y)
        withx = ARIMA((1, 0, 0), use_exog=True).fit(y, exog=x[:, None])
        assert withx.results.sigma2 < plain.results.sigma2 / 5
        assert withx.results.beta_exog[0] == pytest.approx(2.0, abs=0.1)
        # forecasting requires future exog
        with pytest.raises(ValueError, match="exog"):
            withx.predict(3)
        fc, lo, hi = withx.predict(3, exog=np.zeros((3, 1)))
        assert np.all(lo <= fc) and np.all(fc <= hi)

    def test_one_dimensional_exog_is_a_column(self):
        # regression: a 1-D exog used to atleast_2d into a ROW matrix and
        # silently slice to zero regression columns on the 'hr' path
        rng = np.random.RandomState(11)
        n = 300
        x = rng.standard_normal(n)
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.5 * y[t - 1] + 2.0 * x[t] + rng.normal(scale=0.1)
        withx = ARIMA((1, 0, 0), use_exog=True).fit(y, exog=x)
        assert withx.results.beta_exog.shape == (1,)
        assert withx.results.beta_exog[0] == pytest.approx(2.0, abs=0.1)


# --------------------------------------------------------- HoltWinters model
class TestHoltWintersModel:
    def test_contract_and_forecast(self):
        import numpy as np

        from orange3_timeseries_spark.models.smoothing import HoltWinters

        m = 4
        y = np.array([2.0 * t + [5, -1, 0, -4][t % m]
                      for t in range(240)])
        hw = HoltWinters(m=m).fit(y, var_names=["y"])
        fc, lo, hi = hw.predict(4)
        want = [2.0 * (239 + h) + [5, -1, 0, -4][(240 + h - 1) % m]
                for h in range(1, 5)]
        np.testing.assert_allclose(fc, want, atol=1e-5)
        assert (lo <= fc).all() and (fc <= hi).all()
        # CI widens with horizon
        assert ((hi - lo)[1:] >= (hi - lo)[:-1]).all()
        # naming contract table
        table = hw.predict(3, as_table=True)
        assert "y (forecast)" in table
        assert "y (95%CI low)" in table and "y (95%CI high)" in table
        # fitted/residuals align with input length
        assert len(hw.fittedvalues()) == len(y)
        resid = hw.residuals()
        # smoothing converges: the last quarter's residuals are ~0
        assert np.nanmax(np.abs(resid[180:])) < 1e-4

    def test_holt_linear_mode(self):
        import numpy as np

        from orange3_timeseries_spark.models.smoothing import HoltWinters

        y = np.array([3.0 + 2.0 * t for t in range(30)])
        hw = HoltWinters().fit(y)
        fc, lo, hi = hw.predict(3)
        np.testing.assert_allclose(
            fc, [3.0 + 2.0 * (29 + h) for h in (1, 2, 3)], atol=1e-8)

    def test_in_model_evaluation(self):
        import numpy as np

        from orange3_timeseries_spark.models.evaluation import (
            model_evaluation,
        )
        from orange3_timeseries_spark.models.smoothing import HoltWinters

        rng = np.random.RandomState(0)
        y = np.cumsum(rng.standard_normal(60)) + np.arange(60) * 0.3
        res = model_evaluation(y, [HoltWinters()], n_folds=3,
                               forecast_steps=4)
        assert res[0][0] == "Model"
        assert any("HoltWinters" in str(row[0]) for row in res[1:])

    def test_distributed_per_series_holtwinters(self, spark):
        import datetime as dt

        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.smoothing import HoltWinters
        from orange3_timeseries_spark.models.spark import (
            forecast_by_series,
        )

        rows = []
        for uid in range(3):
            for t in range(30):
                v = float(uid + 1) * t + (t % 7)
                rows.append((uid, dt.datetime(2024, 1, 1)
                             + dt.timedelta(days=t), v))
        df = spark.createDataFrame(rows, ["user_id", "ts", "y"])
        tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])
        out = forecast_by_series(tsf, ["y"],
                                 lambda: HoltWinters(m=7),
                                 steps=3).collect()
        assert len(out) == 9  # 3 series x 3 steps
        cols = out[0].asDict()
        assert {"step", "forecast", "ci_low", "ci_high"} <= set(cols)
        # slope-(uid+1) series: forecasts keep climbing per series
        for uid in range(3):
            fs = [r.forecast for r in sorted(out, key=lambda r: r.step)
                  if r.user_id == uid]
            assert fs == sorted(fs)


class TestAutoOrder:
    def test_grid_shape_and_winner(self, spark, series_df):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.spark import (
            DEFAULT_ORDER_GRID,
            auto_arima_order_by_series,
        )
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        full = auto_arima_order_by_series(tsf, "x",
                                          keep_all=True).toPandas()
        # one row per (series, order): every candidate fit
        assert len(full) == 4 * len(DEFAULT_ORDER_GRID)
        assert set(map(tuple, full[["p", "d", "q"]].values)) \
            == set(DEFAULT_ORDER_GRID)
        win = auto_arima_order_by_series(tsf, "x").toPandas()
        assert len(win) == 4  # exactly one winner per series
        # the winner IS the grid argmin on (round(aic,6), p, d, q)
        for uid, grp in full.groupby("user_id"):
            g = grp.assign(a6=grp["aic"].round(6)) \
                .sort_values(["a6", "p", "d", "q"])
            best = g.iloc[0]
            w = win[win["user_id"] == uid].iloc[0]
            assert (w.p, w.d, w.q) == (best.p, best.d, best.q)

    def test_selects_parsimonious_order_on_ar1(self, spark, series_df):
        """On a true AR(1) the winner should be a stationary low-order
        model — AIC's parsimony penalty must actually bite (never the
        full (2,1,1) everywhere)."""
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.spark import (
            auto_arima_order_by_series,
        )
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        win = auto_arima_order_by_series(tsf, "x").toPandas()
        assert (win["d"] == 0).all()  # AR(1) data is stationary

    def test_bic_ranking_and_aic_matches_local_fit(self, spark,
                                                   series_df):
        import numpy as np

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.spark import (
            auto_arima_order_by_series,
        )
        tsf = TimeSeriesFrame(series_df, time_col="t",
                              series_cols=["user_id"])
        win = auto_arima_order_by_series(tsf, "x", ic="bic").toPandas()
        assert len(win) == 4
        # distributed AIC equals the local single-series fit exactly
        full = auto_arima_order_by_series(tsf, "x",
                                          keep_all=True).toPandas()
        y = np.array([r.x for r in series_df.where("user_id = 2")
                      .orderBy("t").collect()])
        local = ARIMA((2, 0, 1)).fit(y)
        got = full[(full.user_id == 2) & (full.p == 2)
                   & (full.d == 0) & (full.q == 1)].iloc[0]
        assert got.aic == pytest.approx(local.results.aic, rel=1e-12)
        assert got.bic == pytest.approx(local.results.bic, rel=1e-12)

    def test_too_short_series_drops_orders_not_job(self, spark):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.spark import (
            auto_arima_order_by_series,
        )
        rows = [(0, t, float(t + 0.5)) for t in range(3)] + \
               [(1, t, float(_ar1(120, 0.5, 0.0, 9)[t]))
                for t in range(120)]
        df = spark.createDataFrame(rows, "user_id int, t int, x double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        full = auto_arima_order_by_series(tsf, "x",
                                          keep_all=True).toPandas()
        # a 3-point series passes the n > p+q+1 length guard only for
        # (1,0,0); every other order is silently skipped — NO exception
        # escapes the Arrow stage, the long series is unaffected
        assert set(map(tuple,
                       full[full.user_id == 0][["p", "d", "q"]].values)) \
            == {(1, 0, 0)}
        assert len(full[full.user_id == 1]) == 8


class TestVarAutoLag:
    def test_selects_true_lag_order(self, spark):
        """A simulated VAR(2) pair should select lag 2 over 0/1/3."""
        import numpy as np

        from orange3_timeseries_spark.models.var import _fit_var

        rng = np.random.RandomState(12)
        y = np.zeros((300, 2))
        A1 = np.array([[0.5, 0.1], [0.0, 0.4]])
        A2 = np.array([[-0.3, 0.0], [0.1, -0.2]])
        for t in range(2, 300):
            y[t] = A1 @ y[t - 1] + A2 @ y[t - 2] \
                + rng.standard_normal(2) * 0.5
        aics = {p: _fit_var(y, p, "c").aic for p in range(4)}
        assert min(aics, key=aics.get) == 2

    def test_query_shape(self, spark):
        import sys
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as E

        out = E.queries()["var_auto_lag_by_user"](
            spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert len(rows) > 0
        assert all(0 <= r.k_ar <= 3 for r in rows)
        assert len({r.user_id for r in rows}) == len(rows)  # one winner


class TestQuantizedGramBudget:
    def test_overflow_guard_falls_back_to_plain_ols(self):
        # units ~1e9 squared over 64 rows would exceed 2^62 and wrap the
        # int64 Gram matmul silently; the guard must route to plain ols
        # (whose float path is approximate but not WRONG) instead
        import numpy as np

        from orange3_timeseries_spark.models.arima import (
            _ne_ols_quantized,
            ols,
        )

        rng = np.random.RandomState(11)
        n = 64
        # on-grid at scale 100 (multiples of 0.01) but astronomically
        # large, so the grid check passes and only the budget trips
        X = np.column_stack(
            (np.ones(n), np.round(rng.uniform(1e6, 2e7, n), 2)))
        beta_true = np.array([3.0, 1.5])
        y = np.round(X @ beta_true, 2)
        bq, rq, rssq = _ne_ols_quantized(y, X, [100.0, 100.0])
        bo, ro, rsso = ols(y, X)
        assert np.allclose(bq, bo)          # identical -> fell back
        assert np.isfinite(rssq)
        # sanity: a small on-grid problem still takes the integer path
        Xs = np.column_stack(
            (np.ones(n), np.round(rng.uniform(1, 9, n), 2)))
        ys = np.round(Xs @ beta_true, 2)
        bs, _, _ = _ne_ols_quantized(ys, Xs, [100.0, 100.0])
        # the target is snapped to the 0.01 grid, so recovery is only
        # grid-accurate — the point is the integer path ran and solved
        assert np.allclose(bs, beta_true, atol=1e-2)
