"""Model persistence: parquet round-trip + bit-identical forecasts."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _tsf(spark, n_users=4, n=60, order_seed=3):
    from orange3_timeseries_spark.frame import TimeSeriesFrame

    rng = np.random.RandomState(order_seed)
    rows = []
    for uid in range(n_users):
        y = 0.0
        for t in range(n):
            y = 5.0 + 0.6 * y + rng.standard_normal()
            rows.append((uid, t, float(y)))
    df = spark.createDataFrame(rows, "user_id int, t int, value double")
    return TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])


class TestArimaRegistry:
    def test_saved_model_forecasts_bit_identical(self, spark, tmp_path):
        from orange3_timeseries_spark.models.registry import (
            arima_model_table,
            forecast_from_model_table,
            read_model_table,
            write_model_table,
        )
        from orange3_timeseries_spark.models.arima import ARIMA
        from orange3_timeseries_spark.models.spark import (
            forecast_by_series,
        )

        tsf = _tsf(spark)
        models = arima_model_table(tsf, ["value"], order=(2, 1, 1))
        path = str(tmp_path / "arima_models")
        write_model_table(models, path)
        loaded = read_model_table(spark, path)
        assert loaded.count() == 4

        served = {(r.user_id, r.step): r for r in
                  forecast_from_model_table(loaded, steps=8,
                                            alpha=0.05).collect()}
        direct = {(r.user_id, r.step): r for r in forecast_by_series(
            tsf, ["value"],
            lambda: ARIMA((2, 1, 1)), steps=8, alpha=0.05).collect()}
        assert set(served) == set(direct) and len(served) == 32
        for k in direct:
            # EXACT equality: the registry replays the same recursion
            # on the same stored doubles — not approximately, equal
            assert served[k].forecast == direct[k].forecast, k
            assert served[k].ci_low == direct[k].ci_low, k
            assert served[k].ci_high == direct[k].ci_high, k

    def test_no_refit_no_history_needed(self, spark, tmp_path):
        """Scoring touches only the model table: forecasts come out
        even when the original history no longer exists anywhere."""
        from orange3_timeseries_spark.models.registry import (
            arima_model_table,
            forecast_from_model_table,
            read_model_table,
            write_model_table,
        )

        path = str(tmp_path / "m2")
        write_model_table(
            arima_model_table(_tsf(spark), ["value"], order=(1, 0, 0)),
            path)
        out = forecast_from_model_table(read_model_table(spark, path),
                                        steps=3)
        rows = out.collect()
        assert len(rows) == 12
        assert all(np.isfinite(r.forecast) for r in rows)
        assert all(r.ci_low < r.forecast < r.ci_high for r in rows)

    def test_ma_state_and_differencing_survive_roundtrip(self, spark,
                                                         tmp_path):
        """(0,1,2): forecast depends ONLY on stored e_tail + y_tail —
        the pure test that the persisted state is sufficient."""
        from orange3_timeseries_spark.models.registry import (
            arima_model_table,
            forecast_from_model_table,
        )
        from orange3_timeseries_spark.models.arima import ARIMA
        from orange3_timeseries_spark.models.spark import (
            forecast_by_series,
        )

        tsf = _tsf(spark, n_users=2, n=80, order_seed=11)
        models = arima_model_table(tsf, ["value"], order=(0, 1, 2))
        served = {(r.user_id, r.step): r.forecast for r in
                  forecast_from_model_table(models, steps=5).collect()}
        direct = {(r.user_id, r.step): r.forecast for r in
                  forecast_by_series(tsf, ["value"],
                                     lambda: ARIMA((0, 1, 2)),
                                     steps=5).collect()}
        assert served == direct


class TestVarRegistry:
    def test_var_roundtrip_bit_identical(self, spark, tmp_path):
        from orange3_timeseries_spark.models import VAR
        from orange3_timeseries_spark.models.registry import (
            forecast_from_var_model_table,
            read_model_table,
            var_model_table,
            write_model_table,
        )
        from orange3_timeseries_spark.models.spark import (
            forecast_by_series,
        )
        from orange3_timeseries_spark.frame import TimeSeriesFrame

        rng = np.random.RandomState(21)
        rows = []
        for uid in range(3):
            a = b = 0.0
            for t in range(70):
                a = 1.0 + 0.5 * a + 0.2 * b + rng.standard_normal()
                b = -0.5 + 0.1 * a + 0.4 * b + rng.standard_normal()
                rows.append((uid, t, float(a), float(b)))
        tsf = TimeSeriesFrame(
            spark.createDataFrame(
                rows, "user_id int, t int, x double, y double"),
            time_col="t", series_cols=["user_id"])

        path = str(tmp_path / "var_models")
        write_model_table(
            var_model_table(tsf, ["x", "y"], maxlags=2), path)
        served = {(r.user_id, r.step, r.var): r for r in
                  forecast_from_var_model_table(
                      read_model_table(spark, path), steps=4).collect()}
        direct = {(r.user_id, r.step, r.var): r for r in
                  forecast_by_series(tsf, ["x", "y"], lambda: VAR(2),
                                     steps=4).collect()}
        assert set(served) == set(direct) and len(served) == 24
        for k in direct:
            assert served[k].forecast == direct[k].forecast, k
            assert served[k].ci_low == direct[k].ci_low, k
            assert served[k].ci_high == direct[k].ci_high, k


    def test_var_tail_uses_nan_filtered_history(self, spark):
        """A trailing NULL row must not poison the persisted tail: VAR
        fits (and forecasts from) the NaN-filtered history."""
        from orange3_timeseries_spark.models import VAR
        from orange3_timeseries_spark.models.registry import (
            forecast_from_var_model_table,
            var_model_table,
        )
        from orange3_timeseries_spark.models.spark import (
            forecast_by_series,
        )
        from orange3_timeseries_spark.frame import TimeSeriesFrame

        rng = np.random.RandomState(31)
        rows = []
        for t in range(50):
            x = float(rng.standard_normal() + 0.1 * t)
            y = float(rng.standard_normal())
            if t in (47, 49):                 # NULLs at the tail
                rows.append((1, t, None, y))
            else:
                rows.append((1, t, x, y))
        tsf = TimeSeriesFrame(
            spark.createDataFrame(
                rows, "user_id int, t int, x double, y double"),
            time_col="t", series_cols=["user_id"])
        served = {(r.step, r.var): r.forecast for r in
                  forecast_from_var_model_table(
                      var_model_table(tsf, ["x", "y"], maxlags=1),
                      steps=3).collect()}
        direct = {(r.step, r.var): r.forecast for r in
                  forecast_by_series(tsf, ["x", "y"], lambda: VAR(1),
                                     steps=3).collect()}
        assert served == direct
        assert all(np.isfinite(v) for v in served.values())


class TestSmoothingRegistry:
    FAMILIES = [
        ("holt", dict(alpha=0.5, beta=0.3)),
        ("holt_damped", dict(alpha=0.5, beta=0.3, phi=0.9)),
        ("holt_winters", dict(m=7, alpha=0.5, beta=0.3, gamma=0.4)),
        ("theta", dict(alpha=0.5)),
    ]

    def _live(self, spark, tsf, family, params, steps):
        from orange3_timeseries_spark.spark_analytics import (
            holt_damped_table,
            holt_forecast_table,
            holt_winters_table,
            theta_forecast_table,
        )
        fn = {"holt": holt_forecast_table,
              "holt_damped": holt_damped_table,
              "holt_winters": holt_winters_table,
              "theta": theta_forecast_table}[family]
        return fn(tsf, "value", horizon=steps, **params)

    @pytest.mark.parametrize("family,params",
                             FAMILIES, ids=[f for f, _ in FAMILIES])
    def test_roundtrip_bit_identical_to_live_fit(self, spark, tmp_path,
                                                 family, params):
        from orange3_timeseries_spark.models.registry import (
            forecast_from_smoothing_table,
            read_model_table,
            smoothing_model_table,
            write_model_table,
        )

        tsf = _tsf(spark)
        models = smoothing_model_table(tsf, ["value"], family=family,
                                       **params)
        path = str(tmp_path / f"{family}_models")
        write_model_table(models, path)
        served = {(r["user_id"], r["step"]): r["forecast"] for r in
                  forecast_from_smoothing_table(
                      read_model_table(spark, path), steps=5).collect()}
        live = {(r["user_id"], r["step"]): r["forecast"] for r in
                self._live(spark, tsf, family, params, 5).collect()}
        assert set(served) == set(live) and len(served) == 20
        for k in live:                       # EXACT, not approx
            assert served[k] == live[k], (family, k)

    def test_short_series_yield_no_row(self, spark):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.models.registry import (
            smoothing_model_table,
        )
        df = spark.createDataFrame([(1, 0, 1.0)],
                                   "user_id int, t int, value double")
        tsf = TimeSeriesFrame(df, time_col="t", series_cols=["user_id"])
        assert smoothing_model_table(tsf, ["value"],
                                     family="holt").count() == 0

    def test_unknown_family_raises(self, spark):
        from orange3_timeseries_spark.models.registry import (
            smoothing_model_table,
        )
        with pytest.raises(ValueError):
            smoothing_model_table(_tsf(spark), ["value"], family="ses")

    def test_foreign_family_in_table_fails_loudly(self, spark):
        # a model table with an unrecognized family string must raise,
        # not silently forecast nothing (no-silent-drops rule)
        from orange3_timeseries_spark.models.registry import (
            forecast_from_smoothing_table,
        )
        bad = spark.createDataFrame(
            [(1, "value", "ses", 1.0, 0.1, [], [], 1.0, 10)],
            "user_id int, var string, family string, level double, "
            "trend double, season array<double>, aux array<double>, "
            "phi double, n_obs int")
        with pytest.raises(Exception, match="unknown smoothing family"):
            forecast_from_smoothing_table(bad, steps=2).collect()
