"""Forecast models: ARIMA and VAR with the reference's fit/predict surface
(``models.py:19-403``), implemented in pure NumPy (no statsmodels in the
runtime), plus rolling-origin model evaluation and per-series distributed
fitting."""

from orange3_timeseries_spark.models.arima import ARIMA
from orange3_timeseries_spark.models.var import VAR
from orange3_timeseries_spark.models.evaluation import model_evaluation
from orange3_timeseries_spark.models.spark import (
    evaluate_by_series,
    forecast_by_series,
    forecast_wide_table,
)

__all__ = ["ARIMA", "VAR", "model_evaluation", "forecast_by_series",
           "forecast_wide_table", "evaluate_by_series"]
