"""orange3_timeseries_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the capabilities of biolab/orange3-timeseries
(reference checkout at /root/reference, read-only) on Spark DataFrames:

- :class:`TimeSeriesFrame` — the typed series frame (time column designation,
  role metadata, calendar-aware spacing inference), cf. reference
  ``orangecontrib/timeseries/timeseries.py:94``.
- windowed / block / calendar-period aggregation with an 18-entry registry
  (cf. ``aggregate.py:125-183``), lag/difference operators
  (cf. ``widgets/owdifference.py:153-201``), interpolation
  (cf. ``functions.py:249-345``), spectral/correlation analytics
  (cf. ``functions.py:76-246``), seasonal decomposition
  (cf. ``functions.py:348-430``), Granger causality
  (cf. ``functions.py:433-492``), and ARIMA/VAR forecasting
  (cf. ``models.py``).
- beyond the reference: large-scale training-data pipeline operators
  (deduplication, similarity search, text analysis, multimodal columns).

Everything is declared through the DataFrame API so Catalyst plans it;
Python touches data only inside Arrow-batched pandas UDFs where the algorithm
is genuinely not expressible in Spark SQL.
"""

from orange3_timeseries_spark.session import get_spark
from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.timedelta import TimeDelta, add_time

__version__ = "0.1.0"


def __getattr__(name):
    """Scripting-tier re-exports mirroring the reference's
    ``from orangecontrib.timeseries import *`` surface (SURVEY §3.2) —
    resolved lazily so importing the package stays cheap."""
    _API = {
        # operators
        "sliding_window": "operators.moving_transform",
        "sequential_blocks": "operators.moving_transform",
        "period_aggregation": "operators.moving_transform",
        "difference": "operators.difference",
        "interpolate_timeseries": "operators.interpolate",
        "time_slice": "operators.timeslice",
        "spiralogram": "operators.spiralogram",
        # per-series analytics (DataFrame in/out)
        "acf_table": "spark_analytics",
        "pacf_table": "spark_analytics",
        "periodogram_table": "spark_analytics",
        "seasonal_decompose": "spark_analytics",
        "granger_causality": "spark_analytics",
        "granger_causality_pairs": "spark_analytics",
        "ccf_table": "spark_analytics",
        "holt_forecast_table": "spark_analytics",
        "holt_winters_table": "spark_analytics",
        "holt_damped_table": "spark_analytics",
        "theta_forecast_table": "spark_analytics",
        "baseline_forecast_table": "spark_analytics",
        # models
        "ARIMA": "models",
        "VAR": "models",
        "HoltWinters": "models.smoothing",
        "model_evaluation": "models",
        "forecast_by_series": "models",
        "evaluate_by_series": "models",
        # sources
        "read_table": "sources",
        "read_parquet": "sources",
        "read_orange_csv": "sources",
        "finance_data": "sources",
        "write_partitioned": "sources",
        "write_bucketed": "sources.writers",
        "write_warc": "sources.warc",
        "read_warc": "sources.warc",
    }
    if name in _API:
        import importlib

        mod = importlib.import_module(
            f"orange3_timeseries_spark.{_API[name]}")
        return getattr(mod, name)
    raise AttributeError(name)


__all__ = [
    "get_spark",
    "TimeSeriesFrame",
    "TimeDelta",
    "add_time",
    "__version__",
]
