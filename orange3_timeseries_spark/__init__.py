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

__all__ = [
    "get_spark",
    "TimeSeriesFrame",
    "TimeDelta",
    "add_time",
    "__version__",
]
