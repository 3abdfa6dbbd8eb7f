"""Analytics functions: metrics, spectra, autocorrelation, decomposition,
Granger causality — the scripting-API tier mirroring the reference's
``functions.py`` (NumPy cores; Spark wrappers in ``spark_analytics``)."""

from orange3_timeseries_spark.functions.metrics import (
    mae,
    mape,
    mase,
    pocid,
    r2,
    rmse,
    smape,
)
from orange3_timeseries_spark.functions.spectral import (
    periodogram,
    periodogram_nonequispaced,
)
from orange3_timeseries_spark.functions.correlation import (
    autocorrelation,
    partial_autocorrelation,
)
from orange3_timeseries_spark.functions.decomposition import (
    seasonal_decompose_arrays,
)
from orange3_timeseries_spark.functions.granger import granger_causality_arrays

__all__ = [
    "r2", "rmse", "mape", "mae", "pocid",
    "periodogram", "periodogram_nonequispaced",
    "autocorrelation", "partial_autocorrelation",
    "seasonal_decompose_arrays", "granger_causality_arrays",
]
