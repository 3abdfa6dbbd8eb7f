"""Distributed model fitting: the "grouped ML" Spark pattern (SURVEY §2.8).

The reference fits one statsmodels model on one in-memory series
(``models.py:152-190``).  At 100 TB the workload is *many* independent
series (one per user / instrument / sensor), so the natural Spark plan is
``groupBy(series).applyInPandas(fit_forecast)``: each series fits in one
Arrow batch on one executor core, and a million series parallelize across
the cluster with a single shuffle on the series key.  No driver-side loop,
no collect.

``forecast_by_series`` emits the reference's forecast-table naming
contract (``models.py:210-228``) as rows ``(series..., step, var,
forecast, ci_low, ci_high)`` — long form rather than wide columns so the
schema is fixed regardless of variable count.

``evaluate_by_series`` runs rolling-origin CV (``functions.py:495-582``)
per series and emits one metrics row per (series, model, in_sample).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.models.evaluation import model_evaluation
from orange3_timeseries_spark.spark_analytics import (
    _grouped,
    _order_col,
    _series_schema,
)


def forecast_by_series(tsf: TimeSeriesFrame, cols: Sequence[str],
                       model_factory: Callable[[], object],
                       steps: int = 10, alpha: float = 0.05) -> DataFrame:
    """Fit ``model_factory()`` per series on ``cols`` and forecast
    ``steps`` ahead with ``(1-alpha)`` CIs.

    Univariate models (ARIMA) fit per (series, var); vector models (VAR)
    fit all ``cols`` jointly per series — decided via the model's
    ``SUPPORTS_VECTOR`` flag (cf. ``models.py:26``).
    """
    order = _order_col(tsf)
    cols = list(cols)
    df, groups, _ = _grouped(tsf, keep_cols=[order, *cols])
    schema = _series_schema(groups, df, [
        T.StructField("step", T.IntegerType()),
        T.StructField("var", T.StringType()),
        T.StructField("forecast", T.DoubleType()),
        T.StructField("ci_low", T.DoubleType()),
        T.StructField("ci_high", T.DoubleType()),
    ])
    vector = bool(getattr(model_factory(), "SUPPORTS_VECTOR", False))

    def compute(keys, pdf):
        pdf = pdf.sort_values(order)
        rows = []
        try:
            if vector:
                y = pdf[cols].to_numpy(dtype=float)
                model = model_factory().fit(y, var_names=cols)
                fc, lo, hi = model.predict(steps, alpha=alpha)
                for h in range(steps):
                    for j, name in enumerate(cols):
                        rows.append((h + 1, name, float(fc[h, j]),
                                     float(lo[h, j]), float(hi[h, j])))
            else:
                for name in cols:
                    y = pdf[name].to_numpy(dtype=float)
                    model = model_factory().fit(y, var_names=[name])
                    fc, lo, hi = model.predict(steps, alpha=alpha)
                    fc, lo, hi = (np.ravel(a) for a in (fc, lo, hi))
                    for h in range(steps):
                        rows.append((h + 1, name, float(fc[h]),
                                     float(lo[h]), float(hi[h])))
        except Exception:
            pass  # short / degenerate series yield no forecast rows
        out = pd.DataFrame(rows, columns=["step", "var", "forecast",
                                          "ci_low", "ci_high"])
        for c, v in zip(groups, keys):
            out[c] = v
        return out[[f.name for f in schema.fields]]

    return df.groupBy(*groups).applyInPandas(compute, schema=schema)


def evaluate_by_series(tsf: TimeSeriesFrame, col: str,
                       model_factories: Sequence[Callable[[], object]],
                       n_folds: int = 3, forecast_steps: int = 5) -> DataFrame:
    """Rolling-origin CV per series: one row per (series, model,
    in_sample) with the reference's metric set."""
    order = _order_col(tsf)
    df, groups, _ = _grouped(tsf, keep_cols=[order, col])
    schema = _series_schema(groups, df, [
        T.StructField("model", T.StringType()),
        T.StructField("in_sample", T.BooleanType()),
        T.StructField("rmse", T.DoubleType()),
        T.StructField("mae", T.DoubleType()),
        T.StructField("mape", T.DoubleType()),
        T.StructField("pocid", T.DoubleType()),
        T.StructField("r2", T.DoubleType()),
        T.StructField("aic", T.DoubleType()),
        T.StructField("bic", T.DoubleType()),
    ])

    def compute(keys, pdf):
        y = pdf.sort_values(order)[col].to_numpy(dtype=float)
        rows = []
        try:
            table = model_evaluation(y, [f() for f in model_factories],
                                     n_folds, forecast_steps)
        except Exception:
            table = []
        for row in table[1:]:
            name = str(row[0])
            in_sample = name.endswith(" (in-sample)")
            vals = [float(v) if isinstance(v, (int, float, np.floating))
                    else float("nan") for v in row[1:8]]
            rows.append([name.replace(" (in-sample)", ""), in_sample] + vals)
        out = pd.DataFrame(rows, columns=[f.name for f in schema.fields
                                          if f.name not in groups])
        for c, v in zip(groups, keys):
            out[c] = v
        return out[[f.name for f in schema.fields]]

    return df.groupBy(*groups).applyInPandas(compute, schema=schema)
