"""Feature engineering for forecasting-as-regression pipelines.

Two operators that turn an ordered series into model-ready features:

- :func:`lag_features` — the supervised matrix: per row, the previous
  ``lags`` values plus a trailing rolling mean that EXCLUDES the current
  row (no target leakage), with the current value as the label.  The
  classic "make forecasting a regression problem" transform (each row
  is a training example; any tabular learner consumes it).
- :func:`calendar_features` — per-day calendar covariates: ISO
  day-of-week / day-of-month / month / ISO week / day-of-year plus
  weekly and annual Fourier terms (sin/cos pairs) — the standard
  seasonality encoding for regression-based forecasters.

Scale: pure window / projection expressions — ``lag_features`` is one
series-key shuffle then narrow lags; ``calendar_features`` is map-only.
Determinism: lags are exact value copies; day-of-week derives from an
INTEGER day count since 1970-01-01 (a Thursday), sidestepping the
Sunday-0 vs Sunday-1 disagreement between engines' dayofweek();
trig outputs round 6 dp (ulp firewall).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lag_features", "calendar_features"]


def lag_features(df: DataFrame, value_col: str, order_col: str,
                 group_cols: Sequence[str], lags: Sequence[int] = (1, 2, 3, 4),
                 roll: int = 4,
                 tie_cols: Sequence[str] = ()) -> DataFrame:
    """Supervised lag matrix: ``lag_i`` columns for each ``i`` in
    ``lags``, a ``roll_mean_{roll}`` over the PREVIOUS ``roll`` rows
    (current row excluded — leakage-safe), and the current value as
    ``y``.  Rows without a complete feature set (the first
    ``max(lags + [roll])`` per series) are dropped, so every emitted row
    is a full training example."""
    group_cols = list(group_cols)
    lags = [int(i) for i in lags]
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    x = F.col(value_col).cast("double")
    df = df.where(F.col(value_col).isNotNull())
    out = df
    for i in lags:
        out = out.withColumn(f"lag_{i}", F.lag(x, i).over(w))
    rw = w.rowsBetween(-roll, -1)
    out = (out.withColumn(f"roll_mean_{roll}",
                          F.round(F.avg(x).over(rw), 6))
           .withColumn("__cnt__", F.count(x).over(rw)))
    cond = F.col("__cnt__") == roll
    for i in lags:
        cond = cond & F.col(f"lag_{i}").isNotNull()
    return (out.where(cond)
            .select(*group_cols, order_col, *tie_cols,
                    *[F.round(f"lag_{i}", 6).alias(f"lag_{i}")
                      for i in lags],
                    f"roll_mean_{roll}",
                    F.round(x, 6).alias("y")))


def calendar_features(days: DataFrame, day_col: str = "day") -> DataFrame:
    """Per-day calendar covariates + Fourier seasonality terms.

    ``dow_iso`` (Mon=1..Sun=7) comes from ``(days_since_epoch + 3) % 7
    + 1`` — integer arithmetic, identical on every engine (1970-01-01
    was a Thursday).  Weekly Fourier uses harmonics k=1,2 of
    ``2π·(dow_iso−1)/7``; annual uses k=1 of ``2π·(doy−1)/365.25``.
    All trig rounds 6 dp."""
    d = F.to_date(F.col(day_col))
    epoch_days = F.datediff(d, F.lit("1970-01-01"))
    # double-mod: % follows the dividend's sign in both engines, so
    # pre-1970 dates (negative epoch_days) need the +7 normalization
    dow = ((epoch_days + 3) % 7 + 7) % 7 + 1
    doy = F.dayofyear(d)
    wang = F.lit(2.0 * math.pi / 7.0) * (dow - 1).cast("double")
    aang = F.lit(2.0 * math.pi / 365.25) * (doy - 1).cast("double")
    return days.select(
        F.col(day_col),
        dow.cast("int").alias("dow_iso"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.month(d).cast("int").alias("month"),
        F.weekofyear(d).cast("int").alias("week_iso"),
        doy.cast("int").alias("doy"),
        F.round(F.sin(wang), 6).alias("sin_w1"),
        F.round(F.cos(wang), 6).alias("cos_w1"),
        F.round(F.sin(F.lit(2.0) * wang), 6).alias("sin_w2"),
        F.round(F.cos(F.lit(2.0) * wang), 6).alias("cos_w2"),
        F.round(F.sin(aang), 6).alias("sin_a1"),
        F.round(F.cos(aang), 6).alias("cos_a1"))
