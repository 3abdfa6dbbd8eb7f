"""Spiralogram — two-dimensional period/discrete grouping with one aggregate.

Re-expresses ``owspiralogram.py:749-823``: angular axis ``x`` = calendar
period **or** any discrete/binned variable, radial axis ``r`` = optional
second discrete/binned variable; output = one row per non-empty (x, r) cell
with the group keys, a ``Count`` column, and one aggregated color variable
(empty cells are elided — ``:819-823`` — which ``groupBy`` gives for free).

Continuous grouping variables are first discretized
(``owspiralogram.py:360-435``); :func:`binned_key` reproduces the
equal-width threshold scheme as a native ``width_bucket`` expression with
the same ``[lo, hi)`` bucket semantics and threshold labels.

Plan: a single ``groupBy`` with map-side partial aggregation — the canonical
scalable shape for a 2-D rollup at 100 TB.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.operators.aggregate import (
    AGG_OPTIONS,
    Ctx,
    ident,
    null_norm,
    period_key_expr,
    PERIOD_OPTIONS,
)

Key = Union[str, Column]


def _key_expr(tsf: TimeSeriesFrame, key: Key, use_names: bool) -> Column:
    if isinstance(key, Column):
        return key
    if key in PERIOD_OPTIONS:
        if tsf.time_col is None:
            raise ValueError(f"period key {key!r} requires a time column")
        return period_key_expr(key, F.col(tsf.time_col), use_names)
    return F.col(key)


def binned_key(col: str, lo: float, hi: float, n_bins: int,
               labels: bool = True) -> Column:
    """Equal-width binning of a continuous grouping variable with
    ``[lo, hi)`` buckets and threshold labels like ``"a – b"``
    (cf. ``binned_var``, ``owspiralogram.py:417-435``)."""
    c = F.col(col).cast("double")
    width = (hi - lo) / n_bins
    b = F.least(F.greatest(F.floor((c - lo) / F.lit(width)), F.lit(0)),
                F.lit(n_bins - 1))
    if not labels:
        return b
    lo_edge = F.round(F.lit(lo) + b * F.lit(width), 6)
    hi_edge = F.round(F.lit(lo) + (b + 1) * F.lit(width), 6)
    return F.when(c.isNotNull(),
                  F.concat(lo_edge.cast("string"), F.lit(" – "),
                           hi_edge.cast("string")))


def spiralogram(tsf: TimeSeriesFrame, x_key: Key,
                r_key: Optional[Key] = None,
                agg_col: Optional[str] = None, agg: str = "mean",
                use_names: bool = False,
                x_name: str = "x", r_name: str = "r",
                count_name: str = "Count",
                agg_out_name: Optional[str] = None) -> TimeSeriesFrame:
    """Aggregate one color variable over a 2-D (x, r) grouping
    (``compute_data``, ``owspiralogram.py:795-823``)."""
    keys = [_key_expr(tsf, x_key, use_names).alias(x_name)]
    if r_key is not None:
        keys.append(_key_expr(tsf, r_key, use_names).alias(r_name))

    aggs = [F.count(F.lit(1)).cast("double").alias(count_name)]
    if agg_col is not None:
        desc = AGG_OPTIONS[agg]
        if not desc.has_block:
            raise ValueError(f"aggregation {agg!r} not applicable to cells")
        out = agg_out_name or f"{agg_col} ({agg})"
        aggs.append(desc.builder(null_norm(F.col(agg_col)), ident, Ctx())
                    .alias(out))

    df = (tsf.df.groupBy(*tsf.series_cols, *keys).agg(*aggs)
          .orderBy(*tsf.series_cols, x_name,
                   *([r_name] if r_key is not None else [])))
    return TimeSeriesFrame(df, None, series_cols=tsf.series_cols)
