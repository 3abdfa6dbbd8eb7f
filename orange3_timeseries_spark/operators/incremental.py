"""Incremental rollup state tables: mergeable partial aggregates.

The reference recomputes every aggregation from scratch on each widget
refresh (``owmovingtransform.py`` re-runs the whole transform); at
100 TB the daily pipeline CANNOT rescan history — it maintains a
STATE TABLE of algebraic partial aggregates and folds in only the new
partition.  This module is that contract, the batch face of the
streaming tier's state stores (and the aggregate analog of the
ARIMA/VAR model registries: plain parquet state, no pickle):

- :func:`rollup_state` — reduce raw rows to per-(series, day) partial
  aggregates ``(n, sum_units, min_units, max_units)`` — every field an
  exact BIGINT, so merging is associative and bit-reproducible in any
  order and any partitioning (the property float partials lack).
- :func:`merge_states` — union + re-aggregate: state ⊕ state = state.
  New day's data merges in one skinny shuffle over the touched keys;
  history is never rescanned.
- :func:`serve_rollup` — the presentation pass: derived metrics
  (mean, range) as single divisions of the exact state.

Scale notes: the state table is day-partitioned parquet
(``write.partitionBy(day)``) so merging day D touches ONE directory;
a billion series × years of days stays a skinny integer table ~10⁴×
smaller than the facts.  Correctness note: only ALGEBRAIC aggregates
(sum/count/min/max and anything derivable from them) belong in state;
holistic ones (exact medians) need the raw rows or a mergeable sketch
(cf. ``approx_quantiles_by_type``'s histogram state).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_state", "merge_states", "serve_rollup"]


def rollup_state(df: DataFrame, time_col: str, value_col: str,
                 series_cols: Sequence[str],
                 unit_scale: int = 2) -> DataFrame:
    """Per-(series, epoch-day) partial aggregates of ``value_col`` in
    exact ``10^unit_scale`` integer units:
    ``(series..., day, n, sum_units, min_units, max_units)``."""
    series_cols = list(series_cols)
    day = F.floor(F.unix_micros(F.col(time_col).cast("timestamp"))
                  / F.lit(86400000000)).cast("bigint")
    units = F.round(F.col(value_col).cast("double")
                    * F.lit(float(10 ** unit_scale))).cast("bigint")
    return (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, day.alias("day"),
                    units.alias("__u__"))
            .groupBy(*series_cols, "day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("__u__").alias("sum_units"),
                 F.min("__u__").alias("min_units"),
                 F.max("__u__").alias("max_units")))


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state tables into one: same key space, the
    BIGINT fields combine exactly (sum/sum/min/max) — associative and
    commutative, so incremental daily merges equal a full recompute
    bit-for-bit."""
    it = iter(states)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    keys = [c for c in u.columns
            if c not in ("n", "sum_units", "min_units", "max_units")]
    return u.groupBy(*keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_units").alias("sum_units"),
        F.min("min_units").alias("min_units"),
        F.max("max_units").alias("max_units"))


def serve_rollup(state: DataFrame, unit_scale: int = 2) -> DataFrame:
    """Derived metrics from the exact state: ``(keys..., n_events,
    total, vmin, vmax, mean)`` — each a single division/scale of
    bit-identical BIGINTs, so serving from merged state hashes
    identically to a full recompute."""
    scale = float(10 ** unit_scale)
    keys = [c for c in state.columns
            if c not in ("n", "sum_units", "min_units", "max_units")]
    return state.select(
        *keys, F.col("n").alias("n_events"),
        (F.col("sum_units").cast("double") / F.lit(scale)).alias("total"),
        (F.col("min_units").cast("double") / F.lit(scale)).alias("vmin"),
        (F.col("max_units").cast("double") / F.lit(scale)).alias("vmax"),
        (F.col("sum_units").cast("double")
         / (F.col("n") * F.lit(10 ** unit_scale)).cast("double"))
        .alias("mean"))
