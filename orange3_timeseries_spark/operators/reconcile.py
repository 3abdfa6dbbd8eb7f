"""Hierarchical forecast reconciliation: bottom-up vs proportional
top-down over a key hierarchy (Hyndman & Athanasopoulos, *Forecasting:
Principles and Practice* ch. 11).

The 100 TB shape: reconciling millions of bottom-level series is NOT a
per-series model problem — after one map-side-combining daily rollup,
every remaining table is (keys × horizon) or smaller, so the base
forecasts, the aggregate forecast, and the disaggregation weights are
all skinny joins.  The base forecaster here is seasonal-naive (the
standard reconciliation benchmark base): exact in integer units, so
bottom-up forecasts round-trip bit-exactly and only the top-down
proportional split performs float division.

Reference parity: the reference package forecasts each series
independently (orange3-timeseries models.py); reconciliation is the
beyond-reference tier that makes per-series forecasts COHERENT with
their aggregate — the property a revenue rollup at 1000 executors is
actually consumed for.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_forecasts(df: DataFrame, time_col: str, key_col: str,
                        value_col: str, *, horizon: int = 7,
                        season: int = 7, share_window: int = 28,
                        value_dp: int = 2) -> DataFrame:
    """Seasonal-naive base forecasts per key, reconciled two ways.

    Returns one row per (key, h) for h = 1..horizon:

    - ``bu_fc`` — the bottom-up base forecast: the key's own daily
      total from one season back (``day = max_day + h - season``),
      0 when the key had no rows that day.  Exact: integer units
      (``round(value * 10^value_dp)`` summed as BIGINT) divided by the
      unit scale once.
    - ``td_fc`` — the proportional top-down forecast: the AGGREGATE
      seasonal-naive forecast for day ``max_day + h`` split by the
      key's share of total units over the trailing ``share_window``
      days — ``(total_sn_units * key_window_units) / window_total``
      as an integer-domain product with ONE float division (+ the unit
      rescale), so engine and oracle share the association exactly.
      NULL when the window total is 0.  int64 budget:
      ``|total_sn_units| * |key_window_units| < 2^63`` — daily-total ×
      28-day-key-total in units, documented headroom ~1e18; beyond it,
      pre-scale ``value_dp`` down.

    Bottom-up sums are coherent with the aggregate by construction
    (Σ_key bu_fc(h) = total seasonal-naive), so the pair exposes
    exactly the disagreement reconciliation methods trade off.

    Plan: ONE corpus-sized map-side-combining rollup to (key, day);
    everything after is keys×horizon-sized — the max-day anchor and
    window total are one-row broadcast cross joins, the share and
    base-forecast joins are skinny equi-joins on (key) / (key, h).
    """
    if horizon > season:
        raise ValueError(f"horizon ({horizon}) must be <= season "
                         f"({season}): seasonal-naive has no source "
                         "day beyond one season back")
    scale = 10 ** value_dp
    day = F.date_trunc("day", F.col(time_col))
    daily = (df.where(F.col(value_col).isNotNull())
             .groupBy(F.col(key_col), day.alias("__day__"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * scale).cast("long")).alias("__u__")))
    # the rollup feeds SIX consumers (anchor, grid, base forecasts,
    # aggregate, share numerator/denominator); without pinning, each
    # branch re-scans the corpus and re-runs the rollup (column pruning
    # defeats ReusedExchange).  It is keys × days — skinny — so a
    # localCheckpoint turns 6 corpus scans into 1 (house pattern, cf.
    # operators/drift.py:54).
    daily = daily.localCheckpoint()
    mx = daily.agg(F.max("__day__").alias("__mx__"))
    d = daily.join(F.broadcast(mx))
    hs = F.explode(F.array(*[F.lit(h) for h in range(1, horizon + 1)]))
    grid = (daily.select(key_col).distinct()
            .select(key_col, hs.alias("h")))
    bu = (d.where(F.col("__day__")
                  > F.col("__mx__") - F.expr(f"INTERVAL {season} DAYS"))
          .select(key_col,
                  (F.datediff(F.col("__day__"), F.col("__mx__"))
                   + F.lit(season)).cast("int").alias("h"),
                  F.col("__u__")))
    tot = bu.groupBy("h").agg(F.sum("__u__").cast("long").alias("__t__"))
    win = (d.where(F.col("__day__") > F.col("__mx__")
                   - F.expr(f"INTERVAL {share_window} DAYS")))
    w = win.groupBy(key_col).agg(F.sum("__u__").cast("long")
                                 .alias("__w__"))
    tw = win.agg(F.sum("__u__").cast("long").alias("__tw__"))
    out = (grid
           .join(bu.withColumnRenamed("__u__", "__bu__"),
                 [key_col, "h"], "left")
           .join(F.broadcast(tot), "h", "left")
           .join(w, key_col, "left")
           .join(F.broadcast(tw)))
    return out.select(
        key_col, "h",
        (F.coalesce(F.col("__bu__"), F.lit(0)).cast("double")
         / F.lit(float(scale))).alias("bu_fc"),
        F.round((F.coalesce(F.col("__t__"), F.lit(0))
                 * F.coalesce(F.col("__w__"), F.lit(0))).cast("double")
                / F.nullif(F.col("__tw__"), F.lit(0))
                / F.lit(float(scale)), 6).alias("td_fc"))
