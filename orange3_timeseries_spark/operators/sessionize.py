"""Gap-based sessionization — the canonical event-stream grouping the
reference (batch widget pipeline, no event semantics) has no equivalent
for, but every clickstream / training-data pipeline needs: "split each
key's event sequence into sessions wherever the inter-event gap exceeds a
threshold".

Spark-first plan — **one shuffle, two fused Window nodes**:

1. one window partitioned by the ``by`` keys ordered by
   ``(time, *order_cols)`` computes ``lag(time)``;
2. a session starts where the gap to the previous event exceeds
   ``gap_seconds`` (or there is no previous event); the running
   ``sum(is_start)`` over the SAME window spec numbers sessions 1..n per
   key.  Both Window expressions share partitioning + ordering, so
   Catalyst plans them over a single exchange + sort.

:func:`session_table` rolls the labelled rows up to one row per session
(start/end/duration/count/sum).  That groupBy keys on
``(by..., session_id)`` — a superset of the window partitioning — so the
partial (map-side) aggregation completes within each existing partition
and the final shuffle moves only one combined row per session, not per
event.  At 100 TB the cost is the one event-level sort shuffle; session
rows are orders of magnitude fewer.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..timeutil import ts_seconds

__all__ = ["sessionize", "session_table"]


def sessionize(df: DataFrame, time_col: str, by: Sequence[str],
               gap_seconds: float, session_col: str = "session_id",
               order_cols: Sequence[str] = ()) -> DataFrame:
    """Label every row with a 1-based per-key session index: a new session
    starts at each row whose gap to the key's previous event (by
    ``time_col``, ties broken by ``order_cols``) exceeds ``gap_seconds``.
    NULL times sort first and join the first session."""
    by = list(by)
    order = [F.col(time_col).asc(), *[F.col(c).asc() for c in order_cols]]
    w = Window.partitionBy(*by).orderBy(*order)
    tnum = ts_seconds(df, time_col)
    prev = F.lag(tnum).over(w)
    gap = tnum - prev
    is_start = F.when(prev.isNull() | (gap > F.lit(float(gap_seconds))),
                      F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, F.sum(is_start).over(run).cast("long"))


def session_table(df: DataFrame, time_col: str, by: Sequence[str],
                  gap_seconds: float,
                  value_col: Optional[str] = None,
                  session_col: str = "session_id",
                  order_cols: Sequence[str] = ()) -> DataFrame:
    """One row per (key..., session): start/end timestamps, duration in
    seconds, event count, and (optionally) the sum of ``value_col``."""
    by = list(by)
    s = sessionize(df, time_col, by, gap_seconds, session_col=session_col,
                   order_cols=order_cols)
    tnum = ts_seconds(df, time_col)
    aggs = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        (F.max(tnum) - F.min(tnum)).alias("duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return s.groupBy(*by, session_col).agg(*aggs)
