"""As-of (nearest-event) join — the canonical time-series join the
reference has no equivalent for (its only column-glue is positional
hstack, ``timeseries.py`` / SURVEY §2.9) but that every event-stream
pipeline needs: "attach the most recent right-side row at or before each
left timestamp, per key".

Spark-first plan — **union + running carry-forward, ONE shuffle**:

1. project both sides to their needed columns, tag ``__src__`` (right=0,
   left=1) and union them — no join node at all;
2. one window partitioned by the ``by`` keys, ordered by
   ``(time, __src__)``, carries ``last(col, ignorenulls=True)`` for every
   right-side payload column over ``UNBOUNDED PRECEDING .. CURRENT ROW``
   (a running frame — evaluated incrementally, no full-partition buffer);
3. keep only left rows; optionally null the carried values out where the
   carried right timestamp is farther back than ``tolerance``.

Why not a range join: ``left JOIN right ON l.key = r.key AND r.t <=
l.t`` explodes to Σ|left_k|·|right_k| rows per key before the per-row
max — quadratic in key density.  The union form shuffles each input row
exactly once and never materializes a candidate set, so it survives keys
with millions of events.  Equal timestamps are inclusive (a right row AT
the left timestamp matches — ``__src__`` orders right before left),
matching DuckDB/pandas ``merge_asof`` backward semantics, which is what
makes the operator value-hash oracle-checkable with a native DuckDB
``ASOF JOIN``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..timeutil import ts_seconds

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, time_col: str,
              by: Sequence[str] = (), value_cols: Sequence[str] = None,
              right_time_col: Optional[str] = None,
              direction: str = "backward",
              tolerance_seconds: Optional[float] = None,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``left`` row gains ``prefix + c`` for each
    right ``value_cols`` entry, holding the value from the temporally
    nearest right row at-or-before (``backward``) / at-or-after
    (``forward``) its ``time_col``, matched within the ``by`` keys.
    ``prefix + right_time_col`` carries the matched right timestamp
    (NULL when nothing matches, or the match is outside
    ``tolerance_seconds``)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rt = right_time_col or time_col
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in by and c != rt]
    value_cols = list(value_cols)

    carried = [prefix + rt] + [prefix + c for c in value_cols]
    l_tagged = left.select(
        "*", F.lit(1).alias("__src__"),
        F.lit(None).cast(right.schema[rt].dataType).alias(carried[0]),
        *[F.lit(None).cast(right.schema[c].dataType).alias(prefix + c)
          for c in value_cols])
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != time_col],
        *by,
        F.col(rt).alias(time_col) if rt != time_col else F.col(time_col),
        F.lit(0).alias("__src__"),
        F.col(rt).alias(carried[0]),
        *[F.col(c).alias(prefix + c) for c in value_cols],
    ).select(*l_tagged.columns)

    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col(time_col).asc(), F.col("__src__").asc()] \
        if direction == "backward" \
        else [F.col(time_col).desc(), F.col("__src__").asc()]
    w = Window.partitionBy(*by).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = unioned.select(
        *[c for c in unioned.columns if c not in carried],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c)
          for c in carried])
    out = out.where(F.col("__src__") == 1).drop("__src__")
    if tolerance_seconds is not None:
        gap = F.abs(ts_seconds(out, time_col) - ts_seconds(out, carried[0]))
        keep = gap <= F.lit(float(tolerance_seconds))
        out = out.select(
            *[c for c in out.columns if c not in carried],
            *[F.when(keep, F.col(c)).alias(c) for c in carried])
    return out
