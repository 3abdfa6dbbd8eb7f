"""Interval (range) join — "pair each left event with every right event
within ±window seconds, per key".  The reference has no joins at all
(SURVEY §2.9); this is the other half of the nearest-event story next to
``operators.asof`` (which keeps only the single latest match).

Spark-first plan — **bucketed equi-join, never a nested-loop range join**:
a naive ``l JOIN r ON l.key = r.key AND abs(l.t - r.t) <= W`` plans as a
BroadcastNestedLoop / cartesian-per-key and dies at scale.  Instead both
sides get a time bucket ``floor(t / W)``; a right row within ±W of a left
row must land in the left row's bucket or an adjacent one, so the right
side is replicated to its three neighboring buckets (a fixed 3x fan-out,
independent of data size) and the join becomes a pure equi-join on
``(key..., bucket)`` — shuffle-hash/sort-merge joinable, AQE-skew-
splittable — followed by the exact ``|dt| <= W`` filter.  Cost:
one shuffle per side over 3|R| + |L| rows, candidates bounded by bucket
co-residency instead of key cardinality squared.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..timeutil import ts_seconds, ts_seconds_expr

__all__ = ["interval_join"]


def interval_join(left: DataFrame, right: DataFrame, time_col: str,
                  by: Sequence[str], window_seconds: float,
                  right_time_col: Optional[str] = None,
                  value_cols: Sequence[str] = None,
                  prefix: str = "r_") -> DataFrame:
    """Inner-join every left row to each right row with the same ``by``
    keys and ``|left.time - right.time| <= window_seconds`` (inclusive).
    Right payload columns come back as ``prefix + c``; ``prefix +
    right_time_col`` carries the matched right timestamp and ``dt_seconds``
    the signed left-minus-right gap."""
    w = float(window_seconds)
    if w <= 0:
        raise ValueError("window_seconds must be positive")
    by = list(by)
    rt = right_time_col or time_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != rt]
    value_cols = list(value_cols)

    lb = F.floor(ts_seconds(left, time_col) / F.lit(w))
    l_t = left.withColumn("__b__", lb)
    rb = F.floor(ts_seconds(right, rt) / F.lit(w))
    r_t = right.select(
        *by, F.col(rt).alias(prefix + rt),
        *[F.col(c).alias(prefix + c) for c in value_cols],
        F.explode(F.array(rb - 1, rb, rb + 1)).alias("__b__"))

    rt_dtype = dict(right.dtypes).get(rt, "")
    dt = (ts_seconds(left, time_col)
          - ts_seconds_expr(F.col(prefix + rt), rt_dtype))
    return (l_t.join(r_t, on=by + ["__b__"])
            .where(F.abs(dt) <= F.lit(w))
            .withColumn("dt_seconds", dt)
            .drop("__b__"))
