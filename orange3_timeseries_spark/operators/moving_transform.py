"""Moving Transform — the three windowing modes over the agg registry.

Re-expresses ``owmovingtransform.py``'s compute tier (``:375-534``) as lazy
DataFrame programs:

1. :func:`sliding_window`  — per-row window frames
   (``_compute_sliding_window``, ``owmovingtransform.py:380-444``)
2. :func:`sequential_blocks` — tumbling count-based blocks
   (``_compute_sequential_blocks``, ``:446-498``)
3. :func:`period_aggregation` — calendar-period groups
   (``_compute_period_aggregation``, ``:500-534``)

Scale notes: sliding and block modes are a single window pass per series —
one shuffle on ``series_cols`` (none when the data is already partitioned by
series, e.g. bucketed storage), no joins, no driver collection.  Period mode
is one ``groupBy`` with map-side partial aggregation.  The single-series
degenerate case (no ``series_cols``) serializes through one partition, the
honest Spark equivalent of the reference's single in-memory array.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import ROW_IDX, TimeSeriesFrame
from orange3_timeseries_spark.operators.aggregate import (
    AGG_OPTIONS,
    Ctx,
    ident,
    null_norm,
    period_key_expr,
    PERIOD_OPTIONS,
)

#: row-keep policies for sliding windows (``owmovingtransform.py:399-418``)
DISCARD, KEEP_COMPLETE, KEEP_ALL = "discard", "complete", "all"
#: representative-row policies for blocks (``owmovingtransform.py:474-478``)
KEEP_FIRST, KEEP_MIDDLE, KEEP_LAST = "first", "middle", "last"

Specs = Union[Dict[str, Sequence[str]], List[Tuple[str, str]]]

_BLOCK_ID, _BLOCK_N = "__block_id__", "__block_n__"


def _normalize_specs(specs: Specs) -> List[Tuple[str, str]]:
    if isinstance(specs, dict):
        return [(col, agg) for col, aggs in specs.items() for agg in aggs]
    return list(specs)


def agg_name(col: str, agg: str) -> str:
    """Output naming contract ``"{var} ({agg})"``
    (``owmovingtransform.py:387-393``)."""
    return f"{col} ({agg})"


def _out_names(specs, names):
    names = names or {}
    return [names.get((col, agg), agg_name(col, agg)) for col, agg in specs]


def sliding_window(tsf: TimeSeriesFrame, specs: Specs, width: int,
                   keep: str = KEEP_ALL, shift: int = 1,
                   names: Optional[Dict[Tuple[str, str], str]] = None,
                   ) -> TimeSeriesFrame:
    """Sliding-window aggregation.

    ``keep``:
      - ``'all'``    — keep every source row; aggregates are null for the
        first ``width-1`` rows (NaN padding, ``owmovingtransform.py:402-404``);
        cumulative kernels switch to their full-prefix variant (``:413-414``).
      - ``'complete'`` — keep only rows with a complete window (``:399-401``).
      - ``'discard'`` — emit only the aggregate columns, complete rows only.

    ``shift`` > 1 keeps every ``shift``-th complete window
    (``_windowed``, ``aggregate.py:31-38``).

    Scale note: a frame WITHOUT series columns is one global ordered
    window — Spark necessarily moves it to a single partition (the
    ``WindowExec`` "No Partition Defined" warning).  That is the
    reference's own single-table semantic (one Timeseries = one ordered
    axis), inherently sequential on any engine; for corpus-scale work
    give the frame ``series_cols`` so every window runs per-series
    under the series-key partitioning.
    """
    specs = _normalize_specs(specs)
    had_idx = ROW_IDX in tsf.df.columns
    tsf = tsf.with_row_index()
    rn = F.col(ROW_IDX)
    frame = tsf.ordered_window().rowsBetween(-(width - 1), 0)
    cum_frame = tsf.ordered_window().rowsBetween(Window.unboundedPreceding, 0)
    ctx = Ctx(w=width, rn=rn)
    out_names = _out_names(specs, names)

    agg_cols = []
    for (col, agg), out_name in zip(specs, out_names):
        desc = AGG_OPTIONS[agg]
        c = null_norm(F.col(col))
        is_cum = desc.cumulative is not None
        use_frame = cum_frame if is_cum else frame
        expr = desc.builder(c, lambda e, _f=use_frame: e.over(_f), ctx)
        if keep == KEEP_ALL and not is_cum:
            expr = F.when(rn >= width, expr)
        agg_cols.append(expr.alias(out_name))

    df = tsf.df.select("*", *agg_cols)
    if keep in (KEEP_COMPLETE, DISCARD):
        df = df.where(rn >= width)
    if shift > 1:
        df = df.where((rn - width) % shift == 0)
    if keep == DISCARD:
        df = df.select(*tsf.series_cols, *out_names)
        return TimeSeriesFrame(df, None, series_cols=tsf.series_cols)
    if not had_idx:
        df = df.drop(ROW_IDX)
    return tsf._with_df(df)


def sequential_blocks(tsf: TimeSeriesFrame, specs: Specs, width: int,
                      keep: str = KEEP_FIRST,
                      names: Optional[Dict[Tuple[str, str], str]] = None,
                      ) -> TimeSeriesFrame:
    """Tumbling count-based blocks of ``width`` rows; the trailing partial
    block is dropped (``owmovingtransform.py:446-498``).  ``keep`` selects the
    representative source row carried alongside the aggregates (first /
    middle / last of each block), or ``'discard'`` for aggregates only.

    Kernels lacking a block variant (lin./exp. MA, cumsum, cumprod) are
    rejected, mirroring the widget's inapplicable warning (``:461-463``).

    Plan shape: aggregates are whole-partition window functions over
    ``(series, block_id)`` attached to the representative row — a single
    shuffle, no self-join.
    """
    specs = _normalize_specs(specs)
    bad = [a for _, a in specs if not AGG_OPTIONS[a].has_block]
    if bad:
        raise ValueError(f"aggregations not applicable to blocks: {sorted(set(bad))}")

    had_idx = ROW_IDX in tsf.df.columns
    tsf = tsf.with_row_index()
    rn = F.col(ROW_IDX)
    df = tsf.df.withColumn(_BLOCK_ID, F.floor((rn - 1) / width))
    bwin = Window.partitionBy(*tsf.series_cols, _BLOCK_ID)
    out_names = _out_names(specs, names)

    agg_cols = []
    for (col, agg), out_name in zip(specs, out_names):
        desc = AGG_OPTIONS[agg]
        c = null_norm(F.col(col))
        agg_cols.append(
            desc.builder(c, lambda e: e.over(bwin), Ctx()).alias(out_name))

    pos_in_block = (rn - 1) % width
    rep_pos = {KEEP_FIRST: 0, KEEP_MIDDLE: width // 2, KEEP_LAST: width - 1}

    df = df.select("*", *agg_cols,
                   F.count(F.lit(1)).over(bwin).alias(_BLOCK_N))
    df = df.where(F.col(_BLOCK_N) == width)
    if keep == DISCARD:
        df = (df.where(pos_in_block == 0)
                .select(*tsf.series_cols, *out_names))
        return TimeSeriesFrame(df, None, series_cols=tsf.series_cols)
    df = df.where(pos_in_block == rep_pos[keep]).drop(_BLOCK_ID, _BLOCK_N)
    if not had_idx:
        df = df.drop(ROW_IDX)
    return tsf._with_df(df)


def period_aggregation(tsf: TimeSeriesFrame, period: str, specs: Specs,
                       use_names: bool = False,
                       count_name: str = "Instance count",
                       names: Optional[Dict[Tuple[str, str], str]] = None,
                       ) -> TimeSeriesFrame:
    """Calendar-period aggregation: one output row per non-empty period with
    the period key, an instance count, and each block kernel
    (``owmovingtransform.py:500-534`` + ``time_blocks``,
    ``aggregate.py:226-258``).  Requires a time column (``:356-358``)."""
    specs = _normalize_specs(specs)
    if tsf.time_col is None:
        raise ValueError("period aggregation requires a time column")
    bad = [a for _, a in specs if not AGG_OPTIONS[a].has_block]
    if bad:
        raise ValueError(f"aggregations not applicable to periods: {sorted(set(bad))}")

    desc = PERIOD_OPTIONS[period]
    key = period_key_expr(period, F.col(tsf.time_col), use_names)
    agg_exprs = [F.count(F.lit(1)).cast("double").alias(count_name)]
    mode_specs = []
    for (col, agg), out_name in zip(specs, _out_names(specs, names)):
        if agg == "mode":
            # two-stage exact mode (below) — the collect_list form ships
            # every value to the reducer, pathological when period keys
            # are few (12 months over 100 TB = 12 reducers holding all
            # rows); the count-then-argmax form is partial-aggregatable
            mode_specs.append((col, out_name))
            continue
        a = AGG_OPTIONS[agg]
        agg_exprs.append(
            a.builder(null_norm(F.col(col)), ident, Ctx()).alias(out_name))

    group_cols = [*tsf.series_cols, desc.attr_name]
    df = (tsf.df
          .groupBy(*tsf.series_cols, key.alias(desc.attr_name))
          .agg(*agg_exprs))
    for col, out_name in mode_specs:
        counted = (tsf.df
                   .where(null_norm(F.col(col)).isNotNull())
                   .groupBy(*tsf.series_cols, key.alias(desc.attr_name),
                            F.col(col).alias(out_name))
                   .agg(F.count(F.lit(1)).alias("__n__")))
        w = Window.partitionBy(*group_cols).orderBy(F.col("__n__").desc(),
                                                    F.col(out_name).asc())
        modes = (counted.withColumn("__rk__", F.row_number().over(w))
                 .where(F.col("__rk__") == 1)
                 .select(*group_cols, out_name))
        df = df.join(modes, on=group_cols, how="left")
    df = df.orderBy(*group_cols)
    time_col = desc.attr_name if not desc.periodic else None
    return TimeSeriesFrame(df, time_col, series_cols=tsf.series_cols)
