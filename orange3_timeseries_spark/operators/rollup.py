"""Multi-resolution calendar rollup — the continuous-aggregate /
hypertable-rollup analog: aggregate a series at several calendar
granularities (hour / day / month / ...) in ONE pass via native grouping
sets, instead of re-scanning the fact table once per resolution.

Spark-first plan: the truncated bucket columns are plain projections, and
``DataFrame.groupingSets`` plans a single Expand + one hash aggregate —
one scan, one shuffle, map-side partial aggregation per grouping set.  At
100 TB this is N-resolutions-for-the-price-of-one; the Expand multiplies
rows by the number of levels BEFORE the partial agg, which combines them
down to (level x bucket) cardinality immediately, so the shuffle moves
aggregate rows only.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame

__all__ = ["calendar_rollup"]

#: supported date_trunc levels, finest→coarsest
LEVELS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def calendar_rollup(tsf: TimeSeriesFrame, specs: Sequence[Tuple[str, str]],
                    levels: Sequence[str] = ("hour", "day", "month"),
                    series_cols: Sequence[str] = None) -> DataFrame:
    """One output row per (series..., level, bucket): ``level`` names the
    granularity, ``bucket`` its truncated timestamp, plus ``n`` and one
    ``{col}_{agg}`` column per spec (agg in sum/mean/min/max).

    ``series_cols`` defaults to the frame's series columns and is part of
    EVERY grouping set (the rollup is per-series at each resolution)."""
    for lvl in levels:
        if lvl not in LEVELS:
            raise ValueError(f"unknown level {lvl!r}; choose from {LEVELS}")
    t = tsf.time_col
    if t is None:
        raise ValueError("calendar_rollup needs a time column")
    series = list(tsf.series_cols if series_cols is None else series_cols)
    df = tsf.df

    trunc_names: List[str] = []
    for lvl in levels:
        name = f"__{lvl}__"
        trunc_names.append(name)
        df = df.withColumn(name, F.date_trunc(lvl, F.col(t)))

    builders = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}
    aggs = [F.count(F.lit(1)).alias("n")]
    for col, agg in specs:
        if agg not in builders:
            raise ValueError(f"unsupported agg {agg!r}")
        aggs.append(builders[agg](F.col(col)).alias(f"{col}_{agg}"))

    gsets = [[F.col(c) for c in series + [name]] for name in trunc_names]
    flags = [F.grouping(F.col(name)).alias(f"__g{i}__")
             for i, name in enumerate(trunc_names)]
    out = df.groupingSets(gsets, *[F.col(c) for c in series + trunc_names]) \
            .agg(*flags, *aggs)

    level_expr = F.lit(None).cast("string")
    for i, lvl in enumerate(levels):
        level_expr = F.when(F.col(f"__g{i}__") == 0,
                            F.lit(lvl)).otherwise(level_expr)
    return out.select(
        *series, level_expr.alias("level"),
        F.coalesce(*[F.col(n) for n in trunc_names]).alias("bucket"),
        "n", *[f"{col}_{agg}" for col, agg in specs])
