"""Sinks. The reference has none (widgets ``send()`` tables downstream,
SURVEY §2.1) — the engine's sink is parquet, laid out for scale.

``write_partitioned`` writes a series frame partitioned by a calendar key
derived from the time column (`Days`/`Months`/`Years`), the standard lake
layout for time-series: a later ``WHERE t >= … AND t < …`` prunes whole
partitions *by directory*, before row-group stats even matter.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame

_LEVELS = {"Days": "yyyy-MM-dd", "Months": "yyyy-MM", "Years": "yyyy"}


def write_partitioned(tsf: TimeSeriesFrame, path: str, level: str = "Days",
                      partition_cols: Sequence[str] = (),
                      mode: str = "overwrite",
                      max_records_per_file: Optional[int] = None) -> None:
    """Write the frame to parquet partitioned by ``__{level}__`` (derived
    from the time column) plus any explicit ``partition_cols``.

    NEVER partition by a high-cardinality series key (a million users =
    a million directories); pass a coarse shard (e.g. ``user_id % 256``)
    as an explicit column instead if co-location matters.
    """
    if level not in _LEVELS:
        raise ValueError(f"level must be one of {sorted(_LEVELS)}")
    if tsf.time_col is None:
        raise ValueError("write_partitioned needs a time column")
    key = f"__{level.lower()}__"
    df = tsf.df.withColumn(
        key, F.date_format(F.col(tsf.time_col), _LEVELS[level]))
    writer = df.write.mode(mode).partitionBy(key, *partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
