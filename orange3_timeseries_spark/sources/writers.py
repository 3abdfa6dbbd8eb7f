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


def write_jsonl_shards(df, path: str, id_col: str, n_shards: int,
                       mode: str = "overwrite",
                       compression: Optional[str] = None):
    """Export a corpus as N deterministic JSONL shards — the standard
    training-data delivery format (one JSON object per line, sharded for
    parallel consumption).

    Shard assignment and in-shard order come from
    :func:`operators.sharding.hash_shards` (portable hash of the id), so
    a re-run over any partitioning produces byte-identical shard
    contents.  The frame is repartitioned BY the shard column and sorted
    within partitions by position before the partitioned write — each
    ``shard=N`` directory's files concatenate to the same ordered
    stream.  Returns the per-shard manifest (shard, n_docs) the loader
    checks before reading."""
    from orange3_timeseries_spark.operators.sharding import hash_shards

    assigned = hash_shards(df, id_col, n_shards)
    writer = (assigned.repartition(n_shards, F.col("shard"))
              .sortWithinPartitions("shard", "pos")
              .write.mode(mode).partitionBy("shard"))
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return (assigned.groupBy("shard")
            .agg(F.count("*").alias("n_docs")))


def write_bucketed(df, table: str, bucket_cols, n_buckets: int,
                   sort_cols=None, mode: str = "overwrite"):
    """Save as a BUCKETED parquet table (hash-bucketed by
    ``bucket_cols`` into ``n_buckets`` files per partition, optionally
    sorted within buckets) — Spark's on-disk co-location primitive.

    The 100 TB payoff: two tables bucketed the same way equi-join with
    ZERO shuffle on either side (Catalyst recognizes the child output
    partitioning satisfies the join's distribution requirement — no
    Exchange in the plan, asserted in tests/test_sources.py), and a
    sorted bucket feeds sort-merge join without a sort node.  The classic
    use here: bucket the events fact and every per-user derived table by
    ``user_id`` once, then every later per-user join/aggregation in the
    pipeline is shuffle-free.

    Bucketing requires the session catalog (``saveAsTable``) — the
    bucket metadata lives in the metastore, not the parquet files."""
    writer = df.write.mode(mode).format("parquet") \
        .bucketBy(n_buckets, *([bucket_cols] if isinstance(
            bucket_cols, str) else list(bucket_cols)))
    if sort_cols:
        writer = writer.sortBy(*([sort_cols] if isinstance(
            sort_cols, str) else list(sort_cols)))
    writer.saveAsTable(table)


def write_orc_partitioned(df, path: str,
                          partition_cols: Sequence[str] = (),
                          mode: str = "overwrite") -> None:
    """ORC sink with optional directory partitioning — the
    interoperability sink for Hive/Trino/Presto estates where ORC is
    the table format (same pruning story as the parquet sinks: a
    filter on a partition column skips whole directories, and ORC's
    stripe-level min/max stats prune within files).  Spark's native
    ORC writer — columnar, vectorized, zero extra dependencies."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*list(partition_cols))
    w.orc(path)


def read_orc(spark, path: str):
    """Companion reader for :func:`write_orc_partitioned`."""
    return spark.read.orc(path)
