"""Deterministic shard assignment for training-order materialization.

A 100 TB corpus is consumed as N shard files in a fixed pseudo-random
order; the assignment must be reproducible (re-running the pipeline gives
byte-identical shards) and balanced (no straggler shard).  Two policies:

- :func:`hash_shards` — shard by portable hash of the id, position by
  hash order within the shard.  Count-balanced in expectation, one
  shuffle, embarrassingly parallel at any scale.
- :func:`balanced_shards` — weight-aware snake (boustrophedon) placement:
  global weight-descending order, then shard ``i % 2N`` folded back on
  itself, the classic LPT-style greedy that bounds the max/min shard
  weight spread by a single document.  Needs an exact global rank, which
  :func:`_global_row_number` computes WITHOUT a single-task global window
  (the usual ``row_number() OVER (ORDER BY ...)`` scale-killer): range
  repartition on the sort key, per-partition local row numbers, plus a
  tiny per-partition count aggregate cumulated driver-free on ≤P rows and
  broadcast back.  Two scans of the (persisted) range-partitioned input,
  every stage parallel.

All hashing is the portable md5 ``phash`` so DuckDB oracles replay
assignments exactly (same rank ⇒ same shard ⇒ same manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash


def hash_shards(df: DataFrame, id_col: str, n_shards: int,
                shard_col: str = "shard",
                pos_col: str = "pos") -> DataFrame:
    """Assign ``shard = phash(id) % n_shards`` and a deterministic
    1-based position within each shard (hash order, id tie-break).

    One shuffle on the shard key; with n_shards ≥ cluster width every
    shard sorts in its own task."""
    h = phash(F.col(id_col).cast("string"))
    out = df.withColumn("__h__", h) \
            .withColumn(shard_col, (F.col("__h__") % n_shards).cast("int"))
    w = Window.partitionBy(shard_col).orderBy("__h__", id_col)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("__h__")


def _global_row_number(df: DataFrame, sort_cols,
                       out_col: str = "__rn__") -> DataFrame:
    """Exact global 1-based row_number over ``sort_cols`` with no
    single-task stage: range-partition on the sort key, local row
    numbers per partition, cumulative partition offsets broadcast back.

    The range-partitioned input is pinned with an EAGER localCheckpoint
    for the two passes: range partitioning samples its bounds, so an
    unpinned plan could sample different bounds per pass, misaligning
    offsets with contents — and unlike ``persist()`` (which can evict,
    silently recompute with fresh bounds, and whose cache entry leaks
    until someone unpersists), checkpoint blocks are released by the
    ContextCleaner as soon as the caller's references drop."""
    spark = df.sparkSession
    try:
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        width = 32
    part = (df.repartitionByRange(max(width, 1), *sort_cols)
            .withColumn("__pid__", F.spark_partition_id())
            .localCheckpoint(eager=True))
    counts = part.groupBy("__pid__").count()
    # cumulative offset over ≤ width rows — the window is tiny by
    # construction, not a data-sized global sort
    off_w = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid__",
        F.coalesce(F.sum("count").over(off_w), F.lit(0)).alias("__off__"))
    local_w = Window.partitionBy("__pid__").orderBy(*sort_cols)
    out = (part.withColumn("__lrn__", F.row_number().over(local_w))
           .join(F.broadcast(offsets), "__pid__")
           .withColumn(out_col, F.col("__off__") + F.col("__lrn__"))
           .drop("__pid__", "__lrn__", "__off__"))
    return out


def balanced_shards(df: DataFrame, id_col: str, weight_col: str,
                    n_shards: int, shard_col: str = "shard") -> DataFrame:
    """Weight-balanced snake placement: rank docs by weight descending
    (id tie-break), fold rank into ``2·n_shards`` and mirror the back
    half — heavy and light documents interleave so every shard's total
    weight lands within one document of the others."""
    ranked = _global_row_number(
        df, [F.col(weight_col).desc(), F.col(id_col).asc()])
    i = F.col("__rn__") - 1
    r = i % (2 * n_shards)
    snake = F.when(r < n_shards, r).otherwise(2 * n_shards - 1 - r)
    return ranked.withColumn(shard_col, snake.cast("int")).drop("__rn__")


def shard_manifest(assigned: DataFrame, shard_col: str,
                   weight_col: str) -> DataFrame:
    """Per-shard manifest: document count and total weight — the sanity
    artifact a training job reads before consuming shards."""
    return (assigned.groupBy(shard_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(weight_col).cast("long").alias("total_weight")))


def compaction_plan(df: DataFrame, id_col: str, size_col: str,
                    dir_cols, target_size: int,
                    bin_col: str = "bin_id") -> DataFrame:
    """Small-file compaction plan: within each partition directory
    (``dir_cols``), pack items into output bins of ~``target_size``
    bytes by the streaming cumulative-sum rule Delta/Iceberg OPTIMIZE
    use — order items size-DESCENDING (id tie-break), take a running
    byte total, and open a new bin each time the running total crosses
    a ``target_size`` boundary:

        ``bin = floor((cumsum − size) / target)``

    i.e. an item belongs to the bin its STARTING byte offset falls in.
    Size-descending order packs the big files first so the final bin —
    the only one that may be under-filled — collects the tail of small
    files, and every earlier bin overshoots ``target_size`` by at most
    one item (the classic one-pass guarantee; items larger than
    ``target_size`` get a bin of their own).

    Scale: ordering is PER DIRECTORY (a window partitioned on
    ``dir_cols``) — exactly how table compaction runs in production,
    one planner task per partition dir, no global sort, no driver
    state.  All arithmetic is BIGINT cumsum — bit-exact on any engine.

    Returns the input ids with ``(dir_cols..., bin_id, bin_offset)``
    where ``bin_offset`` is the item's starting byte offset within the
    directory's packing order (the manifest a rewrite job consumes).
    """
    dir_cols = list(dir_cols)
    w = (Window.partitionBy(*dir_cols)
         .orderBy(F.col(size_col).desc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    size = F.col(size_col).cast("bigint")
    cum = F.sum(size).over(w)
    return (df.select(*dir_cols, F.col(id_col), F.col(size_col))
            .withColumn("bin_offset", cum - size)
            .withColumn(bin_col, F.floor(F.col("bin_offset")
                                         / F.lit(int(target_size)))
                        .cast("int"))
            .drop(size_col))
