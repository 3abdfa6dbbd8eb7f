"""Sequence packing — assign documents to token-budgeted bins for
training-batch construction ("fill each 8k-token pack with consecutive
docs"), plus the per-bin manifest.

Spark-first plan: deterministic contiguous NEXT-FIT packing.  Documents
are ordered inside each shard (by the caller's ``order_cols``, default
the portable content hash — reproducible across partitionings and
engines), a running-sum window computes each document's starting token
offset, and ``bin = floor(offset / budget)``: a document joins the bin
its running offset falls in, so bins are contiguous runs and may
overflow by at most one document (the standard streaming next-fit
contract — exact bin-capacity packing is NP-hard and order-unstable).
ONE shuffle on the shard key; the whole assignment is two window
expressions sharing one sort.  Shards are the parallelism unit at scale:
pack per (source, date, ...) shard, not globally — a global pack of a
100 TB corpus would serialize into one partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash

__all__ = ["pack_sequences", "pack_manifest"]


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, shard_cols: Sequence[str] = (),
                   order_cols: Sequence[str] = None) -> DataFrame:
    """Adds ``bin_id`` (0-based per shard) and ``bin_offset`` (token
    offset of this document inside its pack) to ``df``.  Order within a
    shard is ``order_cols`` if given, else the deterministic content
    hash of ``id_col`` (ties broken by id)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = list(shard_cols)
    if order_cols is None:
        order = [phash(F.col(id_col).cast("string")).asc(),
                 F.col(id_col).asc()]
    else:
        order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*shard).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col)) \
        .cast("long")
    return (df.withColumn("__start__", start)
              .withColumn("bin_id",
                          F.floor(F.col("__start__") / F.lit(int(budget)))
                          .cast("long"))
              .withColumn("bin_offset",
                          (F.col("__start__")
                           - F.col("bin_id") * F.lit(int(budget)))
                          .cast("long"))
              .drop("__start__"))


def pack_manifest(df: DataFrame, id_col: str, token_col: str,
                  budget: int, shard_cols: Sequence[str] = (),
                  order_cols: Sequence[str] = None) -> DataFrame:
    """One row per (shard..., bin_id): document count and total tokens —
    the pack manifest a loader consumes.  GroupBy keys extend the window
    partitioning, so the partial agg completes map-side."""
    packed = pack_sequences(df, id_col, token_col, budget,
                            shard_cols=shard_cols, order_cols=order_cols)
    return packed.groupBy(*list(shard_cols), "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("total_tokens"))
