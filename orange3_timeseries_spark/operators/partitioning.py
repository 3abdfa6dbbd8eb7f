"""Partition-width guards for CPU-bound corpus operators.

Spark's scan parallelism is byte-driven (``spark.sql.files.maxPartitionBytes``
over splittable row groups).  That heuristic is wrong twice for the
text/dedup tier, where the per-row cost is CPU (tokenize, shingle, k min-
hashes, per-bit votes), not bytes:

1. a SMALL corpus file is one unsplittable row group, so the whole scan —
   and every codegen stage fused onto it — runs as ONE task no matter how
   many cores the session has;
2. AQE's size-based shuffle coalescing re-merges post-shuffle stages whose
   byte footprint is tiny but whose per-row cost is large (same hazard
   :func:`spark_analytics._pin_parallelism` pins against for the packed
   per-series stages).

:func:`widen_partitions` fixes (1) with a guarded round-robin repartition:
a no-op whenever the plan already has at least the session's default
parallelism (any real multi-file / multi-row-group table at scale — the
shuffle is never paid on a 1000-executor cluster), and a one-time shuffle
of the narrow input projection when the scan is too coarse to feed the
cores.  Operators call it AFTER projecting down to the columns they need,
so the widening shuffle moves (id, text), never whole rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: inputs estimated above ``defaultParallelism * _BYTES_PER_SLOT`` logical
#: bytes are assumed wide enough already (the byte-driven scan gives them
#: >= 1 task per slot); below it the widening shuffle moves < ~8 MB/core —
#: negligible against the CPU stage it feeds.
_BYTES_PER_SLOT = 8 << 20


def widen_partitions(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism * min_factor``
    partitions — only when the input is small enough that the byte-driven
    scan would under-parallelize it.

    The size probe reads the OPTIMIZED LOGICAL plan's statistics (file-size
    sum for scans) — no job, no RDD conversion; the earlier
    ``df.rdd.getNumPartitions()`` probe forced full physical planning plus
    a Python->JVM RDD round-trip, measured ~0.2-0.9 s of pure overhead per
    call site on small inputs.  On any table big enough to saturate the
    cluster the guard short-circuits and the plan is returned unchanged
    (zero added shuffle at scale); if statistics are unavailable the frame
    is likewise returned unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    try:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return df
    if est >= target * _BYTES_PER_SLOT:
        return df
    return df.repartition(target)
