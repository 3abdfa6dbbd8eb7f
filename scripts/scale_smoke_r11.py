#!/usr/bin/env python
"""Round-11 scaling smoke: the index APPEND/COMPACT lifecycle
(operators/index_store.py + the per-family append/compact functions).

Questions this answers with measurements:

1. **Ingest cost, append vs merge-rewrite**: folding a fixed 5k-doc
   delta into a 500k-doc BM25 index via ``bm25_append_index``
   (delta-only IO into the current generation) vs
   ``bm25_merge_index`` + ``write_bm25_index`` (delta-only COMPUTE but
   a full-corpus-state rewrite into a new generation).  At 100 TB the
   rewrite is IO-bound on the whole corpus per ingest; append should
   be roughly delta-proportional.

2. **Serve cost vs delta-file count**: after K appends every bucket
   partition holds ~K+1 files; measures the BM25 serve leg (200
   keyword queries) against the fragmented index at K = 0 / 8 / 16,
   then after ``compact_bm25_index``, with per-table parquet file
   counts reported.  Symmetric timing (each measured leg runs once
   unmeasured, timed on the second run).

Prints one human-readable block; numbers go to SCALE.md.
"""
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark("scale_smoke_r11", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions":
                              str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()

VOCAB = 100_000
N_CORPUS = 500_000
DELTA = 5_000
N_APPENDS = int(os.environ.get("SMOKE_APPENDS", "16"))


def make_docs(n, salt=0, start=0):
    """40-token docs over a bounded vocabulary (the r10 smoke recipe);
    ``salt`` enters as a separate hash ARGUMENT (the r10b lesson:
    additive salts alias into other docs' token streams)."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     (F.pmod(F.xxhash64(F.col("id") * 40 + k,
                                        F.lit(salt)),
                             F.lit(VOCAB))).cast("string"))
            for k in range(40)]).alias("text"))


def make_queries(nq=200):
    return spark.range(nq).select(
        F.col("id").alias("query_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     (F.pmod(F.xxhash64(F.col("id") * 5 + k + 777),
                             F.lit(VOCAB))).cast("string"))
            for k in range(5)]).alias("text"))


def nfiles(root, table):
    from orange3_timeseries_spark.operators.index_store import (
        resolve_index_path,
    )
    vpath = resolve_index_path(root)
    # r12: appends land as delta=<k> PARTITION dirs inside the table
    # (base at <table>/delta=0) — the recursive glob under the table
    # dir counts base + every delta file in one pass
    return len(glob.glob(os.path.join(vpath, table, "**", "*.parquet"),
                         recursive=True))


def timed(fn, reps=1):
    """Measured with the bench's hygiene: cache-clear + Python AND JVM
    GC before the timer — py4j frees JVM plan handles only when Python
    gc runs, and without the reset the garbage accumulated by the many
    append jobs inflates LATE serve legs 30-100% (observed: the
    post-compact serve read slower than the fragmented one until the
    GC was added — session-state drift, not fragmentation)."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    fn()                       # warm (codegen, file listing, broadcast)
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    print(f"pre-run load: {os.getloadavg()}")
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_append_index,
        bm25_build_index,
        bm25_merge_index,
        bm25_topk_from_index,
        compact_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )

    root = os.path.join(tempfile.gettempdir(),
                        f"smoke_r11_bm25_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    qs = make_queries().localCheckpoint()

    t0 = time.time()
    write_bm25_index(bm25_build_index(make_docs(N_CORPUS)), root)
    t_build = time.time() - t0
    print(f"build+write {N_CORPUS}: {t_build:.1f}s; files "
          f"postings={nfiles(root, 'postings')}")

    def serve():
        idx = read_bm25_index(spark, root)
        bm25_topk_from_index(idx, qs, top_k=5).write \
            .format("noop").mode("overwrite").save()

    t_serve0 = timed(serve, reps=3)
    print(f"serve K=0 appends: {t_serve0:.2f}s "
          f"(files postings={nfiles(root, 'postings')})")

    # ingest-cost comparison on the FIRST delta: append vs merge+rewrite
    d_first = make_docs(DELTA, salt=1, start=N_CORPUS)
    t0 = time.time()
    merged = bm25_merge_index(read_bm25_index(spark, root), d_first)
    write_bm25_index(merged, root)           # full-state rewrite (v=2)
    t_rewrite = time.time() - t0
    d_second = make_docs(DELTA, salt=2, start=N_CORPUS + DELTA)
    t0 = time.time()
    bm25_append_index(spark, root, d_second)
    t_append = time.time() - t0
    print(f"ingest {DELTA}-doc delta: merge+rewrite={t_rewrite:.1f}s "
          f"vs append={t_append:.1f}s "
          f"({t_rewrite / max(t_append, 1e-9):.1f}x)")

    # fragment further, measuring serve at checkpoints
    done = 1
    for stop in sorted({x for x in (8, N_APPENDS) if x <= N_APPENDS}):
        while done < stop:
            done += 1
            bm25_append_index(
                spark, root,
                make_docs(DELTA, salt=done + 1,
                          start=N_CORPUS + done * DELTA))
        t = timed(serve, reps=3)
        # stats rows = 1 (v=2 rewrite) + `stop` appends
        print(f"serve K={stop} appends: {t:.2f}s "
              f"(files postings={nfiles(root, 'postings')}, "
              f"stats rows={stop + 1})")

    t0 = time.time()
    compact_bm25_index(spark, root)
    t_compact = time.time() - t0
    t = timed(serve, reps=3)
    print(f"compact: {t_compact:.1f}s; serve post-compact: {t:.2f}s "
          f"(files postings={nfiles(root, 'postings')})")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
