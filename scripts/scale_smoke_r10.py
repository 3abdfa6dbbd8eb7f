#!/usr/bin/env python
"""Round-10 scaling smoke: the BM25 PERSISTED-INDEX serve path
(operators/retrieval.py: bm25_build_index / bm25_topk_from_index).

Decade 500k -> 5M docs (40-token docs over a ~100k vocabulary, 200
five-token keyword queries).  Measures, at each size:

- build+write (the one-time index cost — expect ~linear: one explode +
  one map-side-combining tf aggregation),
- serve from the LOADED index (the headline: no corpus rescan, parquet
  bucket pruning, broadcast token prune — work is bounded by the
  matching postings, a ~constant fraction of the corpus),
- live bm25_topk on the raw corpus at the same size (what every call
  paid before the registry existed).

Prints seconds + the log10 exponent per leg.
"""
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark("scale_smoke_r10", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions":
                              str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()

VOCAB = 100_000


def make_docs(n):
    """40-token docs over a bounded vocabulary so keyword queries hit a
    corpus-proportional posting set (the realistic retrieval regime)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     (F.pmod(F.xxhash64(F.col("id") * 40 + k),
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


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run(n):
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk,
        bm25_topk_from_index,
        read_bm25_index,
        write_bm25_index,
    )

    docs = make_docs(n)
    qs = make_queries()
    path = os.path.join(tempfile.gettempdir(), f"bm25_smoke_{n}")

    t_build = timed(lambda: write_bm25_index(
        bm25_build_index(docs), path))
    idx = read_bm25_index(spark, path)
    serve = lambda: (bm25_topk_from_index(idx, qs, top_k=10)  # noqa: E731
                     .write.format("noop").mode("overwrite").save())
    live = lambda: (bm25_topk(docs, qs, top_k=10)  # noqa: E731
                    .write.format("noop").mode("overwrite").save())
    # SYMMETRIC warm/measure: both legs run once unmeasured (file-index
    # listing, codegen, broadcast warm-up) and are timed on the second
    # run — a warm-serve-vs-cold-live comparison would overstate the
    # registry's advantage
    serve()
    t_serve = timed(serve)
    live()
    t_live = timed(live)
    shutil.rmtree(path, ignore_errors=True)
    return t_build, t_serve, t_live


if __name__ == "__main__":
    # one size per invocation (the 5M build leg alone runs minutes):
    #   python scripts/scale_smoke_r10.py 500000
    #   python scripts/scale_smoke_r10.py 5000000
    # then compute exponents across the printed rows
    sizes = ([int(a) for a in sys.argv[1:]]
             or [500_000, 5_000_000])
    rows = {n: run(n) for n in sizes}
    for n, (tb, ts, tl) in rows.items():
        print(f"n={n:>9,}  build+write={tb:7.1f}s  serve={ts:7.1f}s  "
              f"live={tl:7.1f}s")
    if len(sizes) > 1:
        span = math.log10(sizes[-1] / sizes[0])
        for i, name in enumerate(["build", "serve", "live"]):
            e = (math.log10(rows[sizes[-1]][i] / rows[sizes[0]][i])
                 / span)
            print(f"exponent[{name}] = {e:.2f}")
