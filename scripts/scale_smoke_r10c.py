#!/usr/bin/env python
"""Round-10 scaling smoke: the PQ PERSISTED-INDEX serve path
(operators/similarity.py: pq_build_index / pq_topk_from_index).

Decade 500k -> 5M corpus vectors (64-d), FIXED 10-query batch.
Measures, at each corpus size:

- build+write (the one-time cost: the Arrow-batched mapInPandas encode
  over the corpus — expect ~linear),
- serve ADC top-5 from the LOADED codes (the headline: the scan reads
  8 ints per vector instead of 64 floats, and no re-encode runs),
- live pq_topk on the raw vectors at the same size (what every query
  batch paid before the registry existed: a full corpus re-encode).

Timing is SYMMETRIC (each measured leg runs once unmeasured, then
timed).  Usage: ``python scripts/scale_smoke_r10c.py [n_vectors]`` —
one size per invocation, solo box.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark("scale_smoke_r10c", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions":
                              str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()

D = 64


def make_vectors(n):
    """Deterministic 64-d float vectors in [-1, 1)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.pmod(F.xxhash64(F.col("id") * D + i), F.lit(20001))
              - F.lit(10000)) / F.lit(10000.0)).cast("double")
            for i in range(D)]).alias("embedding"))


def timed(fn):
    fn()  # symmetric warm-up
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run(n):
    from orange3_timeseries_spark.operators.similarity import (
        pq_build_index,
        pq_topk,
        pq_topk_from_index,
        read_pq_index,
        write_pq_index,
    )

    corpus = make_vectors(n)
    seed = corpus.where(F.col("vec_id") < 16).orderBy("vec_id").collect()
    M, ds = 8, 8
    books = [[[float(x) for x in r.embedding[m * ds:(m + 1) * ds]]
              for r in seed] for m in range(M)]
    queries = (corpus.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    path = os.path.join("/tmp", f"pq_smoke_{n}")

    def build():
        shutil.rmtree(path, ignore_errors=True)
        write_pq_index(pq_build_index(corpus, codebooks=books), path)

    t_build = timed(build)
    loaded = read_pq_index(spark, path)

    def serve():
        pq_topk_from_index(loaded, queries, k=5) \
            .write.format("noop").mode("overwrite").save()

    def live():
        pq_topk(corpus, queries, books, k=5) \
            .write.format("noop").mode("overwrite").save()

    t_serve = timed(serve)
    t_live = timed(live)
    rows = pq_topk_from_index(loaded, queries, k=5).count()
    print(f"n={n}: build+write={t_build:.1f}s serve={t_serve:.1f}s "
          f"live={t_live:.1f}s rows={rows}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
