#!/usr/bin/env python
"""Round-13 scaling smoke: the persisted-index LIFECYCLE at a 10×
corpus step (the r12 verdict's remaining scale-evidence gap — the K=64
delta-fragmentation table measured serve-vs-ingest-count; this
measures every lifecycle leg vs CORPUS size).

For each family — BM25 (500k docs), LSH (500k docs), IVF-PQ (500k
64-dim vectors) — run build+versioned-write, one FIXED-size 5k-doc
journaled append, serve, compact, serve-post-compact at N = 50k and
N = 500k, and report the 10×-step exponent per leg
(``log10(t_500k / t_50k)``; 1.0 = linear, 0.0 = corpus-independent).

The claims under test:

- build/write and compact are corpus-linear (exponent ≈ 1) — they are
  one pass + one rewrite by construction;
- a FIXED-size append is roughly corpus-INDEPENDENT (exponent ≈ 0
  aside from the disjoint-guard id semi-join, which scans committed
  ids) — the delta-proportional-ingest claim the journal exists for;
- serve cost grows sub-linearly for the pruned/bounded paths (BM25
  query-pruned postings; LSH probed buckets; IVF-PQ probed cells read
  M+4 B/vector).

Methodology (the r10/r11 lessons, baked in): check box load BEFORE
trusting numbers; cache-clear + Python AND JVM gc before every timed
leg (py4j frees JVM plan handles only on Python gc); serves run once
unmeasured, then report the median of 3 timed reps.

Prints one human-readable block; numbers go to SCALE.md (r13 section).
"""
import gc
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
spark = get_spark("scale_smoke_r13", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions":
                              str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()

VOCAB = 100_000
DELTA = 5_000
SIZES = [50_000, 500_000]
DIM = 64


def hygiene():
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()


def timed(fn, reps=1):
    """Median of ``reps`` timed runs after one unmeasured warm run
    (reps=1: no warm run — build/ingest legs mutate state)."""
    if reps > 1:
        fn()
    ts = []
    for _ in range(max(1, reps)):
        hygiene()
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def make_docs(n, salt=0, start=0):
    """40-token docs over a bounded vocabulary (the r10 smoke recipe;
    salt as a separate hash ARGUMENT — additive salts alias)."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     (F.pmod(F.xxhash64(F.col("id") * 40 + k,
                                        F.lit(salt)),
                             F.lit(VOCAB))).cast("string"))
            for k in range(40)]).alias("text"))


def make_vecs(n, salt=0, start=0):
    """Deterministic 64-dim vectors in [-1, 1): one xxhash64 per
    (row, dim), same no-alias salting rule as make_docs."""
    return spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.pmod(F.xxhash64(F.col("id") * DIM + k, F.lit(salt)),
                     F.lit(2000)).cast("double") / F.lit(1000.0))
             - F.lit(1.0))
            for k in range(DIM)]).alias("embedding"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


RESULTS = {}


def record(family, leg, n, secs):
    RESULTS.setdefault((family, leg), {})[n] = secs
    print(f"  {family:6s} {leg:24s} N={n:>7,}  {secs:8.2f}s",
          flush=True)


def run_bm25(n, root):
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_append_index,
        bm25_build_index,
        bm25_topk_from_index,
        compact_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )

    docs = make_docs(n)
    queries = spark.range(200).select(
        F.col("id").alias("query_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     (F.pmod(F.xxhash64(F.col("id") * 6 + k, F.lit(3)),
                             F.lit(VOCAB))).cast("string"))
            for k in range(6)]).alias("text"))
    record("bm25", "build+write", n,
           timed(lambda: write_bm25_index(bm25_build_index(docs),
                                          root)))
    delta = make_docs(DELTA, salt=1, start=10_000_000)
    record("bm25", "append 5k (journaled)", n,
           timed(lambda: bm25_append_index(spark, root, delta)))
    idx = read_bm25_index(spark, root)
    record("bm25", "serve 200q", n,
           timed(lambda: force(bm25_topk_from_index(idx, queries,
                                                    top_k=5)),
                 reps=3))
    record("bm25", "compact", n,
           timed(lambda: compact_bm25_index(spark, root)))
    idx2 = read_bm25_index(spark, root)
    record("bm25", "serve post-compact", n,
           timed(lambda: force(bm25_topk_from_index(idx2, queries,
                                                    top_k=5)),
                 reps=3))


def run_lsh(n, root):
    from orange3_timeseries_spark.operators.dedup import (
        compact_lsh_index,
        lsh_append_index,
        lsh_build_index,
        lsh_probe_index,
        read_lsh_index,
        write_lsh_index,
    )

    docs = make_docs(n)
    # probe batch: 2k fresh docs + 2% exact copies of indexed ones
    probe = make_docs(2_000, salt=5, start=20_000_000).unionByName(
        make_docs(40).select((F.col("doc_id") + 30_000_000)
                             .alias("doc_id"), "text"))
    record("lsh", "build+write", n,
           timed(lambda: write_lsh_index(lsh_build_index(docs), root)))
    delta = make_docs(DELTA, salt=1, start=10_000_000)
    record("lsh", "append 5k (journaled)", n,
           timed(lambda: lsh_append_index(spark, root, delta)))
    idx = read_lsh_index(spark, root)
    record("lsh", "probe 2k batch", n,
           timed(lambda: force(lsh_probe_index(idx, probe)), reps=3))
    record("lsh", "compact", n,
           timed(lambda: compact_lsh_index(spark, root)))
    idx2 = read_lsh_index(spark, root)
    record("lsh", "probe post-compact", n,
           timed(lambda: force(lsh_probe_index(idx2, probe)), reps=3))


def run_ivfpq(n, root):
    import orange3_timeseries_spark.operators.similarity as S

    vecs = make_vecs(n)
    seed = [r["embedding"] for r in
            vecs.orderBy("vec_id").limit(16).collect()]
    cents = [[float(x) for x in v] for v in seed]
    books = [[[float(x) for x in v[m * 8:(m + 1) * 8]] for v in seed]
             for m in range(8)]
    queries = make_vecs(10, salt=9, start=40_000_000) \
        .withColumnRenamed("vec_id", "query_id")
    record("ivfpq", "build+write", n,
           timed(lambda: S.write_ivfpq_index(
               S.ivfpq_build_index(vecs, cents, books), root)))
    delta = make_vecs(DELTA, salt=1, start=10_000_000)
    record("ivfpq", "append 5k (journaled)", n,
           timed(lambda: S.ivfpq_append_index(spark, root, delta)))
    idx = S.read_ivfpq_index(spark, root)
    record("ivfpq", "serve 10q nprobe=4", n,
           timed(lambda: force(S.ivfpq_topk_from_index(
               idx, queries, k=5, nprobe=4)), reps=3))
    record("ivfpq", "compact", n,
           timed(lambda: S.compact_ivfpq_index(spark, root)))
    idx2 = S.read_ivfpq_index(spark, root)
    record("ivfpq", "serve post-compact", n,
           timed(lambda: force(S.ivfpq_topk_from_index(
               idx2, queries, k=5, nprobe=4)), reps=3))


def main():
    load = os.getloadavg()[0]
    print(f"pre-run 1-min load: {load:.2f}"
          + ("  !! CONTENDED BOX — numbers untrustworthy" if load > 4
             else ""))
    base = tempfile.mkdtemp(prefix="scale_r13_")
    try:
        # warm every code path (codegen, Arrow, parquet committers,
        # the journal metadata ops) at a size too small to matter —
        # otherwise the FIRST measured size pays one-time JVM warmup
        # and every exponent biases low
        print("--- warmup (N = 10,000, unrecorded)")
        for fam, fn in [("bm25", run_bm25), ("lsh", run_lsh),
                        ("ivfpq", run_ivfpq)]:
            root = os.path.join(base, f"{fam}_warm")
            fn(10_000, root)
            shutil.rmtree(root, ignore_errors=True)
        RESULTS.clear()
        hygiene()
        for n in SIZES:
            print(f"--- N = {n:,}")
            for fam, fn in [("bm25", run_bm25), ("lsh", run_lsh),
                            ("ivfpq", run_ivfpq)]:
                root = os.path.join(base, f"{fam}_{n}")
                fn(n, root)
                shutil.rmtree(root, ignore_errors=True)
                hygiene()
        print("--- 10x-step exponents (log10 t500k/t50k; 1=linear, "
              "0=corpus-independent)")
        for (fam, leg), by_n in sorted(RESULTS.items()):
            if len(by_n) == 2:
                lo, hi = by_n[SIZES[0]], by_n[SIZES[1]]
                exp = math.log10(hi / lo)
                print(f"  {fam:6s} {leg:24s} {lo:7.2f}s -> {hi:8.2f}s"
                      f"   exponent {exp:+.2f}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
