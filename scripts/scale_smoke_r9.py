#!/usr/bin/env python
"""Round-9 scaling smoke (judge ask #5): extend the dedup-tier decade —
500k -> 5M docs at a FIXED 2% planted-duplicate rate for
substring_pairs, minhash_lsh_pairs, and semdedup_flags (flat AND
two-level assignment).  Prints seconds at each size plus the log10
scaling exponent — expect ~1.0 for the banded/bucketed dedup plans and
the two-level semdedup leg; the flat semdedup leg documents the
known-quadratic n*k*d assignment under the k ∝ n dial (~1.4)."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark("scale_smoke_r9", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions": str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()


def make_docs(n, dup_rate=0.02):
    """Unique 40-token texts (full-id mixing, no accidental repeats —
    the r4 postmortem) with dup_rate planted near-duplicates of id-1."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{k}_"),
                     ((F.col("id") * (2 * k + 1) * 2654435761 + 97 * k)
                      % (1 << 31)).cast("string"))
            for k in range(40)]).alias("text"))
    dup = (F.col("doc_id") % int(1 / dup_rate) == 0) & (F.col("doc_id") > 0)
    planted = base.alias("a").join(
        base.select(F.col("doc_id").alias("src_id"),
                    F.col("text").alias("src_text")).alias("b"),
        F.col("a.doc_id") - 1 == F.col("b.src_id"), "left")
    return planted.select(
        "doc_id",
        F.when(dup, F.concat(F.col("src_text"), F.lit(" tail extra")))
         .otherwise(F.col("text")).alias("text"))


def embs(n, dim=64):
    v = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.xxhash64(F.col("id") * dim + i) % 10007)
                   / 10007.0).cast("double"))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 v.alias("embedding"))


def timed(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def run(name, fn, small, large):
    ts = fn(small)
    tl = fn(large)
    exp = math.log10(tl / ts) if ts > 0 else float("nan")
    print(f"{name}: {small}: {ts:.1f}s  {large}: {tl:.1f}s  "
          f"exponent {exp:.2f}", flush=True)


from orange3_timeseries_spark.operators import dedup as D
from orange3_timeseries_spark.operators.similarity import (
    semantic_dedup_flags,
    train_ivf_centroids,
)


def _docs_cached(n):
    path = f"/tmp/smoke_r9_docs_{n}"
    if not os.path.exists(path):
        make_docs(n).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


run("substring_pairs", lambda n: timed(
    D.substring_pairs(_docs_cached(n), "text", "doc_id",
                      gram_len=24, min_len=48)), 500_000, 5_000_000)

run("minhash_lsh_pairs", lambda n: timed(
    D.minhash_lsh_pairs(_docs_cached(n), "text", "doc_id")),
    500_000, 5_000_000)


def _sem(n, two_level=False):
    e = embs(n)
    k = max(16, n // 3000)    # ~3000 vecs/cluster — the 100 TB dial
    cents = train_ivf_centroids(e, "embedding", k, id_col="vec_id")
    return timed(semantic_dedup_flags(e, n_centroids=k, tau=0.9,
                                      centroids=cents,
                                      two_level_assign=two_level))


# flat assignment is n*k*d — QUADRATIC under the k ∝ n dial (measured
# exponent 1.42); the two-level leg is the fix (measured 1.03) and the
# number SCALE.md quotes
run("semdedup_flags_flat", _sem, 500_000, 5_000_000)
run("semdedup_flags_two_level",
    lambda n: _sem(n, two_level=True), 500_000, 5_000_000)
