#!/usr/bin/env python
"""Round-7 scaling smoke: deterministic synthetic corpora at a 10x
step for the round's new operators (semdedup, ngram_novelty, ks_drift,
cusum, rolling-origin backtest).  Prints seconds at each size plus the
log10 scaling exponent."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("scale_smoke", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions": CPUS})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def docs(n):
    # deterministic text: 40 words per doc from a 1000-word vocab keyed
    # on (doc_id * 1009 + pos) * 2654435761 mod — no accidental
    # whole-doc repeats (the r4 postmortem), realistic shingle overlap
    w = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(F.lit("w"),
                           (((F.col("id") * 1009 + i) * 2654435761)
                            % 997).cast("string")))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(w, " ").alias("text"),
        (F.col("id") % 20).cast("string").alias("source"))


def embs(n, dim=64):
    # deterministic pseudo-random embeddings via integer hashing
    v = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.xxhash64(F.col("id") * dim + i) % 10007)
                   / 10007.0).cast("double"))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 v.alias("embedding"))


def events(n, users):
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("ts"),
        F.col("id").alias("event_id"),
        ((F.xxhash64("id") % 1000) / 100.0).alias("value"),
        (F.col("id") % 5).cast("string").alias("event_type"))


def run(name, fn, small, large):
    ts = fn(small)
    tl = fn(large)
    exp = math.log10(tl / ts) if ts > 0 else float("nan")
    print(f"{name}: {small}: {ts:.1f}s  {large}: {tl:.1f}s  "
          f"exponent {exp:.2f}")


from orange3_timeseries_spark.operators.anomaly import cusum
from orange3_timeseries_spark.operators.backtest import rolling_origin_eval
from orange3_timeseries_spark.operators.dedup import ngram_novelty
from orange3_timeseries_spark.operators.drift import ks_drift
from orange3_timeseries_spark.operators.similarity import (
    semantic_dedup_flags,
    train_ivf_centroids,
)

run("ngram_novelty", lambda n: timed(
    ngram_novelty(docs(n), "text", "doc_id", n=3)), 50_000, 500_000)

def _sem(n):
    e = embs(n)
    # clusters scale with corpus (the documented 100 TB dial):
    # ~3000 vecs/cluster either way
    k = max(16, n // 3000)
    cents = train_ivf_centroids(e, "embedding", k, id_col="vec_id")
    return timed(semantic_dedup_flags(e, n_centroids=k, tau=0.9,
                                      centroids=cents))
run("semdedup_flags", _sem, 50_000, 500_000)

def _ks(n):
    ev = events(n, max(150, n // 2000))
    ref = ev.where(F.col("ts") % 2 == 0)
    cur = ev.where(F.col("ts") % 2 == 1)
    return timed(ks_drift(ref, cur, "value", ["event_type"]))
run("ks_drift", _ks, 100_000, 1_000_000)

run("cusum", lambda n: timed(
    cusum(events(n, max(150, n // 2000)), "value", "ts", ["user_id"],
          tie_cols=("event_id",))), 100_000, 1_000_000)

run("rolling_origin_eval", lambda n: timed(
    rolling_origin_eval(events(n, max(150, n // 2000)), "value", "ts",
                        ["user_id"], origins=(400, 800), horizon=4,
                        season=7)), 100_000, 1_000_000)
