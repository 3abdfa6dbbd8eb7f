#!/usr/bin/env python
"""100x scale smoke for the round-4/5 tiers: exact-substring pairs,
token-balanced snake sharding, and dHash image near-dup pairs.

Synthesizes deterministic corpora at a small and a large scale (10x
apart by default; --big for the full 500k/200k sizes), times each
operator at both, and prints the scaling exponent
log(t_big / t_small) / log(scale) — ~1.0 = linear.

Corpora live in /tmp; nothing is committed.  Usage::

    PYTHONPATH=/root/repo python scripts/scale_smoke_r5.py [--big]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_docs(spark, n, dup_rate=0.02):
    from pyspark.sql import functions as F
    # token k of doc i mixes the FULL id through a 2^31 modulus — texts
    # are unique per doc (the first corpus draft used % 9973, which made
    # whole documents repeat every 9973 ids: ~50-doc true-dup clusters
    # whose 1225 pairs each dominated the pair count quadratically —
    # inherent OUTPUT growth, not plan cost; see PLANS.md)
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{k}_"),
                     ((F.col("id") * (2 * k + 1) * 2654435761 + 97 * k)
                      % (1 << 31)).cast("string"))
            for k in range(40)]).alias("text"))
    # plant near-duplicates: dup_rate of docs copy the text of id - 1
    dup = (F.col("doc_id") % int(1 / dup_rate) == 0) & (F.col("doc_id") > 0)
    planted = base.alias("a").join(
        base.select(F.col("doc_id").alias("src_id"),
                    F.col("text").alias("src_text")).alias("b"),
        F.col("a.doc_id") - 1 == F.col("b.src_id"), "left")
    return planted.select(
        "doc_id",
        F.when(dup, F.concat(F.col("src_text"), F.lit(" tail extra")))
         .otherwise(F.col("text")).alias("text"),
        (F.length(F.when(dup, F.col("src_text"))
                  .otherwise(F.col("text"))) / 4).cast("int")
        .alias("n_tokens"))


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s", flush=True)
    return dt


def main():
    big = "--big" in sys.argv
    from orange3_timeseries_spark import get_spark
    from orange3_timeseries_spark.operators import dedup as D
    from orange3_timeseries_spark.operators import sharding as SH
    from orange3_timeseries_spark.operators import multimodal as M

    cpus = os.cpu_count() or 8
    spark = get_spark("smoke_r5", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": 2 * cpus})

    n_small, n_large = (50_000, 500_000) if big else (20_000, 200_000)
    img_small, img_large = (20_000, 200_000) if big else (10_000, 100_000)
    results = {}

    for n in (n_small, n_large):
        path = f"/tmp/smoke_docs_{n}"
        if not os.path.exists(path):
            make_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        print(f"docs n={n}", flush=True)
        results[("substring", n)] = timed(
            "substring_pairs",
            D.substring_pairs(docs, "text", "doc_id", gram_len=24,
                              min_len=48))
        results[("balanced_shards", n)] = timed(
            "balanced_shards",
            SH.balanced_shards(docs, "doc_id", "n_tokens", 64))

    from pyspark.sql import functions as F
    for n in (img_small, img_large):
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 211).cast("long").alias("n_chars"))
        imgs = M.synthesize_image_column(base, "doc_id", "n_chars")
        print(f"images n={n}", flush=True)
        results[("image_neardup", n)] = timed(
            "image_neardup_pairs",
            M.image_neardup_pairs(imgs, "image", "doc_id", max_hamming=3))

    for op, (a, b) in (("substring", (n_small, n_large)),
                       ("balanced_shards", (n_small, n_large)),
                       ("image_neardup", (img_small, img_large))):
        ta, tb = results[(op, a)], results[(op, b)]
        exp = math.log(tb / ta) / math.log(b / a)
        print(f"{op}: {a}->{b} docs, {ta:.1f}s -> {tb:.1f}s, "
              f"exponent {exp:.2f}", flush=True)


if __name__ == "__main__":
    main()
