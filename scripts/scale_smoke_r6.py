#!/usr/bin/env python
"""100x scale smoke for the round-6 tiers: stationarity tests (ADF /
KPSS / Ljung-Box), bigram-LM perplexity, IVF-PQ serving, auto-order
ARIMA, and PSI drift.

Synthesizes deterministic fixtures at two scales (10x apart by default;
--big for 100x), times each operator at both, and prints the scaling
exponent log(t_big / t_small) / log(scale) — ~1.0 = linear in rows.

Usage:: PYTHONPATH=/root/repo python scripts/scale_smoke_r6.py [--big]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s", flush=True)
    return dt


def make_events(spark, n_users, per_user=60):
    from pyspark.sql import functions as F
    return (spark.range(n_users * per_user)
            .select((F.col("id") % n_users).alias("user_id"),
                    (F.col("id") / n_users).cast("int").alias("t"),
                    (F.sin(F.col("id") / 7.0) * 10
                     + (F.col("id") % 13)).alias("v")))


def make_docs(spark, n):
    from pyspark.sql import functions as F
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"),
                     ((F.col("id") * (2 * k + 1) + 7 * k) % 500)
                     .cast("string"))
            for k in range(30)]).alias("text"))


def make_vecs(spark, n, dim=64):
    from pyspark.sql import functions as F
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.sin(F.col("id") * (k + 1) / 17.0)
                  for k in range(dim)]).alias("embedding"))


def main():
    big = "--big" in sys.argv
    scale = 100 if big else 10
    from orange3_timeseries_spark import get_spark
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.models.spark import (
        auto_arima_order_by_series,
    )
    from orange3_timeseries_spark.operators.drift import psi_drift
    from orange3_timeseries_spark.operators.lm import bigram_perplexity
    from orange3_timeseries_spark.operators.similarity import ivfpq_topk
    from orange3_timeseries_spark.operators.stattests import (
        adf_test, kpss_test, ljung_box,
    )
    from pyspark.sql import functions as F

    spark = get_spark("scale_smoke_r6", master="local[16]",
                      extra_conf={"spark.sql.shuffle.partitions": "16"})
    results = {}
    for name, small_n in [("adf", 2000), ("kpss", 2000), ("lb", 2000),
                          ("lm", 20000), ("ivfpq", 20000),
                          ("auto_arima", 500), ("psi", 100000)]:
        times = []
        for mult in (1, scale):
            n = small_n * mult
            if name in ("adf", "kpss", "lb", "auto_arima"):
                ev = make_events(spark, n).localCheckpoint()
                if name == "adf":
                    out = adf_test(ev, "t", "v", ["user_id"])
                elif name == "kpss":
                    out = kpss_test(ev, "t", "v", ["user_id"])
                elif name == "lb":
                    out = ljung_box(ev, "t", "v", ["user_id"])
                else:
                    tsf = TimeSeriesFrame(
                        ev.withColumn(
                            "ts", F.timestamp_seconds(F.col("t") * 3600)),
                        time_col="ts", series_cols=["user_id"])
                    out = auto_arima_order_by_series(tsf, "v")
            elif name == "lm":
                d = make_docs(spark, n).localCheckpoint()
                out = bigram_perplexity(d, "doc_id", "text")
            elif name == "ivfpq":
                vecs = make_vecs(spark, n).localCheckpoint()
                cents = [r.embedding for r in vecs.limit(16).collect()]
                books = [[list(c[m * 8:(m + 1) * 8]) for c in cents]
                         for m in range(8)]
                q = (vecs.where(F.col("vec_id") < 8)
                     .select(F.col("vec_id").alias("query_id"),
                             "embedding"))
                out = ivfpq_topk(vecs, q, books, centroids=cents)
            else:
                d = make_events(spark, 100, per_user=n // 100) \
                    .localCheckpoint()
                ref = d.where(F.col("t") % 2 == 0)
                cur = d.where(F.col("t") % 2 == 1)
                out = psi_drift(ref, cur, "v")
            times.append(timed(f"{name} x{mult} ({n})", out))
        exp = math.log(times[1] / times[0]) / math.log(scale)
        results[name] = exp
        print(f"{name}: exponent {exp:.2f}", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
