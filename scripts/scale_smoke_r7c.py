#!/usr/bin/env python
"""r7c scaling smoke: deterministic synthetic data at a 10x step for
the continuation operators (matrix profile, k-center, histogram
quantiles, Hilbert key, compaction planner, burstiness/benford,
ensemble forecast).  Prints seconds at each size plus the log10
scaling exponent (1.0 = linear)."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("scale_smoke_r7c", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions": CPUS})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def events(n, users):
    # integer "timestamps": every ordered-window operator only needs a
    # sortable order column; timestamp-typed variants go through the
    # same window machinery
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.col("id").alias("ts"),
        ((F.xxhash64("id") % 1000) / 100.0).alias("value"),
        (F.col("id") % 5).cast("string").alias("event_type"))


def ts_events(n, users):
    # true timestamps for the epoch-microsecond operators
    return events(n, users).withColumn(
        "ts", F.timestamp_micros(F.col("ts") * 60_000_000))


def docs_sizes(n, dirs):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % dirs).cast("string").alias("source"),
        (F.xxhash64("id") % 4000 + 100).alias("n_chars"))


def embs(n, dim=64):
    v = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.xxhash64(F.col("id") * dim + i) % 10007)
                   / 10007.0).cast("double"))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 v.alias("embedding"))


def run(name, fn, small, large):
    ts = fn(small)
    tl = fn(large)
    exp = math.log10(tl / ts) if ts > 0 else float("nan")
    print(f"{name}: {small}: {ts:.1f}s  {large}: {tl:.1f}s  "
          f"exponent {exp:.2f}", flush=True)


from orange3_timeseries_spark.operators.backtest import ensemble_forecast
from orange3_timeseries_spark.operators.eventstats import (
    benford_digits,
    burstiness,
)
from orange3_timeseries_spark.operators.motif import matrix_profile
from orange3_timeseries_spark.operators.partitioning import hilbert_key
from orange3_timeseries_spark.operators.profile import histogram_quantiles
from orange3_timeseries_spark.operators.sharding import compaction_plan
from orange3_timeseries_spark.operators.similarity import kcenter_select

# series count scales, per-series length pinned at ~67 (the testdata
# invariant) -> users x n^2 m pairs should be LINEAR in rows
run("matrix_profile", lambda n: timed(
    matrix_profile(events(n, max(150, n // 67)), "ts", "value",
                   ["user_id"], m=8)), 100_000, 1_000_000)

def _kc_timed(n):
    # kcenter runs its K selection jobs eagerly inside the call, so
    # wall-time wraps the whole construction, not a noop write
    t0 = time.time()
    kcenter_select(embs(n), "embedding", "vec_id", k=8).collect()
    return time.time() - t0


run("kcenter_k8", _kc_timed, 50_000, 500_000)

run("histogram_quantiles", lambda n: timed(
    histogram_quantiles(events(n, 150), "value", ["event_type"],
                        bins=256)), 100_000, 1_000_000)

run("hilbert_key", lambda n: timed(
    events(n, 150).select(hilbert_key("user_id", "ts", 16)
                          .alias("h"))), 1_000_000, 10_000_000)

run("compaction_plan", lambda n: timed(
    compaction_plan(docs_sizes(n, max(20, n // 5000)), "doc_id",
                    "n_chars", ["source"], 64_000_000)),
    100_000, 1_000_000)

run("burstiness", lambda n: timed(
    burstiness(ts_events(n, max(150, n // 67)), "ts", ["user_id"])),
    100_000, 1_000_000)

run("benford", lambda n: timed(
    benford_digits(events(n, 150), "value", ["event_type"])),
    100_000, 1_000_000)

run("ensemble_forecast", lambda n: timed(
    ensemble_forecast(events(n, max(150, n // 67)), "value", "ts",
                      ["user_id"], origins=(18, 22, 26), horizon=4,
                      season=7)), 100_000, 1_000_000)
