#!/usr/bin/env python
"""r7d scaling smoke: deterministic synthetic data at a 10x step for
the closing-tier operators (randomness triage, Page-Hinkley, GARCH
grid, DTW profiles, paragraph dedup, JL projection, rank-AUC,
incremental rollup merge).  Prints seconds at each size plus the log10
scaling exponent (1.0 = linear)."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("scale_smoke_r7d", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions": CPUS})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def events(n, users):
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
        ((F.xxhash64("id") % 100000) / 100.0).alias("value"))


def docs(n):
    sent = F.concat(F.lit("sentence number "),
                    (F.xxhash64("id") % (F.col("id") / 2 + 1))
                    .cast("string"),
                    F.lit(" with some shared boilerplate words here."))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(sent, F.lit(" "), sent, F.lit(" unique tail "),
                 F.col("id").cast("string"), F.lit(".")).alias("text"))


def embs(n, dim=64):
    v = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.xxhash64(F.col("id") * dim + i) % 10007)
                   / 10007.0).cast("float"))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 v.alias("embedding"))


def run(name, builder, sizes):
    ts = []
    for n in sizes:
        ts.append(timed(builder(n)))
    expo = math.log10(ts[1] / ts[0]) if ts[0] > 0 else float("nan")
    print(f"{name}: {ts[0]:.2f}s @ {sizes[0]:,} -> {ts[1]:.2f}s "
          f"@ {sizes[1]:,}  exponent={expo:.2f}")


from orange3_timeseries_spark.models.garch import garch_grid
from orange3_timeseries_spark.operators.classifier import rank_auc
from orange3_timeseries_spark.operators.dedup import paragraph_dedup
from orange3_timeseries_spark.operators.drift import page_hinkley
from orange3_timeseries_spark.operators.dtw import dtw_units_expr
from orange3_timeseries_spark.operators.incremental import (
    merge_states,
    rollup_state,
    serve_rollup,
)
from orange3_timeseries_spark.operators.randomness import (
    hac_mean,
    permutation_entropy,
    runs_test,
    variance_ratio,
)
from orange3_timeseries_spark.operators.similarity import jl_project

S = (100_000, 1_000_000)

run("runs_test", lambda n: runs_test(
    events(n, n // 500), "ts", "value", ["user_id"]), S)
run("variance_ratio", lambda n: variance_ratio(
    events(n, n // 500), "ts", "value", ["user_id"]), S)
run("hac_mean", lambda n: hac_mean(
    events(n, n // 500), "ts", "value", ["user_id"]), S)
run("permutation_entropy", lambda n: permutation_entropy(
    events(n, n // 500), "ts", "value", ["user_id"]), S)
run("page_hinkley", lambda n: page_hinkley(
    events(n, n // 500), "ts", "value", ["user_id"]), S)
run("garch_grid", lambda n: garch_grid(
    events(n, n // 500), "ts", "value", ["user_id"]), S)


def dtw_profiles(n):
    users = n // 500
    ev = events(n, users)
    dow = (((F.floor(F.unix_micros("ts") / F.lit(86400000000)) + 3)
            % 7) + 7) % 7
    cents = F.round(F.col("value") * 100).cast("bigint")
    up = (ev.select("user_id", dow.alias("d"), cents.alias("c"))
          .groupBy("user_id", "d")
          .agg(F.floor((F.sum("c") * 10000).cast("double")
                       / F.count(F.lit(1)).cast("double"))
               .cast("bigint").alias("su")))
    ua = (up.groupBy("user_id")
          .agg(F.transform(F.array_sort(F.collect_list(
              F.struct("d", "su"))), lambda s: s["su"]).alias("a"),
              F.count(F.lit(1)).alias("k")).where(F.col("k") == 7))
    ga = up.groupBy("d").agg(F.min("su").alias("su")) \
        .agg(F.transform(F.array_sort(F.collect_list(
            F.struct("d", "su"))), lambda s: s["su"]).alias("g"))
    return ua.crossJoin(F.broadcast(ga)).select(
        "user_id", dtw_units_expr(F.col("a"), F.col("g"), 7)
        .alias("dtw"))


run("dtw_dow_profiles", dtw_profiles, S)
run("paragraph_dedup", lambda n: paragraph_dedup(
    docs(n), "text", "doc_id"), (50_000, 500_000))
run("jl_project", lambda n: jl_project(embs(n)), (50_000, 500_000))


def auc(n):
    s = spark.range(n).select(
        (F.col("id") % 20).cast("string").alias("g"),
        (F.xxhash64("id") % 1000000).alias("su"),
        ((F.xxhash64(F.col("id") * 7) % 2) == 0).alias("y"))
    return rank_auc(s, "su", "y", ["g"])


run("rank_auc", auc, (100_000, 1_000_000))


def rollup(n):
    ev = events(n, n // 500)
    a = rollup_state(ev.where(F.col("user_id") % 2 == 0), "ts",
                     "value", ["user_id"])
    b = rollup_state(ev.where(F.col("user_id") % 2 == 1), "ts",
                     "value", ["user_id"])
    return serve_rollup(merge_states(a, b))


run("incremental_rollup", rollup, S)
print("done")
