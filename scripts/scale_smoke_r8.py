#!/usr/bin/env python
"""r8 scaling smoke: deterministic synthetic data at a 10x step for the
round's operators (N-step window funnel, JL GEMM engine, smoothing
model registry fit+serve, sampled k-center, matrix-profile sentinel
path).  Prints seconds at each size plus the log10 scaling exponent
(1.0 = linear)."""
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("scale_smoke_r8", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions": CPUS})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()


def timed(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def events(n, users):
    # pmod: xxhash64 is SIGNED — a plain % sends half the ids to
    # negative remainders and the otherwise() bucket
    h5 = F.pmod(F.xxhash64("id"), F.lit(5))
    et = (F.when(h5 == 0, "signup").when(h5 == 1, "view")
          .when(h5 == 2, "click").when(h5 == 3, "purchase")
          .otherwise("error"))
    return spark.range(n).select(
        (F.col("id") % users).alias("user_id"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("ts"),
        ((F.pmod(F.xxhash64("id"), F.lit(100000))) / 100.0)
        .alias("value"),
        et.alias("event_type"))


def embeddings(n, d=64):
    vec = F.transform(F.sequence(F.lit(0), F.lit(d - 1)),
                      lambda j: ((F.col("id") * 73 + j * 37) % 1000)
                      / 500.0 - 1.0)
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))


def report(name, sizes, secs):
    exp = (math.log10(secs[-1] / secs[0])
           / math.log10(sizes[-1] / sizes[0]) if secs[0] > 0 else 0.0)
    pts = ", ".join(f"{n:,}: {s:.2f}s" for n, s in zip(sizes, secs))
    print(f"{name:34s} {pts}   exponent={exp:.2f}")


def smoke_funnel():
    from orange3_timeseries_spark.operators.eventstats import (
        window_funnel,
    )
    # 30 users → per-user event spacing 30 min < the 1-hour window, so
    # chains genuinely form and the anchor-forwarding evaluation (not
    # just sort/shuffle plumbing) is what scales; assert deep levels
    # actually occur so a degenerate fixture fails loudly
    from pyspark.sql import functions as FF
    sizes, secs = [1_000_000, 10_000_000], []
    for n in sizes:
        df = events(n, 30).localCheckpoint(eager=True)
        out = window_funnel(df, "ts", "event_type", ["user_id"],
                            steps=("signup", "view", "click",
                                   "purchase"))
        secs.append(timed(out))
        deep = out.where(FF.col("funnel_level") >= 3).count()
        assert deep > 0, "degenerate funnel fixture: no chains formed"
        df.unpersist()
    report("window_funnel 4-step (chains form)", sizes, secs)


def smoke_jl_gemm():
    from orange3_timeseries_spark.operators.similarity import jl_project
    sizes, secs = [100_000, 1_000_000], []
    for n in sizes:
        df = embeddings(n).localCheckpoint(eager=True)
        secs.append(timed(jl_project(df, "embedding", ["vec_id"],
                                     out_dim=8, engine="gemm")))
        df.unpersist()
    report("jl_project gemm 64->8", sizes, secs)


def smoke_smoothing_registry():
    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.models.registry import (
        forecast_from_smoothing_table,
        smoothing_model_table,
    )
    sizes, secs = [2_000, 20_000], []     # series count, 60 obs each
    for n_series in sizes:
        df = events(n_series * 60, n_series).localCheckpoint(eager=True)
        tsf = TimeSeriesFrame(df, time_col="ts",
                              series_cols=["user_id"])
        t0 = time.time()
        mt = smoothing_model_table(tsf, ["value"], family="holt")
        path = os.path.join(tempfile.gettempdir(),
                            f"smoke_holt_{os.getpid()}_{n_series}")
        mt.write.mode("overwrite").parquet(path)
        forecast_from_smoothing_table(
            spark.read.parquet(path), steps=5) \
            .write.format("noop").mode("overwrite").save()
        secs.append(time.time() - t0)
        df.unpersist()
    report("holt registry fit+write+serve", sizes, secs)


def smoke_kcenter_sampled():
    from orange3_timeseries_spark.operators.similarity import (
        kcenter_select,
    )
    sizes, secs = [50_000, 500_000], []
    for n in sizes:
        df = embeddings(n).localCheckpoint(eager=True)
        t0 = time.time()
        kcenter_select(df, "embedding", "vec_id", k=4,
                       sample=0.1).count()
        secs.append(time.time() - t0)
        df.unpersist()
    report("kcenter k=4 sample=0.1", sizes, secs)


def smoke_matrix_profile_sentinel():
    from orange3_timeseries_spark.operators.motif import matrix_profile
    # all series over the cap: the sentinel path must stay ~linear and
    # cheap (pruned scan + partial agg), never touch the O(n^2) join
    sizes, secs = [1_000_000, 10_000_000], []
    for n in sizes:
        df = events(n, 50).localCheckpoint(eager=True)   # 20k-200k/series
        secs.append(timed(matrix_profile(df, "ts", "value",
                                         ["user_id"], m=8)))
        df.unpersist()
    report("matrix_profile all-capped", sizes, secs)


if __name__ == "__main__":
    smoke_jl_gemm()
    smoke_funnel()
    smoke_smoothing_registry()
    smoke_kcenter_sampled()
    smoke_matrix_profile_sentinel()
