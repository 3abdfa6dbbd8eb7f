#!/usr/bin/env python
"""Time a single driver-contract query N times at a given SF.

Usage: python scripts/time_one.py QUERY [SF_DIR] [REPS]
Mirrors bench.py's hygiene (clearCache + gc before each rep) so numbers
are comparable with BENCH_r*.json entries.
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import __spark_entry__ as entrymod
    from orange3_timeseries_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("time_one", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    from pyspark.sql import functions as F
    spark.range(1000).withColumn("g", F.col("id") % 8) \
        .groupBy("g").applyInPandas(lambda p: p, schema="id long, g long") \
        .write.format("noop").mode("overwrite").save()
    fn = entrymod.queries()[qname]
    for i in range(reps):
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"{qname} rep{i}: {time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
