#!/usr/bin/env python
"""Step-level profiler for multi-action queries (lifecycle/registry tier).

Monkeypatches every public function of the operator modules with a wall
timer, runs the named query twice (cold + warm), and prints the per-call
breakdown of the WARM run — separating operator-step cost (writes,
collects, checks inside the operators) from the final noop-sink serve.

Usage: PYTHONPATH=/root/repo python scripts/profile_steps.py QUERY [SF_DIR]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLS = []
_depth = [0]


def _wrap(mod, name, fn):
    @functools.wraps(fn)
    def timed(*a, **kw):
        _depth[0] += 1
        d = _depth[0]
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            _depth[0] -= 1
            CALLS.append((d, f"{mod}.{name}", time.perf_counter() - t0))
    return timed


def patch(module):
    import inspect
    for name, fn in list(vars(module).items()):
        if inspect.isfunction(fn) and fn.__module__ == module.__name__:
            setattr(module, name, _wrap(module.__name__.split(".")[-1],
                                        name, fn))


def main():
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from orange3_timeseries_spark.operators import (
        contamination,
        dedup,
        index_store,
        retrieval,
        sampling,
        similarity,
        text,
    )
    from orange3_timeseries_spark.operators import audit as audit_mod
    for m in (dedup, similarity, index_store, audit_mod, retrieval,
              contamination, text, sampling):
        patch(m)

    import __spark_entry__ as entrymod
    from orange3_timeseries_spark import get_spark

    spark = get_spark("profile_steps", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    from pyspark.sql import functions as F
    spark.range(1000).withColumn("g", F.col("id") % 8) \
        .groupBy("g").applyInPandas(lambda p: p, schema="id long, g long") \
        .write.format("noop").mode("overwrite").save()

    fn = entrymod.queries()[qname]
    for rep in range(2):
        CALLS.clear()
        import gc
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_serve = time.perf_counter() - t1
        total = time.perf_counter() - t0
        if rep == 0:
            print(f"[cold] total={total:.2f}s "
                  f"(steps={t_build:.2f} serve={t_serve:.2f})")
            continue
        print(f"[warm] total={total:.2f}s "
              f"(steps={t_build:.2f} serve-noop={t_serve:.2f})")
        # print top-level calls in order (depth 1); CALLS appended on exit,
        # so re-sort chronologically is lost -- print all with depth marks
        for d, name, dt in CALLS:
            if dt >= 0.05:
                print(f"  {'  '*(d-1)}{name:45s} {dt:7.3f}s")


if __name__ == "__main__":
    main()
