#!/usr/bin/env python
"""Round-10 scaling smoke: the LSH PERSISTED-INDEX probe path
(operators/dedup.py: lsh_build_index / lsh_probe_index).

Decade 500k -> 5M corpus docs, FIXED 5k-doc ingest delta (2% planted
near-dups).  Measures, at each corpus size:

- build+write (the one-time index cost — one signature pass over the
  corpus, expect ~linear),
- probe the delta against the LOADED index (the headline: the delta is
  re-signed, the CORPUS is not — index-side work is a skinny
  (id, band, band_key) scan + broadcast candidate join, so probe cost
  should grow far slower than corpus size),
- live minhash_lsh_pairs_between(delta, corpus) at the same size (what
  every ingest paid before the registry existed: a full corpus
  re-signature per batch).

Timing is SYMMETRIC (each measured leg runs once unmeasured, then
timed).  Prints seconds + the log10 exponent per leg.  Usage:
``python scripts/scale_smoke_r10b.py [n_docs]`` — one size per
invocation, solo box.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orange3_timeseries_spark import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
spark = get_spark("scale_smoke_r10b", master=f"local[{CPUS}]",
                  extra_conf={"spark.sql.shuffle.partitions":
                              str(2 * int(CPUS))})
spark.range(10000).groupBy((F.col("id") % 8).alias("g")).count() \
    .write.format("noop").mode("overwrite").save()

VOCAB = 50_000
DELTA = 5_000


def _text(idc, ntok=30, salt=0):
    # salt enters as a SEPARATE hash argument — an additive offset
    # would alias into the shared input stream (id*30+k+31337 lands on
    # doc id+1044's tokens 17..29 and id+1045's 0..16), making every
    # "unrelated" delta doc an accidental above-threshold near-dup of
    # two corpus docs
    return F.concat_ws(" ", *[
        F.concat(F.lit("w"),
                 (F.pmod(F.xxhash64(F.lit(salt), idc * ntok + k),
                         F.lit(VOCAB))).cast("string"))
        for k in range(ntok)])


def make_corpus(n):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 _text(F.col("id")).alias("text"))


def make_delta(n_corpus):
    """5k new docs, ids above the corpus; every 50th is a near-dup of a
    corpus doc (same token stream, one salted token appended)."""
    base = spark.range(DELTA).select(
        (F.col("id") + 2 * n_corpus).alias("doc_id"), F.col("id"))
    dup = (F.col("id") % 50 == 0) & (F.col("id") < n_corpus)
    text = F.when(
        dup, F.concat(_text(F.col("id") * 97 % F.lit(n_corpus)),
                      F.lit(" wextra"))).otherwise(
        _text(F.col("id"), salt=31_337))
    return base.select("doc_id", text.alias("text"))


def timed(fn):
    fn()  # symmetric warm-up: codegen, file listing, broadcasts
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run(n):
    from orange3_timeseries_spark.operators.dedup import (
        lsh_build_index,
        lsh_probe_index,
        minhash_lsh_pairs_between,
        read_lsh_index,
        write_lsh_index,
    )

    corpus = make_corpus(n)
    delta = make_delta(n)
    path = os.path.join(tempfile.gettempdir(), f"lsh_smoke_{n}")

    def build():
        shutil.rmtree(path, ignore_errors=True)
        write_lsh_index(lsh_build_index(corpus), path)

    t_build = timed(build)
    loaded = read_lsh_index(spark, path)

    def probe():
        lsh_probe_index(loaded, delta, threshold=0.2) \
            .write.format("noop").mode("overwrite").save()

    def live():
        minhash_lsh_pairs_between(delta, corpus, "text", "doc_id",
                                  threshold=0.2) \
            .write.format("noop").mode("overwrite").save()

    t_probe = timed(probe)
    t_live = timed(live)
    n_pairs = lsh_probe_index(loaded, delta, threshold=0.2).count()
    print(f"n={n}: build+write={t_build:.1f}s probe={t_probe:.1f}s "
          f"live={t_live:.1f}s pairs={n_pairs}", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
