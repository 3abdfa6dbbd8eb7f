"""Deterministic HyperLogLog distinct-count sketch.

Spark's ``approx_count_distinct`` is HLL++ too, but its hash/registers
are engine-internal — not replayable by an oracle and not portable across
engines.  This sketch is built on the portable md5 ``phash``
(operators/hashing.py) with pure integer register math, so DuckDB
reproduces every register and the estimate to the last ulp-class digit:

- register index = low ``p`` bits of the 60-bit hash;
- rho = trailing zeros of the remaining bits + 1 (computed exactly as
  ``bit_count((rest & -rest) - 1) + 1`` — no float log, no ulp risk);
- registers aggregate with ``max`` (map-side combinable, mergeable across
  corpora/days with a further max — the property that makes sketches the
  scale tool: a 100 TB distinct count shuffles m·partitions rows, never
  keys);
- estimate = α_m·m²/Σ2^(−M_j) with the standard small-range linear
  counting correction (E ≤ 2.5m and empty registers present →
  m·ln(m/V)).  2^-rho is computed as ``1.0/(1<<rho)`` — exact in IEEE
  double, identical in both engines.

Standard error ≈ 1.04/√m (~6.5 % at p=8, ~3.2 % at p=10).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str, p: int = 10,
                  group_cols=()) -> DataFrame:
    """Per-(group, register) max-rho rows.  At most m rows per group
    leave the partial aggregation regardless of input size."""
    m_bits = _HASH_BITS - p
    h = phash(F.col(key_col).cast("string"))
    idx = (h % F.lit(1 << p)).cast("int")
    rest = F.call_function("shiftright", h, F.lit(p))
    low = rest.bitwiseAND(-rest)
    rho = (F.when(rest == 0, F.lit(m_bits + 1))
           .otherwise(F.bit_count(low - 1) + 1)).cast("int")
    tagged = df.select(*group_cols, idx.alias("reg"), rho.alias("rho"))
    return (tagged.groupBy(*group_cols, "reg")
            .agg(F.max("rho").alias("max_rho")))


def hll_estimate(registers: DataFrame, p: int = 10,
                 group_cols=(), out_col: str = "approx_distinct") -> DataFrame:
    """Fold register rows into the HLL estimate (one row per group)."""
    m = 1 << p
    alpha = _alpha(m)
    # 1.0/(1<<rho) is an exact IEEE double — replayable bit-for-bit
    inv = 1.0 / F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.col("max_rho"))
    agg = (registers.groupBy(*group_cols)
           .agg(F.sum(inv).alias("__s__"),
                F.count("*").alias("__nz__")))
    zeros = (F.lit(m) - F.col("__nz__")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("__s__") + zeros)
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)).otherwise(raw)
    return agg.select(*group_cols,
                      F.round(corrected, 6).alias(out_col))


def approx_distinct(df: DataFrame, key_col: str, p: int = 10,
                    group_cols=(),
                    out_col: str = "approx_distinct") -> DataFrame:
    """HLL distinct estimate of ``key_col`` per group in one call."""
    regs = hll_registers(df, key_col, p=p, group_cols=group_cols)
    return hll_estimate(regs, p=p, group_cols=group_cols, out_col=out_col)


def hll_merge(*register_dfs: DataFrame, p: int = 10,
              group_cols=()) -> DataFrame:
    """Merge register sets from independent corpora (union + max) —
    sketches compose: estimate(A ∪ B) from stored registers without
    touching either corpus again."""
    it = iter(register_dfs)
    u = next(it)
    for r in it:
        u = u.unionByName(r)
    return (u.groupBy(*group_cols, "reg")
            .agg(F.max("max_rho").alias("max_rho")))


def hll_overlap(df: DataFrame, key_col: str, group_col: str,
                p: int = 10) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups by HLL
    inclusion-exclusion: ``|A∩B| ≈ est(A) + est(B) − est(A∪B)``, with
    the union estimated from the MERGED registers (max per register) —
    no second corpus pass, the defining sketch property.  One row per
    unordered group pair: ``(group_a, group_b, est_a, est_b,
    est_union, overlap_est, jaccard_est)``.

    The overlap estimate inherits ~3× the base standard error (three
    estimates subtract), so p should be ≥ 8 and small overlaps read as
    noise — the standard caveat, worth it because the alternative is a
    distinct-join per pair.  Scale: the corpus is touched ONCE
    (register build); the pair stage runs on groups² × m register rows
    — groups is a small dimension by construction (sources, days,
    shards).  Overlap clamps at 0; jaccard divides the clamped
    overlap by the union estimate."""
    # pin the register table: it feeds the per-group estimates AND both
    # sides of the pair-union stage — without the checkpoint the corpus
    # hash pass re-runs once per consumer (observed 17-Exchange plan)
    regs = hll_registers(df, key_col, p=p, group_cols=(group_col,)) \
        .localCheckpoint(eager=True)
    est = hll_estimate(regs, p=p, group_cols=(group_col,),
                       out_col="__est__")
    ga = est.select(F.col(group_col).alias("group_a"),
                    F.col("__est__").alias("est_a"))
    gb = est.select(F.col(group_col).alias("group_b"),
                    F.col("__est__").alias("est_b"))
    pairs = ga.crossJoin(gb).where(F.col("group_a") < F.col("group_b"))
    keys = pairs.select("group_a", "group_b")
    ra = regs.select(F.col(group_col).alias("group_a"),
                     "reg", "max_rho")
    rb = regs.select(F.col(group_col).alias("group_b"),
                     "reg", "max_rho")
    both = (keys.join(ra, "group_a").select("group_a", "group_b",
                                            "reg", "max_rho")
            .unionByName(
                keys.join(rb, "group_b").select("group_a", "group_b",
                                                "reg", "max_rho")))
    union_regs = (both.groupBy("group_a", "group_b", "reg")
                  .agg(F.max("max_rho").alias("max_rho")))
    eu = hll_estimate(union_regs, p=p,
                      group_cols=("group_a", "group_b"),
                      out_col="est_union")
    out = (pairs.join(eu, ["group_a", "group_b"])
           .withColumn("overlap_est",
                       F.round(F.greatest(
                           F.col("est_a") + F.col("est_b")
                           - F.col("est_union"), F.lit(0.0)), 6)))
    return out.select(
        "group_a", "group_b", "est_a", "est_b", "est_union",
        "overlap_est",
        F.round(F.col("overlap_est") / F.col("est_union"), 6)
        .alias("jaccard_est"))


def expected_error(p: int) -> float:
    """Standard error of the estimate: 1.04/sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


# ---------------------------------------------------------- count-min sketch
def cms_tables(df: DataFrame, key_col: str, width: int = 1024,
               depth: int = 3, group_cols=()) -> DataFrame:
    """Count-min sketch counters: ``depth`` portable hash rows of
    ``width`` counters each; one map-side-combinable aggregation to at
    most depth·width rows per group regardless of input size.  Counters
    only ever overestimate (hash collisions add, never subtract), with
    error ≤ e·N/width at probability 1−e^−depth — the standard
    heavy-hitter / frequency sketch at corpus scale, and mergeable by
    summing counters."""
    from orange3_timeseries_spark.operators.hashing import phash_seeded

    key = F.col(key_col).cast("string")
    pos = F.posexplode(F.array(*[
        (phash_seeded(key, i) % F.lit(width)).cast("int")
        for i in range(depth)]))
    entries = df.select(*group_cols, pos.alias("row", "pos"))
    return (entries.groupBy(*group_cols, "row", "pos")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(tables: DataFrame, probes: DataFrame, key_col: str,
                 width: int = 1024, depth: int = 3,
                 out_col: str = "cms_count") -> DataFrame:
    """Point-query the sketch for every probe key: min over the depth
    rows (missing counter → 0).  The counter table is ≤ depth·width rows
    — broadcast, so probing any number of keys is map-side."""
    from orange3_timeseries_spark.operators.hashing import phash_seeded

    key = F.col(key_col).cast("string")
    pos = F.posexplode(F.array(*[
        (phash_seeded(key, i) % F.lit(width)).cast("int")
        for i in range(depth)]))
    pe = probes.select(F.col(key_col), pos.alias("row", "pos"))
    j = pe.join(F.broadcast(tables), ["row", "pos"], "left")
    return (j.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias(out_col)))
