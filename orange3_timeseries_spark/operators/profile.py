"""Column profiler — one-pass table statistics (count / nulls / mean /
std / min / max / exact quartiles / distinct count) per numeric column,
the data-quality summary a pipeline runs before and after every transform.

Spark-first plan: unpivot the measures into long form ``(column, value)``
map-side (a 7-way explode — no shuffle), then

- **moments**: ``groupBy(column)`` with count / null-count / avg / stddev /
  min / max — pure codegen partial aggregates, the shuffle carries 7 rows
  per partition;
- **histogram**: ``groupBy(column, value)`` counts collapse each column to
  its distinct values [skinny shuffle, map-side combined], from which
  ``n_distinct`` is a plain count and the EXACT quartiles come from
  Spark's frequency-weighted ``percentile(value, qs, cnt)`` — each
  reducer buffers only the column's (value, cnt) histogram.

The two 7-row aggregates broadcast-join on ``column``.

Design history: profiling all columns as ONE wide agg row (struct per
column) planned ``count(DISTINCT)`` via an Expand that multiplied every
scan row by ncols+1 while dragging seven exact-percentile ArrayBuffers
through the hash aggregate — measured 52 s for 7 columns of sf0.1
lineitem vs ~3 s for this long-form plan, and the single-row agg ran on
one core.  At 100 TB the histogram plan holds as long as columns have
bounded distinct values; for truly continuous columns the reducer buffer
degrades to O(n_distinct) ≈ O(n) — flip ``exact_quantiles=False`` there
and quartiles fall back to ``approx_percentile`` inside the moments agg
(no histogram pass at all).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def _long_form(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    pairs = F.array(*[F.struct(F.lit(c).alias("column"),
                               F.col(c).cast("double").alias("value"))
                      for c in cols])
    return df.select(F.explode(pairs).alias("p")).select("p.column", "p.value")


def profile_columns(df: DataFrame, cols: Sequence[str],
                    exact_quantiles: bool = True) -> DataFrame:
    """One output row per profiled column: ``column, n, n_null, n_distinct,
    mean, std, vmin, vmax, p25, p50, p75``.  ``std`` is the sample
    (ddof=1) deviation — DuckDB/Spark ``stddev`` default."""
    base = _long_form(df, cols)
    moments = base.groupBy("column").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).cast("long")
         .alias("n_null"),
        F.avg("value").alias("mean"),
        F.stddev("value").alias("std"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        *([] if exact_quantiles else
          [F.expr("approx_percentile(value, array(0.25, 0.5, 0.75))")
           .alias("qs")]))
    if not exact_quantiles:
        quart = moments.select("column", "qs")
        moments = moments.drop("qs")
    else:
        hist = (base.where(F.col("value").isNotNull())
                .groupBy("column", "value")
                .agg(F.count(F.lit(1)).alias("cnt")))
        quart = hist.groupBy("column").agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.expr("percentile(value, array(0.25, 0.5, 0.75), cnt)")
             .alias("qs"))
    if exact_quantiles:
        out = moments.join(F.broadcast(quart), "column")
    else:
        nd = (base.where(F.col("value").isNotNull())
              .groupBy("column")
              .agg(F.count_distinct("value").alias("n_distinct")))
        out = moments.join(F.broadcast(nd), "column") \
                     .join(F.broadcast(quart), "column")
    return out.select(
        "column", "n", "n_null", "n_distinct",
        F.col("mean").cast("double").alias("mean"),
        F.col("std").cast("double").alias("std"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
        F.col("qs")[0].cast("double").alias("p25"),
        F.col("qs")[1].cast("double").alias("p50"),
        F.col("qs")[2].cast("double").alias("p75"))


def profile_grouped(df: DataFrame, value_col: str,
                    group_cols: Sequence[str]) -> DataFrame:
    """Grouped single-column profile: one row per group with ``n,
    n_null, n_distinct, mean, std, vmin, vmax, p25, p50, p75`` — the
    per-slice variant of :func:`profile_columns` (per-source corpus
    stats, per-tenant measures).  Same two-aggregation plan: moments
    grouped on the keys, exact quartiles from a frequency-weighted
    percentile over the (group, value) histogram — the histogram is
    one row per distinct value per group, so the exact path stays
    cheap whenever value cardinality is bounded."""
    group_cols = list(group_cols)
    v = F.col(value_col).cast("double")
    moments = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long")
         .alias("n_null"),
        F.avg(v).alias("mean"), F.stddev(v).alias("std"),
        F.min(v).alias("vmin"), F.max(v).alias("vmax"))
    hist = (df.where(v.isNotNull())
            .groupBy(*group_cols, v.alias("__v__"))
            .agg(F.count(F.lit(1)).alias("__c__")))
    quart = hist.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.expr("percentile(__v__, array(0.25, 0.5, 0.75), __c__)")
         .alias("__qs__"))
    # LEFT join: a group whose value column is entirely NULL has no
    # histogram rows — it must still profile (n_distinct 0, NULL
    # quartiles, the SQL-aggregate semantics), not vanish
    out = moments.join(quart, group_cols, "left")
    return out.select(
        *group_cols, "n", "n_null",
        F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long")
         .alias("n_distinct"),
        "mean", "std", "vmin", "vmax",
        F.col("__qs__")[0].alias("p25"),
        F.col("__qs__")[1].alias("p50"),
        F.col("__qs__")[2].alias("p75"))


def histogram_quantiles(df: DataFrame, value_col: str,
                        group_cols: Sequence[str],
                        bins: int = 256,
                        probs: Sequence[float] = (0.25, 0.5, 0.75,
                                                  0.9, 0.99)) -> DataFrame:
    """Mergeable-histogram approximate quantiles — the 100 TB
    alternative to exact ``percentile`` (a full sort per group) and to
    ``percentile_approx`` (whose KLL-style sketch is
    merge-order-dependent and therefore unreplayable): two aggregation
    passes, both map-combinable, with a DETERMINISTIC estimate.

    Pass 1: per-group min/max/count.  Pass 2: fixed equi-width binning
    (``floor((x−min)/width)``, clamped), integer bin counts.  The
    p-quantile interpolates uniformly inside the first bin whose
    cumulative count reaches ``p·n``:

        ``q = min + width · (bin + (p·n − cum_before)/bin_count)``

    Integer counts are bit-exact on any engine; the estimate is plain
    IEEE arithmetic over them, so the SQL replay hashes identically.
    Error is bounded by one bin width (``(max−min)/bins``) — the
    documented trade for determinism + mergeability.  Degenerate
    groups (``max == min``) emit the constant for every p.

    One row per (group..., prob): ``(group..., prob, n_values,
    quantile)``."""
    group_cols = list(group_cols)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull()).select(*group_cols, x.alias("__x__"))
    ext = base.groupBy(*group_cols).agg(
        F.min("__x__").alias("__mn__"), F.max("__x__").alias("__mx__"),
        F.count(F.lit(1)).alias("__n__"))
    width = (F.col("__mx__") - F.col("__mn__")) / F.lit(float(bins))
    binned = (base.join(F.broadcast(ext), group_cols)
              .withColumn("__b__", F.when(
                  F.col("__mx__") == F.col("__mn__"), F.lit(0))
                  .otherwise(F.least(
                      F.floor((F.col("__x__") - F.col("__mn__")) / width),
                      F.lit(bins - 1)).cast("int"))))
    counts = binned.groupBy(*group_cols, "__b__").agg(
        F.count(F.lit(1)).alias("__c__"))
    cw = (Window.partitionBy(*group_cols).orderBy("__b__")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (counts
           .withColumn("__cum__", F.sum("__c__").over(cw))
           .join(F.broadcast(ext), group_cols))
    rows = []
    for p in probs:
        t = F.lit(float(p)) * F.col("__n__").cast("double")
        hit = (F.col("__cum__").cast("double") >= t) \
            & ((F.col("__cum__") - F.col("__c__")).cast("double") < t)
        frac = (t - (F.col("__cum__") - F.col("__c__")).cast("double")) \
            / F.col("__c__").cast("double")
        q = F.when(F.col("__mx__") == F.col("__mn__"), F.col("__mn__")) \
            .otherwise(F.col("__mn__")
                       + width * (F.col("__b__").cast("double") + frac))
        rows.append(F.when(hit, F.struct(
            F.lit(float(p)).alias("prob"),
            F.round(q, 6).alias("quantile"))))
    exploded = (cum.select(*group_cols, F.col("__n__"),
                           F.explode(F.array(*rows)).alias("__e__"))
                .where(F.col("__e__").isNotNull()))
    # the hit condition cum_before < p*n <= cum holds for exactly one
    # present bin per p (cumulative ranges are disjoint), so no dedup
    # stage is needed
    return exploded.select(
        *group_cols, F.col("__e__.prob").alias("prob"),
        F.col("__n__").alias("n_values"),
        F.col("__e__.quantile").alias("quantile"))


def gini_concentration(df: DataFrame, size_col: str,
                       group_cols: Sequence[str],
                       min_n: int = 2) -> DataFrame:
    """Gini coefficient of a non-negative integer size column per
    group: ``(group..., n_items, total_size, gini)`` — the corpus-
    balance audit (0 = perfectly even, →1 = one item holds all the
    mass).  THE summary a data-mixing stage reads before weighting
    sources: a source whose token mass is one mega-document is not a
    diverse source, whatever its row count (companion to
    ``sample_temperature_mix`` and ``skew_profile``).

    Sorted-rank closed form ``G = Σ(2i − n − 1)·x_i / (n·Σx)`` over
    ascending ``x_i`` (stable under ties — equal values commute).
    All-BIGINT arithmetic: ranks and sizes are integers, the weighted
    sum stays integer-exact on any engine; one rank window + one
    groupBy on the group key.  Negative sizes are rejected rows
    (filtered, they would make G meaningless)."""
    group_cols = list(group_cols)
    s = F.col(size_col).cast("bigint")
    base = (df.where(s.isNotNull() & (s >= 0))
            .select(*group_cols, s.alias("__s__")))
    i = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(F.col("__s__").asc()))
    nw = F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    ranked = (base.withColumn("__i__", i.cast("bigint"))
              .withColumn("__n__", nw.cast("bigint")))
    wsum = F.sum((2 * F.col("__i__") - F.col("__n__") - 1)
                 * F.col("__s__"))
    g = ranked.groupBy(*group_cols).agg(
        F.max("__n__").alias("n_items"),
        F.sum("__s__").alias("total_size"),
        wsum.alias("__w__"))
    gini = F.when(F.col("total_size") > 0,
                  F.round(F.col("__w__").cast("double")
                          / (F.col("n_items").cast("double")
                             * F.col("total_size").cast("double")), 6))
    return (g.where(F.col("n_items") >= F.lit(min_n))
            .select(*group_cols, "n_items", "total_size",
                    gini.alias("gini")))


__all__ += ["histogram_quantiles", "gini_concentration"]


def k_anonymity(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, k: int = 10,
                sensitive_buckets: int = 10) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier combos:
    ``(quasi..., n_rows, l_diversity, risky)`` — the privacy gate a
    dataset passes before leaving a trust boundary: any combination of
    quasi-identifiers shared by fewer than ``k`` individuals
    re-identifies them (Sweeney 2002), and a large-but-homogeneous
    group still leaks its sensitive value without l-diversity
    (Machanavalli et al. 2007).

    ``l_diversity`` counts distinct ``sensitive_buckets``-quantile-free
    integer buckets of the sensitive column inside the combo (bucket =
    floor of the value scaled into its global [min,max) range — a
    deterministic equal-width cut, no quantile pass); ``risky`` flags
    ``n_rows < k OR l_diversity < 2``.  One groupBy on the quasi key
    plus a broadcast 1-row min/max — two skinny exchanges at any
    scale."""
    quasi_cols = list(quasi_cols)
    s = F.col(sensitive_col).cast("double")
    rng = df.agg(F.min(s).alias("__lo__"), F.max(s).alias("__hi__"))
    j = df.crossJoin(F.broadcast(rng))
    span = F.col("__hi__") - F.col("__lo__")
    bucket = F.when(span > 0,
                    F.least(F.floor((s - F.col("__lo__")) / span
                                    * F.lit(sensitive_buckets)),
                            F.lit(sensitive_buckets - 1))) \
             .otherwise(F.lit(0))
    g = (j.withColumn("__b__", bucket)
         .groupBy(*quasi_cols)
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
              F.countDistinct("__b__").cast("int")
              .alias("l_diversity")))
    return g.select(*quasi_cols, "n_rows", "l_diversity",
                    ((F.col("n_rows") < F.lit(k))
                     | (F.col("l_diversity") < 2)).alias("risky"))


__all__ += ["k_anonymity"]
