"""Nonparametric trend and change-point tests per series.

The reference's modeling tier is parametric throughout (ARIMA / VAR,
``owarimamodel.py``, ``owvarmodel.py``); production monitoring of
millions of series needs the distribution-free companions — the tests
hydrologists and SRE teams actually run when normality can't be
assumed:

- :func:`mann_kendall` — the Mann-Kendall trend test (Mann 1945,
  Kendall 1975): ``S = Σ_{i<j} sign(y_j − y_i)`` with the tie-corrected
  variance ``Var S = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18`` and
  the continuity-corrected normal statistic.  Emits Sen's slope (Sen
  1968) — the median pairwise slope — as the robust trend magnitude.
- :func:`theil_sen` — Theil-Sen robust line fit: slope = median of all
  pairwise slopes, intercept = median of ``y_i − slope·x_i`` (Theil
  1950); up to ~29% contamination breakdown vs 0% for OLS.
- :func:`pettitt_test` — Pettitt (1979) rank-based single change-point
  test: ``U_t = 2·Σ_{i≤t} r_i − t(n+1)`` over the average ranks ``r_i``,
  ``K = max_t |U_t|``, approximate significance
  ``p ≈ 2·exp(−6K²/(n³+n²))``.  The nonparametric sibling of the
  mean-shift detector in ``queries_analytics.q_changepoint_by_user``.

Scale design.  Per-series length ``n`` is bounded (the testdata holds
it at ~67 per user at EVERY scale factor — users grow, series don't;
the same holds for per-entity metrics series at 100 TB).  Mann-Kendall
and Theil-Sen are pairwise by definition — O(n²) per series — so the
cost is ``users × n²`` pairs: LINEAR in users, constant per series,
produced by a single sort-merge self-join on the series key (series
parallelize across the cluster; no driver state, no UDF).  A series
longer than ``max_n`` rows is dropped, not silently truncated — the
pairwise tests are the wrong tool past ~10⁴ points and the cap keeps a
runaway series from quadratic blowup.  Pettitt needs only ranks and a
prefix sum: O(n log n) per series, two window passes, no join.

Determinism contract (cf. PLANS.md firewall rules):

- ``S``, ``Var S``, ``U_t`` and ``K`` are INTEGER-or-half-integer
  arithmetic carried in doubles far below 2^53 — bit-exact on any
  engine.
- Sen's slope / Theil-Sen medians are exact lower-median ELEMENT
  selections from individually 6-dp-rounded pairwise slopes (round at
  SOURCE, then select — no float combination for engines to disagree
  on).
- Significance flags compare the ROUNDED statistic against fixed
  two-sided normal critical values (1-ulp noise cannot flip a flag);
  Pettitt's closed-form ``exp`` p-value is replayed verbatim in SQL.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mann_kendall", "theil_sen", "pettitt_test", "binseg_changepoints",
           "NORMAL_TWO_SIDED"]

#: two-sided standard-normal critical values (Φ^{-1}(1 − α/2))
NORMAL_TWO_SIDED = {"1pct": 2.575829, "5pct": 1.959964, "10pct": 1.644854}

#: pairwise-test series-length cap (see module docstring)
DEFAULT_MAX_N = 10_000


def _lower_median(arr_col: Column) -> Column:
    """Exact lower median: element at 1-based position ``(n+1)//2`` of a
    sorted array — selection, not interpolation (same helper contract as
    ``operators.anomaly._lower_median``)."""
    n = F.size(arr_col)
    return F.element_at(arr_col, ((n + 1) / 2).cast("int"))


def _pairs(df: DataFrame, time_col: str, value_col: str,
           series_cols: Sequence[str], max_n: int) -> DataFrame:
    """All ordered within-series pairs ``(i, j)`` with ``t_i < t_j``:
    one sort-merge self-join on the series key.  Equal-timestamp pairs
    are excluded (no defined order, and a slope over Δt = 0 is
    undefined) — identically in the SQL oracles.  Emits ``__yi __yj
    __dt_days`` (Δt in exact integer epoch-day fractions)."""
    series_cols = list(series_cols)
    pw = Window.partitionBy(*series_cols)
    base = (df.where(F.col(value_col).isNotNull())
            .select(*series_cols,
                    F.col(time_col).alias("__t__"),
                    F.col(value_col).cast("double").alias("__y__"))
            .withColumn("__n__", F.count(F.lit(1)).over(pw))
            .where(F.col("__n__").between(2, max_n)))
    a = base.select(*series_cols, F.col("__t__").alias("__ti__"),
                    F.col("__y__").alias("__yi__"), "__n__")
    b = base.select(*series_cols, F.col("__t__").alias("__tj__"),
                    F.col("__y__").alias("__yj__"))
    p = a.join(b, on=series_cols, how="inner") \
         .where(F.col("__ti__") < F.col("__tj__"))
    # Δt as integer MICROSECOND difference / 86400e6 (unix_micros ↔
    # DuckDB epoch_us): the subtraction is exact int64, the one
    # division is the same IEEE op on both engines — no truncation
    # (unix_timestamp drops sub-second parts and would diverge)
    dt = ((F.unix_micros(F.col("__tj__")) - F.unix_micros(F.col("__ti__")))
          .cast("double") / F.lit(86400.0e6))
    return p.withColumn("__dt_days__", dt)


def mann_kendall(df: DataFrame, time_col: str, value_col: str,
                 series_cols: Sequence[str], quantize: int = 6,
                 max_n: int = DEFAULT_MAX_N) -> DataFrame:
    """One row per series: ``(series..., n_obs, s_stat, var_s, z,
    sen_slope, trend, significant_5pct)``.

    ``z`` carries the continuity correction ((S−1)/σ for S>0, (S+1)/σ
    for S<0, 0 at S=0); ``trend`` is ``increasing`` / ``decreasing`` /
    ``no trend`` at the two-sided 5% level on the 6-dp-rounded z;
    ``sen_slope`` is per DAY: the lower-median ELEMENT of the
    ``quantize``-dp-rounded pairwise slopes, emitted with NO second
    rounding — re-rounding a finer grid to 6 dp lands exactly on
    half-boundaries (e.g. a 7-dp median of 0.0161095) where decimal
    HALF_UP and binary rounding legitimately disagree across engines.
    Series with ``Var S = 0`` (all values tied) are
    dropped — the statistic is undefined."""
    series_cols = list(series_cols)
    p = _pairs(df, time_col, value_col, series_cols, max_n)
    slope = F.round((F.col("__yj__") - F.col("__yi__"))
                    / F.col("__dt_days__"), quantize)
    pg = p.groupBy(*series_cols).agg(
        F.max("__n__").alias("__n__"),
        F.sum(F.signum(F.col("__yj__") - F.col("__yi__")))
        .cast("double").alias("__s__"),
        F.sort_array(F.collect_list(slope)).alias("__slopes__"))

    # tie-group correction Σ t(t−1)(2t+5) over equal y values
    ties = (df.where(F.col(value_col).isNotNull())
            .groupBy(*series_cols,
                     F.col(value_col).cast("double").alias("__v__"))
            .agg(F.count(F.lit(1)).cast("double").alias("__t__"))
            .groupBy(*series_cols)
            .agg(F.sum(F.col("__t__") * (F.col("__t__") - 1)
                       * (2 * F.col("__t__") + 5)).alias("__tc__")))

    g = pg.join(ties, on=series_cols, how="inner")
    n = F.col("__n__").cast("double")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("__tc__")) / F.lit(18.0)
    g = g.withColumn("__var__", var_s).where(F.col("__var__") > 0)
    s = F.col("__s__")
    z = (F.when(s > 0, (s - 1) / F.sqrt(F.col("__var__")))
          .when(s < 0, (s + 1) / F.sqrt(F.col("__var__")))
          .otherwise(F.lit(0.0)))
    z6 = F.round(z, 6)
    crit = F.lit(NORMAL_TWO_SIDED["5pct"])
    return g.select(
        *series_cols,
        F.col("__n__").cast("long").alias("n_obs"),
        s.cast("long").alias("s_stat"),
        F.round(F.col("__var__"), 6).alias("var_s"),
        z6.alias("z"),
        _lower_median(F.col("__slopes__")).alias("sen_slope"),
        F.when(z6 > crit, F.lit("increasing"))
         .when(z6 < -crit, F.lit("decreasing"))
         .otherwise(F.lit("no trend")).alias("trend"),
        (F.abs(z6) > crit).alias("significant_5pct"))


def theil_sen(df: DataFrame, time_col: str, value_col: str,
              series_cols: Sequence[str], quantize: int = 6,
              max_n: int = DEFAULT_MAX_N) -> DataFrame:
    """Theil-Sen robust line per series: ``(series..., n_obs,
    slope_per_day, intercept)`` with ``x`` in days since the series'
    FIRST observation (anchoring at the series start keeps the
    intercept in data units instead of an extrapolation to 1970).

    slope = lower-median element of the ``quantize``-dp-rounded
    pairwise slopes; intercept = lower-median element of the residual
    levels ``y_i − slope·x_i`` (each rounded ``quantize`` dp before
    selection).  Both medians are emitted without a second rounding —
    see :func:`mann_kendall` on why double-rounding is engine-divergent."""
    series_cols = list(series_cols)
    p = _pairs(df, time_col, value_col, series_cols, max_n)
    slope = F.round((F.col("__yj__") - F.col("__yi__"))
                    / F.col("__dt_days__"), quantize)
    sl = (p.groupBy(*series_cols)
          .agg(F.max("__n__").alias("__n__"),
               F.sort_array(F.collect_list(slope)).alias("__slopes__"))
          .select(*series_cols, "__n__",
                  _lower_median(F.col("__slopes__")).alias("__slope__")))

    pw = Window.partitionBy(*series_cols)
    base = (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, F.col(time_col).alias("__t__"),
                    F.col(value_col).cast("double").alias("__y__"))
            .withColumn("__t0__", F.min("__t__").over(pw)))
    x_days = ((F.unix_micros(F.col("__t__")) - F.unix_micros(F.col("__t0__")))
              .cast("double") / F.lit(86400.0e6))
    joined = base.join(sl, on=series_cols, how="inner")
    level = F.round(F.col("__y__") - F.col("__slope__") * x_days,
                    quantize)
    out = (joined.groupBy(*series_cols)
           .agg(F.max("__n__").alias("__n__"),
                F.max("__slope__").alias("__slope__"),
                F.sort_array(F.collect_list(level)).alias("__levels__")))
    return out.select(
        *series_cols, F.col("__n__").cast("long").alias("n_obs"),
        F.col("__slope__").alias("slope_per_day"),
        _lower_median(F.col("__levels__")).alias("intercept"))


def _pettitt_core(base: DataFrame, part_cols: Sequence[str]) -> DataFrame:
    """Pettitt machinery over ``(part_cols..., __t__, __y__)`` rows:
    one row per partition with ``(part_cols..., __n__, __k__, __tt__,
    __ts__, __p6__)`` — max-|U| statistic, its 1-based position and
    timestamp (earliest on ties), and the rounded closed-form p-value.
    Shared by :func:`pettitt_test` (whole series) and
    :func:`binseg_changepoints` (per segment)."""
    part_cols = list(part_cols)
    pw = Window.partitionBy(*part_cols)
    # average rank of each value within its partition
    rk = F.rank().over(pw.orderBy(F.col("__y__").asc()))
    tie_n = F.count(F.lit(1)).over(
        Window.partitionBy(*part_cols, F.col("__y__")))
    b = base.withColumn(
        "__r__", rk + (tie_n - F.lit(1)) / F.lit(2.0))
    # (ts, y) ordering: equal-timestamp rows with equal y are
    # interchangeable (equal average rank → identical prefix sums), so
    # the y tie-break makes the cumulative path engine-deterministic
    ow = (pw.orderBy(F.col("__t__").asc(), F.col("__y__").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = (b
         .withColumn("__cr__", F.sum("__r__").over(ow))
         .withColumn("__tt__", F.row_number().over(
             pw.orderBy(F.col("__t__").asc(), F.col("__y__").asc())))
         .withColumn("__n__", F.count(F.lit(1)).over(pw)))
    n = F.col("__n__").cast("double")
    u = 2 * F.col("__cr__") - F.col("__tt__") * (n + 1)
    cand = (b.where(F.col("__tt__") < F.col("__n__"))
            .withColumn("__u__", F.abs(u)))
    best = Window.partitionBy(*part_cols).orderBy(
        F.col("__u__").desc(), F.col("__tt__").asc())
    top = (cand.withColumn("__rn__", F.row_number().over(best))
           .where(F.col("__rn__") == 1))
    k = F.col("__u__")
    p6 = F.round(F.least(F.lit(1.0),
                         2 * F.exp(-6 * k * k / (n * n * n + n * n))), 6)
    return top.select(*part_cols, F.col("__n__"), k.alias("__k__"),
                      F.col("__tt__"), F.col("__t__").alias("__ts__"),
                      p6.alias("__p6__"))


def pettitt_test(df: DataFrame, time_col: str, value_col: str,
                 series_cols: Sequence[str]) -> DataFrame:
    """Pettitt rank-based change-point test per series: ``(series...,
    n_obs, k_stat, change_ts, p_value, significant_5pct)`` — the
    change point is the EARLIEST time attaining ``K = max_t |U_t|``
    (t ranges over 1..n−1; ``U_n ≡ 0``), ``p = min(1,
    2·exp(−6K²/(n³+n²)))``.

    Average ranks (min-rank + (ties−1)/2) make ``U_t`` exact
    half-integer arithmetic → ``2·Σr`` integer-exact in doubles; no
    quantize parameter is needed anywhere before the final p-value
    rounding."""
    series_cols = list(series_cols)
    base = (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, F.col(time_col).alias("__t__"),
                    F.col(value_col).cast("double").alias("__y__")))
    top = _pettitt_core(base, series_cols)
    return top.select(
        *series_cols, F.col("__n__").cast("long").alias("n_obs"),
        F.col("__k__").alias("k_stat"),
        F.col("__ts__").alias("change_ts"),
        F.col("__p6__").alias("p_value"),
        (F.col("__p6__") < F.lit(0.05)).alias("significant_5pct"))


def binseg_changepoints(df: DataFrame, time_col: str, value_col: str,
                        series_cols: Sequence[str],
                        min_seg: int = 5) -> DataFrame:
    """Multiple change-point detection by depth-2 binary segmentation
    (Scott & Knott 1974 / the standard binseg recursion) over the
    Pettitt statistic: test the whole series; where the level-1 split
    is significant (p < 0.05), re-test each side independently.  Up to
    three rows per series: ``(series..., level, segment, n_obs, k_stat,
    change_ts, p_value, significant_5pct)`` — level 1 is the whole
    series (segment 0), level 2 the left/right segments (0/1).

    A side is re-tested only when it holds at least ``2·min_seg``
    observations (a split needs ``min_seg`` on each side to mean
    anything).  Insignificant level-1 series emit their level-1 row
    only — the binseg stopping rule.

    Determinism: U statistics are exact half-integer arithmetic (see
    :func:`pettitt_test`); the segment boundary is the level-1 argmax
    POSITION (integer), so level-2 partitions are integer-derived —
    nothing float crosses the recursion boundary.  Scale: two window
    passes per level over the same series-key shuffle; the level-2
    pass works on (series, segment) sub-partitions of the identical
    data — one extra skinny join against the level-1 result."""
    series_cols = list(series_cols)
    base = (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, F.col(time_col).alias("__t__"),
                    F.col(value_col).cast("double").alias("__y__")))
    top1 = _pettitt_core(base, series_cols)
    lvl1 = top1.select(
        *series_cols, F.lit(1).alias("level"), F.lit(0).alias("segment"),
        F.col("__n__").cast("long").alias("n_obs"),
        F.col("__k__").alias("k_stat"),
        F.col("__ts__").alias("change_ts"),
        F.col("__p6__").alias("p_value"),
        (F.col("__p6__") < F.lit(0.05)).alias("significant_5pct"))
    splits = top1.where(F.col("__p6__") < F.lit(0.05)).select(
        *series_cols, F.col("__tt__").alias("__k1__"),
        F.col("__n__").alias("__n1__"))
    rtt = F.row_number().over(
        Window.partitionBy(*series_cols)
        .orderBy(F.col("__t__").asc(), F.col("__y__").asc()))
    seg = F.when(F.col("__rtt__") <= F.col("__k1__"), 0).otherwise(1)
    seg_len = F.when(F.col("__seg__") == 0, F.col("__k1__")) \
        .otherwise(F.col("__n1__") - F.col("__k1__"))
    base2 = (base.withColumn("__rtt__", rtt)
             .join(splits, series_cols)
             .withColumn("__seg__", seg)
             .where(seg_len >= F.lit(2 * min_seg))
             .select(*series_cols, "__seg__", "__t__", "__y__"))
    top2 = _pettitt_core(base2, series_cols + ["__seg__"])
    lvl2 = top2.select(
        *series_cols, F.lit(2).alias("level"),
        F.col("__seg__").cast("int").alias("segment"),
        F.col("__n__").cast("long").alias("n_obs"),
        F.col("__k__").alias("k_stat"),
        F.col("__ts__").alias("change_ts"),
        F.col("__p6__").alias("p_value"),
        (F.col("__p6__") < F.lit(0.05)).alias("significant_5pct"))
    return lvl1.unionByName(lvl2)


def seasonal_mann_kendall(df: DataFrame, time_col: str, value_col: str,
                          series_cols: Sequence[str], season_col: Column,
                          quantize: int = 6,
                          max_n: int = DEFAULT_MAX_N) -> DataFrame:
    """Seasonal Mann-Kendall test (Hirsch & Slack 1984, independent-
    seasons form): the MK statistic computed WITHIN each season and
    summed — ``S = Σ_g S_g``, ``Var S = Σ_g Var S_g`` — so a strong
    seasonal cycle cannot masquerade as (or mask) a monotone trend.
    The seasonal Kendall slope pools the within-season pairwise slopes
    and takes the lower-median element (the Hirsch-Slack estimator).
    Output schema matches :func:`mann_kendall` (plus ``n_seasons``).

    ``season_col`` is any deterministic Column (e.g. the epoch-day
    day-of-week formula — NOT ``dayofweek()``, whose origin differs
    between engines).  Pairs form within (series, season) only, so the
    pairwise cost drops to ``Σ_g n_g²`` — cheaper than plain MK on the
    same series.  Serial-correlation corrections (the full Hirsch-Slack
    covariance) are out of scope and documented as such."""
    series_cols = list(series_cols)
    sdf = df.withColumn("__season__", season_col)
    inner = series_cols + ["__season__"]
    p = _pairs(sdf, time_col, value_col, inner, max_n)
    slope = F.round((F.col("__yj__") - F.col("__yi__"))
                    / F.col("__dt_days__"), quantize)
    per_season = p.groupBy(*inner).agg(
        F.max("__n__").alias("__ng__"),
        F.sum(F.signum(F.col("__yj__") - F.col("__yi__")))
        .cast("double").alias("__sg__"),
        F.sort_array(F.collect_list(slope)).alias("__slopes__"))

    ties = (sdf.where(F.col(value_col).isNotNull())
            .groupBy(*inner,
                     F.col(value_col).cast("double").alias("__v__"))
            .agg(F.count(F.lit(1)).cast("double").alias("__t__"))
            .groupBy(*inner)
            .agg(F.sum(F.col("__t__") * (F.col("__t__") - 1)
                       * (2 * F.col("__t__") + 5)).alias("__tc__")))

    g = per_season.join(ties, on=inner, how="inner")
    ng = F.col("__ng__").cast("double")
    var_g = (ng * (ng - 1) * (2 * ng + 5) - F.col("__tc__")) / F.lit(18.0)
    g = g.withColumn("__vg__", var_g)
    agg = g.groupBy(*series_cols).agg(
        F.sum("__ng__").cast("long").alias("n_obs"),
        F.count(F.lit(1)).alias("__nseas__"),
        F.sum("__sg__").alias("__s__"),
        F.sum("__vg__").alias("__var__"),
        F.sort_array(F.flatten(F.collect_list("__slopes__")))
        .alias("__allslopes__"))
    agg = agg.where(F.col("__var__") > 0)
    s = F.col("__s__")
    z = (F.when(s > 0, (s - 1) / F.sqrt(F.col("__var__")))
          .when(s < 0, (s + 1) / F.sqrt(F.col("__var__")))
          .otherwise(F.lit(0.0)))
    z6 = F.round(z, 6)
    crit = F.lit(NORMAL_TWO_SIDED["5pct"])
    return agg.select(
        *series_cols, "n_obs",
        F.col("__nseas__").cast("long").alias("n_seasons"),
        s.cast("long").alias("s_stat"),
        F.round(F.col("__var__"), 6).alias("var_s"),
        z6.alias("z"),
        _lower_median(F.col("__allslopes__")).alias("sen_slope"),
        F.when(z6 > crit, F.lit("increasing"))
         .when(z6 < -crit, F.lit("decreasing"))
         .otherwise(F.lit("no trend")).alias("trend"),
        (F.abs(z6) > crit).alias("significant_5pct"))


__all__.append("seasonal_mann_kendall")


def hurst_rs(df: DataFrame, time_col: str, value_col: str,
             series_cols: Sequence[str],
             scales: Sequence[int] = (8, 16, 32),
             tie_cols: Sequence[str] = ()) -> DataFrame:
    """Hurst exponent per series by classical rescaled-range analysis
    (Hurst 1951; Mandelbrot & Wallis 1969): split the series into
    consecutive blocks of ``n`` observations for each ``n`` in
    ``scales``, compute each block's R/S (range of mean-adjusted
    cumulative deviations over the population std), average over
    blocks, and estimate ``H`` as the log-log slope — the long-memory
    diagnostic (H>0.5 trending / persistent, H<0.5 mean-reverting)
    that complements the ACF tier.

    ``scales`` must be a three-term geometric progression (enforced):
    for three log-equally-spaced points the OLS log-log slope collapses
    EXACTLY to the closed form ``(ln RS_max − ln RS_min) / span`` — the
    middle scale carries zero OLS weight, so nothing is silently
    ignored.

    Determinism: values are snapped to 0.01-grid integer units, so
    every block statistic is EXACT int64 arithmetic — the 100n factors
    cancel and ``R/S = R_int / sqrt(S_int)`` is one division and one
    sqrt of exact integers, bit-identical on any engine.  The
    across-block mean is ORDER-FREE too: each block's R/S snaps to 6dp
    micro-units (R/S is irrational, so a snap tie is measure-zero),
    the per-scale sum is an exact BIGINT, and the mean is one shared
    ``(sum / count) / 1e6`` association — float ``avg`` partials
    reassociate partition-dependently in Spark but sequentially in an
    oracle replay, the divergence class the rest of this chain
    removes.  The ``rs{n}`` columns are emitted UNROUNDED (the mean is
    already an exact-integer/smallint rational; re-rounding it to 6dp
    would land exactly on half-boundaries where engines' tie rules
    split).  Blocks with zero variance (constant values) are dropped
    from the mean — R/S is undefined there.  Scale: one ordered-window
    pass per series per scale over the same series-key shuffle; block
    count is bounded by ``len(series)/min(scales)``."""
    series_cols = list(series_cols)
    scales = sorted(int(n) for n in scales)
    if (len(scales) != 3 or scales[0] >= scales[1]
            or scales[1] >= scales[2]
            or scales[1] * scales[1] != scales[0] * scales[2]):
        raise ValueError(
            "scales must be a strictly increasing 3-term geometric"
            " progression (e.g. 8,16,32"
            " or 16,32,64): the closed-form slope (ln RS_max - ln RS_min)"
            " / span equals the OLS log-log slope only for three"
            " log-equally-spaced points — interior scales would be"
            " silently ignored otherwise")
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tie_cols]
    pw = Window.partitionBy(*series_cols)
    base = (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, *([time_col] + list(tie_cols)),
                    F.round(F.col(value_col).cast("double") * 100)
                    .cast("long").alias("__u__"))
            .withColumn("__t__", F.row_number().over(pw.orderBy(*order)))
            .withColumn("__ntot__", F.count(F.lit(1)).over(pw)))
    exploded = base.withColumn(
        "__n__", F.explode(F.array(*[F.lit(n) for n in scales])))
    n = F.col("__n__")
    blk = ((F.col("__t__") - 1) / n).cast("long")
    # only FULL blocks participate
    full = exploded.withColumn("__b__", blk).where(
        F.col("__b__") < (F.col("__ntot__") / n).cast("long"))
    bw = Window.partitionBy(*series_cols, "__n__", "__b__")
    k = F.col("__t__") - F.col("__b__") * n  # 1-based position in block
    cu = F.sum("__u__").over(
        bw.orderBy(F.col("__t__"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    su = F.sum("__u__").over(bw)
    suu = F.sum(F.col("__u__") * F.col("__u__")).over(bw)
    # z_k*(100n) = n*cu_k - k*su  (exact); S^2*(100n)^2 = n*suu - su^2
    rows = full.select(
        *series_cols, "__n__", "__b__",
        (n * cu - k * su).alias("__z__"),
        (n * suu - su * su).alias("__s2__"))
    blocks = (rows.groupBy(*series_cols, "__n__", "__b__")
              .agg((F.max("__z__") - F.min("__z__")).alias("__r__"),
                   F.max("__s2__").alias("__s2__"))
              .where(F.col("__s2__") > 0)
              .select(*series_cols, "__n__",
                      (F.col("__r__").cast("double")
                       / F.sqrt(F.col("__s2__").cast("double")))
                      .alias("__rs__")))
    rs_micro = F.round(F.col("__rs__") * F.lit(1e6)).cast("long")
    per_scale = blocks.groupBy(*series_cols, "__n__").agg(
        (F.sum(rs_micro).cast("double") / F.count(F.lit(1))
         / F.lit(1e6)).alias("__mrs__"))
    pivoted = (per_scale.groupBy(*series_cols)
               .pivot("__n__", scales)
               .agg(F.first("__mrs__")))
    lo, hi = F.col(str(scales[0])), F.col(str(scales[-1]))
    span = float(math.log(scales[-1]) - math.log(scales[0]))
    h = F.when((lo > 0) & (hi > 0),
               (F.log(hi) - F.log(lo)) / F.lit(span))
    return pivoted.select(
        *series_cols,
        *[F.col(str(s)).alias(f"rs{s}") for s in scales],
        F.round(h, 6).alias("hurst"))



__all__.extend(["hurst_rs"])
