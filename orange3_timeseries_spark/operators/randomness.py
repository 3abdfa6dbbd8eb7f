"""Per-series randomness / random-walk diagnostics.

The reference's modeling widgets assume the user eyeballs whether a
series is structureless noise, a random walk, or something worth a
model (the ARIMA/VAR spinners, ``owarimamodel.py:48-55``); at pipeline
scale that triage must be a query.  Three classical screens, each a
single skinny shuffle of closed-form sums:

- :func:`runs_test` — Wald-Wolfowitz runs test above/below the median
  (Wald & Wolfowitz 1940): too few runs = trending/sticky, too many =
  oscillating.  Distribution-free, the first thing to run on residuals.
- :func:`variance_ratio` — Lo-MacKinlay variance-ratio test (Lo &
  MacKinlay 1988): VR(q) ≈ 1 under a random walk; VR > 1 momentum,
  VR < 1 mean reversion.  THE standard random-walk test in finance.
- :func:`hac_mean` — Newey-West (1987) Bartlett-kernel long-run
  variance of the mean: autocorrelation-robust standard error and the
  effective sample size ``n_eff = n·γ₀/lrv`` — the honest answer to
  "how many independent observations do I really have?", which at
  100 TB decides how much data a downstream estimate actually needs.

Scale design: every statistic is lag-window products plus one
``groupBy(series)`` of map-combinable sums — the ordered window and the
aggregation share the series-key partitioning, so each test costs ONE
exchange regardless of series count.  No Python, no collect; a billion
series is a billion skinny groups.

Determinism (the drift_ks / ensemble_forecast firewall class): all
three tests accumulate ONLY exact BIGINT quantities.  ``runs_test``
moments are integer products by construction; ``variance_ratio`` and
``hac_mean`` quantize the input to ``quantize_scale`` decimals AT
SOURCE (round-at-source, the house rule) and aggregate raw-unit
moments (``Σu²``, ``Σu·lag_j(u)``, endpoint sums) — each bounded by
``n·(10^s·range)²``, safe in BIGINT past 10⁶ rows per series at scale
2 on O(100) data — then combine them through the demeaning expansion
identities in FIXED-ORDER double arithmetic.  Bit-identical integer
inputs + an identical operation tree = bit-identical doubles on any
engine, without ever forming the overflow-prone ``(u·n − U)²``
per-row products.  Verdict booleans compare 6-dp-ROUNDED z against
the critical literal, so representation noise cannot flip them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.trend import (
    NORMAL_TWO_SIDED,
    _lower_median,
)

__all__ = ["runs_test", "variance_ratio", "hac_mean"]

#: two-sided 5% normal critical value (shared with trend.py)
_Z_5PCT = NORMAL_TWO_SIDED["5pct"]


def _base(df: DataFrame, time_col: str, value_col: str,
          series_cols: Sequence[str]) -> DataFrame:
    return (df.where(F.col(value_col).isNotNull())
            .select(*series_cols, F.col(time_col).alias("__t__"),
                    F.col(value_col).cast("double").alias("__v__")))


def _units(c: Column, scale: int) -> Column:
    """Exact integer micro-units of a ~scale-decimal double."""
    return F.round(c * F.lit(float(10 ** scale))).cast("bigint")


def runs_test(df: DataFrame, time_col: str, value_col: str,
              series_cols: Sequence[str], min_n: int = 20) -> DataFrame:
    """Wald-Wolfowitz runs test per series: ``(series..., n_obs,
    n_above, n_below, n_runs, z, nonrandom_5pct)``.

    Values are dichotomized against the series' lower-median ELEMENT
    (an actual data value — no interpolation to diverge on) and exact
    ties are dropped, the textbook treatment.  With ``a`` observations
    above and ``b`` below, the run count ``R`` under exchangeability
    has ``E[R] = 2ab/(a+b) + 1`` and ``Var[R] = 2ab(2ab−a−b) /
    ((a+b)²(a+b−1))`` — ``2ab`` is BIGINT-exact at any series length
    and the moment ratios are fixed-order double combinations of it,
    deterministic on any engine.  ``z`` is 6-dp rounded;
    ``nonrandom_5pct`` compares |z| to 1.959964.

    Ordering within a series follows ``time_col`` alone — break ties
    upstream if the timestamp is not unique per series."""
    series_cols = list(series_cols)
    b = _base(df, time_col, value_col, series_cols)
    med = (b.groupBy(*series_cols)
           .agg(_lower_median(F.sort_array(F.collect_list("__v__")))
                .alias("__med__")))
    k = (b.join(med, on=series_cols, how="inner")
         .where(F.col("__v__") != F.col("__med__"))
         .withColumn("__s__", F.when(F.col("__v__") > F.col("__med__"),
                                     F.lit(1)).otherwise(F.lit(0))))
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    prev = F.lag("__s__").over(w)
    k = k.withColumn("__br__", F.when(prev.isNull()
                                      | (prev != F.col("__s__")),
                                      F.lit(1)).otherwise(F.lit(0)))
    g = (k.groupBy(*series_cols)
         .agg(F.count(F.lit(1)).alias("__n__"),
              F.sum("__s__").cast("bigint").alias("n_above"),
              F.sum("__br__").cast("bigint").alias("n_runs"))
         .withColumn("n_below", F.col("__n__") - F.col("n_above")))
    n = F.col("__n__")
    nd = n.cast("double")
    two_ab = 2 * F.col("n_above") * F.col("n_below")   # BIGINT-exact
    tad = two_ab.cast("double")
    e_runs = tad / nd + 1
    var_r = (tad * (tad - nd)) / ((nd * nd) * (nd - 1))
    z6 = F.round((F.col("n_runs").cast("double") - e_runs)
                 / F.sqrt(var_r), 6)
    return (g.where((n >= F.lit(min_n)) & (F.col("n_above") > 0)
                    & (F.col("n_below") > 0) & (two_ab > n))
            .select(*series_cols, n.cast("long").alias("n_obs"),
                    "n_above", "n_below", "n_runs", z6.alias("z"),
                    (F.abs(z6) > F.lit(_Z_5PCT)).alias("nonrandom_5pct")))


def variance_ratio(df: DataFrame, time_col: str, value_col: str,
                   series_cols: Sequence[str], q: int = 4,
                   min_n: int = 40, quantize_scale: int = 2) -> DataFrame:
    """Lo-MacKinlay variance-ratio test per series: ``(series...,
    n_obs, vr, z, reject_rw_5pct)`` for horizon ``q``.

    With levels quantized to ``quantize_scale`` decimals at source
    (units ``u_t``), drift ``μ̂ = D/(10^s·n)`` from the exact endpoint
    difference ``D = u_N − u_1``, and ``n = N−1`` one-period diffs
    ``x_t = u_t − u_{t−1}`` (``Σx = D`` telescopes exactly), the
    classic moments expand to raw-unit sums:

        Σ(x−μ̂)²·(sn)²  = n²Σx² − nD²                    =: A·n
        Σ(y−qμ̂)²·(sn)² = n²Σy² − 2qnD·T + (n−q+1)q²D²   =: B

    with ``y_t = u_t − u_{t−q}`` and ``T = Σy`` (also an exact
    endpoint sum), giving ``VR = σq²/σ₁² = B(n−1) /
    (A·q(n−q+1)(n−q))`` — the BIGINT aggregates are the bounded raw
    moments ``Σx²``/``Σy²``, and A/B/VR are fixed-order double
    combinations of bit-identical integers.
    ``z = (VR−1)/√(2(2q−1)(q−1)/(3qn))`` (Lo-MacKinlay homoskedastic
    form with unbiased overlapping-sum denominators);
    ``reject_rw_5pct`` compares the 6-dp-rounded z to 1.959964.
    VR > 1 = momentum, VR < 1 = mean reversion."""
    series_cols = list(series_cols)
    b = _base(df, time_col, value_col, series_cols)
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    u = _units(F.col("__v__"), quantize_scale)
    b = b.withColumn("__u__", u)
    xu = F.col("__u__") - F.lag("__u__", 1).over(w)
    yu = F.col("__u__") - F.lag("__u__", q).over(w)
    g = (b.select(*series_cols, xu.alias("__x__"), yu.alias("__y__"))
         .groupBy(*series_cols).agg(
             F.count("__x__").cast("bigint").alias("__n__"),
             F.sum("__x__").alias("__D__"),
             F.sum("__y__").alias("__T__"),
             F.sum(F.col("__x__") * F.col("__x__")).alias("__sx2__"),
             F.sum(F.col("__y__") * F.col("__y__")).alias("__sy2__")))
    n = F.col("__n__")
    nd = n.cast("double")
    dd = F.col("__D__").cast("double")
    td = F.col("__T__").cast("double")
    a = nd * F.col("__sx2__").cast("double") - dd * dd
    bq = (nd * nd * F.col("__sy2__").cast("double")
          - F.lit(2.0 * q) * nd * dd * td
          + (nd - q + 1) * F.lit(float(q * q)) * dd * dd)
    f = (F.lit(q) * (n - q + 1) * (n - q)).cast("double")  # BIGINT-exact
    vr = (bq * (nd - 1)) / (a * f)
    se = F.sqrt(F.lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / nd)
    z6 = F.round((vr - 1) / se, 6)
    return (g.where((n >= F.lit(min_n)) & (a > 0))
            .select(*series_cols, n.cast("long").alias("n_obs"),
                    F.round(vr, 6).alias("vr"), z6.alias("z"),
                    (F.abs(z6) > F.lit(_Z_5PCT)).alias("reject_rw_5pct")))


def hac_mean(df: DataFrame, time_col: str, value_col: str,
             series_cols: Sequence[str], max_lag: int = 5,
             min_n: int = 30, quantize_scale: int = 2) -> DataFrame:
    """Newey-West HAC inference on the series mean: ``(series...,
    n_obs, mean, gamma0, lrv, se_mean, n_eff)``.

    Bartlett-kernel long-run variance ``lrv = γ₀ + 2Σ_{j≤L}(1 −
    j/(L+1))γ_j`` with ``γ_j = Σ d_t d_{t−j} / n`` (Newey & West
    1987); ``se_mean = √(lrv/n)`` is the autocorrelation-robust
    standard error and ``n_eff = n·γ₀/lrv`` the effective sample size
    — a positively-autocorrelated series carries far fewer independent
    observations than its row count claims, the number a sampling
    stage should budget against.

    Exact-moment path: with the input quantized to ``quantize_scale``
    decimals at source (units ``u_t``, ``U = Σu``, ``N`` rows),
    deviations are ``d_t = (u_t·N − U)/(10^s·N)`` and each
    autocovariance numerator expands to raw-unit lag moments

        Σ(u_t N − U)(u_{t−j} N − U) = N²·P_j − N·U·E_j + (N−j)·U²
        P_j = Σ u_t·u_{t−j},   E_j = Σ (u_t + u_{t−j})

    (both sums over the N−j valid lag pairs; ``E_0 = 2U``).  P_j and
    E_j are the ONLY aggregates — bounded BIGINTs — and γ̃_j, the
    (L+1)-cleared Bartlett combination ``L̃ = (L+1)·γ̃₀ +
    Σ_{j=1..L} 2(L+1−j)·γ̃_j`` (integer weights — never the inexact
    ``1 − j/(L+1)``), and every output ratio are fixed-order double
    arithmetic over them:
    ``lrv = L̃/((L+1)(10^s N)²N)``, ``se_mean = √(lrv/N)``,
    ``n_eff = (L+1)·N·γ̃₀/L̃``.  Negative lrv cannot occur (Bartlett
    weights are PSD); zero-variance series are dropped."""
    series_cols = list(series_cols)
    b = _base(df, time_col, value_col, series_cols)
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    b = b.withColumn("__u__", _units(F.col("__v__"), quantize_scale))
    for j in range(1, max_lag + 1):
        b = b.withColumn(f"__l{j}__", F.lag("__u__", j).over(w))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__N__"),
            F.sum("__u__").alias("__U__"),
            F.sum(F.col("__u__") * F.col("__u__")).alias("__P0__")]
    for j in range(1, max_lag + 1):
        lj = F.col(f"__l{j}__")
        aggs.append(F.sum(F.col("__u__") * lj).alias(f"__P{j}__"))
        aggs.append(F.sum(F.col("__u__") + lj).alias(f"__E{j}__"))
    g = b.groupBy(*series_cols).agg(*aggs)
    n = F.col("__N__")
    nd = n.cast("double")
    ud = F.col("__U__").cast("double")
    lp1 = max_lag + 1

    def gamma_num(j: int):
        pj = F.col(f"__P{j}__").cast("double")
        ej = (F.lit(2.0) * ud if j == 0
              else F.col(f"__E{j}__").cast("double"))
        return nd * nd * pj - nd * ud * ej + (nd - j) * ud * ud

    lrv_num = F.lit(float(lp1)) * gamma_num(0)
    for j in range(1, max_lag + 1):
        lrv_num = lrv_num + F.lit(float(2 * (lp1 - j))) * gamma_num(j)
    sn = F.lit(float(10 ** quantize_scale)) * nd
    den_g = sn * sn * nd                               # (10^s·N)²·N
    mean = ud / sn
    gamma0 = gamma_num(0) / den_g
    lrv = lrv_num / (F.lit(float(lp1)) * den_g)
    g = g.withColumn("__g0n__", gamma_num(0)) \
         .withColumn("__lrvn__", lrv_num)
    return (g.where((n >= F.lit(min_n)) & (F.col("__g0n__") > 0)
                    & (F.col("__lrvn__") > 0))
            .select(*series_cols, n.cast("long").alias("n_obs"),
                    mean.alias("mean"),
                    F.round(gamma0, 6).alias("gamma0"),
                    F.round(lrv, 6).alias("lrv"),
                    F.round(F.sqrt(lrv / nd), 6).alias("se_mean"),
                    F.round(F.lit(float(lp1)) * nd * F.col("__g0n__")
                            / F.col("__lrvn__"), 6).alias("n_eff")))


def permutation_entropy(df: DataFrame, time_col: str, value_col: str,
                        series_cols: Sequence[str],
                        min_n: int = 30) -> DataFrame:
    """Normalized permutation entropy of order m=3 per series:
    ``(series..., n_triples, n_patterns, pe)`` — the Bandt-Pompe
    (2002) complexity measure: pe → 1 for white noise, → 0 for
    strictly monotone/deterministic dynamics.  The third leg of the
    randomness triage (runs = sign structure, VR = variance scaling,
    PE = ordinal structure), and the standard cheap "is there any
    forecastable pattern here at all?" gate.

    Each consecutive value triple maps to one of 6 ordinal patterns
    (ties ranked by time index, the Bandt-Pompe convention) through a
    mutually-exclusive comparison CASE ladder — integer pattern counts
    are the only aggregates, and the entropy ``−Σ(cᵢ/n)·ln(cᵢ/n) /
    ln 6`` is a fixed-order expression over them, so cross-engine
    divergence is bounded by libm's ln ulp (absorbed by the 6-dp
    round).  One lag window + one groupBy on the series key."""
    import math

    series_cols = list(series_cols)
    b = _base(df, time_col, value_col, series_cols)
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    a = F.lag("__v__", 2).over(w)
    m = F.lag("__v__", 1).over(w)
    c = F.col("__v__")
    # tie rule: equal values keep time order (earlier index first)
    pid = (F.when((a <= m) & (m <= c), 0)                  # a,b,c
           .when((a <= m) & (c < m) & (a <= c), 1)         # a,c,b
           .when((a <= m) & (c < m) & (c < a), 4)          # c,a,b
           .when((m < a) & (a <= c), 2)                    # b,a,c
           .when((m < a) & (c < a) & (m <= c), 3)          # b,c,a
           .otherwise(5))                                  # c,b,a
    b = b.withColumn("__p__", F.when(a.isNotNull(), pid))
    aggs = [F.count("__p__").cast("bigint").alias("__n__")]
    for i in range(6):
        aggs.append(F.sum(F.when(F.col("__p__") == i, 1).otherwise(0))
                    .cast("bigint").alias(f"__c{i}__"))
    g = b.groupBy(*series_cols).agg(*aggs)
    nd = F.col("__n__").cast("double")
    h = F.lit(0.0)
    npat = F.lit(0)
    for i in range(6):
        ci = F.col(f"__c{i}__")
        frac = ci.cast("double") / nd
        h = h + F.when(ci > 0, frac * F.log(frac)).otherwise(F.lit(0.0))
        npat = npat + F.when(ci > 0, 1).otherwise(0)
    pe = -h / F.lit(math.log(6.0))
    return (g.where(F.col("__n__") >= F.lit(min_n))
            .select(*series_cols, F.col("__n__").alias("n_triples"),
                    npat.cast("int").alias("n_patterns"),
                    F.round(pe, 6).alias("pe")))


__all__.append("permutation_entropy")


def turning_points_test(df: DataFrame, time_col: str, value_col: str,
                        series_cols: Sequence[str],
                        min_n: int = 20) -> DataFrame:
    """Turning-points randomness test per series: ``(series..., n_obs,
    n_turning, z, nonrandom_5pct)`` — count strict local extrema
    (peaks ``v_{t−1} < v_t > v_{t+1}`` and troughs ``> <``); under iid
    exchangeability ``E[T] = 2(n−2)/3`` and ``Var[T] = (16n−29)/90``
    (Kendall's classic result).  Too few turns = trending, too many =
    rapid oscillation — the cheap complement to :func:`runs_test` that
    needs no median pass (ONE lag window + groupBy, one exchange).

    Ties never count as turning points (strict inequalities), the
    standard discrete-data treatment.  Moments are single divisions of
    exact integers; z is 6-dp rounded, the verdict compares |z| to
    1.959964."""
    series_cols = list(series_cols)
    b = _base(df, time_col, value_col, series_cols)
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    p = F.lag("__v__", 1).over(w)
    nx = F.lead("__v__", 1).over(w)
    c = F.col("__v__")
    turn = F.when(((p < c) & (nx < c)) | ((p > c) & (nx > c)), 1) \
            .otherwise(0)
    b = b.withColumn("__turn__", F.when(p.isNotNull() & nx.isNotNull(),
                                        turn))
    g = b.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__"),
        F.sum("__turn__").cast("bigint").alias("n_turning"))
    n = F.col("__n__")
    nd = n.cast("double")
    e_t = F.lit(2.0) * (nd - 2) / F.lit(3.0)
    var_t = (F.lit(16.0) * nd - 29) / F.lit(90.0)
    z6 = F.round((F.col("n_turning").cast("double") - e_t)
                 / F.sqrt(var_t), 6)
    return (g.where(n >= F.lit(min_n))
            .select(*series_cols, n.cast("long").alias("n_obs"),
                    "n_turning", z6.alias("z"),
                    (F.abs(z6) > F.lit(_Z_5PCT)).alias("nonrandom_5pct")))


__all__.append("turning_points_test")
