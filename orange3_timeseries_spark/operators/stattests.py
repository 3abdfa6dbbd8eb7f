"""Distributed stationarity testing: Augmented Dickey-Fuller per series.

The reference's modeling tier assumes the user differences by eye (the
ARIMA widget's ``d`` spinner, ``owarimamodel.py:48-55``); at pipeline
scale the differencing decision must be automatic, and ADF is the
standard test (Said-Dickey 1984): regress

    Δy_t = α + β·y_{t-1} + γ·Δy_{t-1} + ε_t

and compare ``tau = β̂ / se(β̂)`` against Dickey-Fuller critical values
— a unit root (β = 0, needs differencing) is rejected when tau is more
negative than the critical value.

Scale design: everything is ONE ``groupBy(series)`` of Gram-matrix sums
(ten map-combinable aggregates over lag expressions) followed by
closed-form scalar algebra — Cramer's rule for the 3×3 normal
equations, the cofactor for the variance diagonal — in pure Catalyst
columns.  No Python, no per-series Arrow batch, exchanges = 1; a
billion series cost one skinny shuffle.

Determinism firewall (cf. ``ARIMA(quantize=...)``): the Gram sums are
rounded to ``quantize`` decimals BEFORE the scalar algebra, so a SQL
replay aggregating in a different order runs the identical closed-form
arithmetic from identical inputs.

Critical values: MacKinnon (2010, "Critical Values for Cointegration
Tests", QED wp 1227, Table 1, constant / no-trend, N=1) response
surface ``cv(T) = b_inf + b1/T + b2/T² [+ b3/T³]`` at the regression
sample size — the same surface statsmodels evaluates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["adf_test", "kpss_test", "ljung_box", "engle_granger",
           "gap_profile", "winsorize", "ecm_fit",
           "MACKINNON_2010_CONST", "KPSS_CRIT_CONST",
           "MACKINNON_2010_N2"]

#: (b_inf, b1, b2, b3) rows for 1% / 5% / 10%, constant-only model
MACKINNON_2010_CONST = {
    "1pct": (-3.43035, -6.5393, -16.786, -79.433),
    "5pct": (-2.86154, -2.8903, -4.234, -40.04),
    "10pct": (-2.56677, -1.5384, -2.809, 0.0),
}


def _cv(level: str, n: Column) -> Column:
    b0, b1, b2, b3 = MACKINNON_2010_CONST[level]
    return (F.lit(b0) + F.lit(b1) / n + F.lit(b2) / (n * n)
            + F.lit(b3) / (n * n * n))


def adf_test(df: DataFrame, time_col: str, value_col: str,
             series_cols: Sequence[str], quantize: int = 7) -> DataFrame:
    """One ADF row per series: ``(series..., n_obs, beta, tau, cv_1pct,
    cv_5pct, cv_10pct, stationary_5pct)``.

    ``n_obs`` is the regression sample size (series length − 2: one
    observation for the level lag, one for the augmented difference
    lag); series with fewer than 10 usable rows are dropped — a 3-
    variable regression on less is noise."""
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    y = F.col(value_col).cast("double")
    ylag = F.lag(y, 1).over(w)
    dy = y - ylag
    base = df.select(*series_cols, F.col(time_col), y.alias("__y__"),
                     ylag.alias("__x__"), dy.alias("__t__"))
    dlag = F.lag(F.col("__t__"), 1).over(
        Window.partitionBy(*series_cols).orderBy(time_col))
    rows = (base.withColumn("__d__", dlag)
            .where(F.col("__t__").isNotNull()
                   & F.col("__x__").isNotNull()
                   & F.col("__d__").isNotNull()))

    q = quantize
    r = lambda c: F.round(c, q)  # noqa: E731 — the firewall
    x, d, t = F.col("__x__"), F.col("__d__"), F.col("__t__")
    g = rows.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        r(F.sum(x)).alias("sx"), r(F.sum(d)).alias("sd"),
        r(F.sum(t)).alias("st"),
        r(F.sum(x * x)).alias("sxx"), r(F.sum(d * d)).alias("sdd"),
        r(F.sum(x * d)).alias("sxd"),
        r(F.sum(x * t)).alias("sxt"), r(F.sum(d * t)).alias("sdt"),
        r(F.sum(t * t)).alias("stt"))
    g = g.where(F.col("n") >= 10)

    # Cramer's rule on A = [[n,sx,sd],[sx,sxx,sxd],[sd,sxd,sdd]],
    # b = [st,sxt,sdt] — EXACTLY this association order is mirrored in
    # the SQL oracle, so scalar IEEE arithmetic agrees bit for bit
    n, sx, sd = F.col("n"), F.col("sx"), F.col("sd")
    st, sxx, sdd = F.col("st"), F.col("sxx"), F.col("sdd")
    sxd, sxt, sdt, stt = (F.col("sxd"), F.col("sxt"), F.col("sdt"),
                          F.col("stt"))
    det = (n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
           + sd * (sx * sxd - sxx * sd))
    alpha = (st * (sxx * sdd - sxd * sxd) - sx * (sxt * sdd - sxd * sdt)
             + sd * (sxt * sxd - sxx * sdt)) / det
    beta = (n * (sxt * sdd - sdt * sxd) - st * (sx * sdd - sxd * sd)
            + sd * (sx * sdt - sxt * sd)) / det
    gamma = (n * (sxx * sdt - sxd * sxt) - sx * (sx * sdt - sxt * sd)
             + st * (sx * sxd - sxx * sd)) / det
    g = g.withColumn("__a__", alpha).withColumn("__b__", beta) \
         .withColumn("__g__", gamma)
    a_, b_, g_ = F.col("__a__"), F.col("__b__"), F.col("__g__")
    rss = stt - (a_ * st + b_ * sxt + g_ * sdt)
    s2 = rss / (n - F.lit(3.0))
    inv11 = (n * sdd - sd * sd) / det  # [(Z'Z)^-1] on the y_{t-1} term
    tau = b_ / F.sqrt(s2 * inv11)
    out = g.select(
        *series_cols,
        F.col("n").cast("long").alias("n_obs"),
        b_.alias("beta"), tau.alias("tau"),
        _cv("1pct", n).alias("cv_1pct"), _cv("5pct", n).alias("cv_5pct"),
        _cv("10pct", n).alias("cv_10pct"))
    return out.withColumn("stationary_5pct",
                          (F.col("tau") < F.col("cv_5pct")))


#: KPSS asymptotic critical values, level-stationarity (constant) case —
#: Kwiatkowski-Phillips-Schmidt-Shin (1992), Table 1
KPSS_CRIT_CONST = {"1pct": 0.739, "5pct": 0.463, "10pct": 0.347}


def kpss_test(df: DataFrame, time_col: str, value_col: str,
              series_cols: Sequence[str], quantize: int = 7) -> DataFrame:
    """KPSS level-stationarity test per series — the standard complement
    to :func:`adf_test` (null hypotheses are REVERSED: KPSS's null is
    stationarity, so ``adf rejects + kpss fails to reject`` is the
    confident "no differencing needed" verdict):

        eta = sum_t S_t^2 / (T^2 * s2_lr)

    with ``S_t`` the partial sums of the demeaned series and ``s2_lr``
    the Bartlett-weighted long-run variance at the classic KPSS
    bandwidth ``l4 = floor(4*(T/100)^0.25)``.

    Plan: demeaning and partial sums are window functions over the
    series key; the lag covariances come from ONE band self-join
    (``1 <= rn_a - rn_b <= l``, at most ``l`` partners per row — cost
    T·l per series, never T²).  Everything Catalyst; the determinism
    firewall rounds the mean, the demeaned values, and every aggregate
    to ``quantize`` decimals so the SQL replay is exact.

    Returns ``(series..., n_obs, eta, lags, cv_1pct, cv_5pct, cv_10pct,
    stationary_5pct)`` where ``stationary_5pct`` means eta BELOW the 5%
    critical value (fail to reject stationarity)."""
    series_cols = list(series_cols)
    q = quantize
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    wfull = (Window.partitionBy(*series_cols)
             .orderBy(time_col)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    y = F.col(value_col).cast("double")
    base = df.select(
        *series_cols,
        F.row_number().over(w).alias("__rn__"),
        F.round(y - F.round(F.avg(y).over(wfull), q), q).alias("__e__"),
        F.count(F.lit(1)).over(wfull).alias("__T__"))
    base = base.withColumn(
        "__S__",
        F.sum("__e__").over(
            Window.partitionBy(*series_cols).orderBy("__rn__")
            .rowsBetween(Window.unboundedPreceding, 0)))
    base = base.where(F.col("__T__") >= 10)

    num = (base.groupBy(*series_cols)
           .agg(F.round(F.sum(F.col("__S__") * F.col("__S__")), q)
                .alias("ssq"),
                F.round(F.sum(F.col("__e__") * F.col("__e__")), q)
                .alias("g0"),
                F.max("__T__").cast("double").alias("T"),
                F.floor(F.lit(4.0)
                        * F.pow(F.max("__T__") / F.lit(100.0),
                                F.lit(0.25))).cast("int").alias("l")))

    # each LEFT row explodes to its l lag offsets and equi-joins the
    # partner at rn - j: the intermediate is T*l rows per series, never
    # the T^2 a key-only self-join + range filter would materialize
    a = (base.join(num.select(*series_cols, "l"), series_cols)
         .withColumn("j", F.explode(F.sequence(F.lit(1), F.col("l"))))
         .select(*series_cols, "j",
                 (F.col("__rn__") - F.col("j")).alias("rn_b"),
                 F.col("__e__").alias("e_a")))
    b = base.select(*series_cols, F.col("__rn__").alias("rn_b"),
                    F.col("__e__").alias("e_b"))
    lags = (a.join(b, series_cols + ["rn_b"])
            .groupBy(*series_cols, "j")
            .agg(F.round(F.sum(F.col("e_a") * F.col("e_b")), q)
                 .alias("gj")))
    wsum = (lags.join(num.select(*series_cols, "l", "T"), series_cols)
            .groupBy(*series_cols)
            .agg(F.round(F.sum(
                (F.lit(1.0) - F.col("j") / (F.col("l") + F.lit(1.0)))
                * F.col("gj")), q).alias("wg")))

    g = (num.join(wsum, series_cols, "left")
         .withColumn("wg", F.coalesce("wg", F.lit(0.0))))
    s2lr = (F.col("g0") + F.lit(2.0) * F.col("wg")) / F.col("T")
    eta = (F.col("ssq") / (F.col("T") * F.col("T"))) / s2lr
    out = g.select(
        *series_cols, F.col("T").cast("long").alias("n_obs"),
        eta.alias("eta"), F.col("l").alias("lags"),
        F.lit(KPSS_CRIT_CONST["1pct"]).alias("cv_1pct"),
        F.lit(KPSS_CRIT_CONST["5pct"]).alias("cv_5pct"),
        F.lit(KPSS_CRIT_CONST["10pct"]).alias("cv_10pct"))
    return out.withColumn("stationary_5pct",
                          F.col("eta") < F.col("cv_5pct"))


def ljung_box(df: DataFrame, time_col: str, value_col: str,
              series_cols: Sequence[str], lags: int = 10,
              quantize: int = 7) -> DataFrame:
    """Ljung-Box portmanteau white-noise test per series:

        Q = n(n+2) * sum_{k=1..h} acf_k^2 / (n-k)

    against chi-square with ``h`` dof — the standard residual-
    diagnostics step after any model fit (is what's left just noise?).

    ``lags`` must be EVEN: the chi-square survival function with an
    integer shape ``h/2`` has the CLOSED FORM
    ``p = exp(-Q/2) * sum_{j<h/2} (Q/2)^j / j!`` — a finite polynomial
    both engines replay exactly, no special-function library.

    Plan: one band self-join computes the autocovariances (the same
    shape the ACF oracle uses — at most ``lags`` partners per row),
    everything else is per-series scalar algebra; pure Catalyst,
    ``quantize`` rounds the acf before squaring (the firewall).
    Series shorter than ``lags + 1`` are dropped."""
    import math

    if lags % 2 != 0:
        raise ValueError("lags must be even (closed-form chi-square)")
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    wfull = Window.partitionBy(*series_cols)
    y = F.col(value_col).cast("double")
    # lag products UNROLLED as window expressions (h is a small fixed
    # constant): one window pass + one groupBy, exchanges=1 — an
    # earlier band self-join shape joined the series to itself on the
    # key alone, a T^2-per-series intermediate before the range filter
    s = df.select(*series_cols, F.col(time_col),
                  (y - F.avg(y).over(wfull)).alias("xd"),
                  F.count(F.lit(1)).over(wfull).alias("n"))
    s = s.select(*series_cols, "n",
                 *[(F.col("xd") * F.lag("xd", k).over(w))
                   .alias(f"__p{k}__") for k in range(0, lags + 1)])
    g = s.groupBy(*series_cols).agg(
        F.max("n").cast("double").alias("n"),
        *[F.sum(f"__p{k}__").alias(f"__sp{k}__")
          for k in range(0, lags + 1)])
    g = g.where(F.col("n") > lags)
    n = F.col("n")
    ssum = None
    for k in range(1, lags + 1):
        acf_k = F.round(F.col(f"__sp{k}__") / F.col("__sp0__"), quantize)
        term = acf_k * acf_k / (n - F.lit(float(k)))
        ssum = term if ssum is None else ssum + term
    q_stat = n * (n + F.lit(2.0)) * ssum
    g = g.withColumn("q_stat", q_stat)
    half = F.col("q_stat") / F.lit(2.0)
    shape = lags // 2
    # closed-form chi2 survival: exp(-Q/2) * sum_{j<shape} (Q/2)^j / j!
    terms = [F.pow(half, F.lit(float(j))) / F.lit(float(math.factorial(j)))
             for j in range(shape)]
    psum = terms[0]
    for t in terms[1:]:
        psum = psum + t
    p = F.exp(-half) * psum
    out = g.select(*series_cols, n.cast("long").alias("n_obs"),
                   F.col("q_stat"), F.lit(lags).alias("df"),
                   p.alias("p_value"))
    return out.withColumn("white_noise_5pct", F.col("p_value") > 0.05)


#: MacKinnon (2010) response-surface rows for the Engle-Granger residual
#: DF test, two variables (N=2), constant case
MACKINNON_2010_N2 = {
    "1pct": (-3.89644, -10.9519, -22.527),
    "5pct": (-3.33613, -6.1101, -6.823),
    "10pct": (-3.04445, -4.2412, -2.720),
}


def engle_granger(df: DataFrame, time_col: str, y_col: str, x_col: str,
                  series_cols: Sequence[str],
                  quantize: int = 7) -> DataFrame:
    """Engle-Granger two-step cointegration test per series: OLS of
    ``y`` on ``(1, x)``, then a Dickey-Fuller regression (no constant,
    no augmented lag) on the residuals — tau more negative than the
    MacKinnon N=2 critical value means the pair shares a common
    stochastic trend (cointegrated), the precondition for
    error-correction modeling of co-moving series.

    Plan: step-1 sums are unbounded-window aggregates over the series
    key, so the residuals are computed per row WITHOUT a join back;
    step-2 is one groupBy of three more sums and scalar algebra.  Pure
    Catalyst; the ``quantize`` firewall rounds every aggregate and the
    step-1 coefficients.

    Returns ``(series..., n_obs, beta, tau, cv_1pct, cv_5pct, cv_10pct,
    cointegrated_5pct)``."""
    series_cols = list(series_cols)
    q = quantize
    wfull = Window.partitionBy(*series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    rows = df.where(y.isNotNull() & x.isNotNull())
    n = F.count(F.lit(1)).over(wfull).cast("double")
    sx = F.round(F.sum(x).over(wfull), q)
    sy = F.round(F.sum(y).over(wfull), q)
    sxx = F.round(F.sum(x * x).over(wfull), q)
    sxy = F.round(F.sum(x * y).over(wfull), q)
    b_raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b = F.round(b_raw, q)
    a = F.round((sy - b * sx) / n, q)
    # residuals use the ROUNDED coefficients (the firewall); the
    # reported beta is the raw quotient of already-rounded sums —
    # displaying round6(round7(x)) would re-introduce the decimal
    # double-rounding boundary the firewall exists to avoid
    base = rows.select(*series_cols, F.col(time_col),
                       F.round(y - (a + b * x), q).alias("__u__"),
                       b_raw.alias("__beta__"), n.alias("__n__"))
    ul = F.lag(F.col("__u__"), 1).over(w)
    du = F.col("__u__") - ul
    step2 = (base.select(*series_cols, "__beta__", "__n__",
                         ul.alias("__ul__"), du.alias("__du__"))
             .where(F.col("__ul__").isNotNull()))
    g = step2.groupBy(*series_cols).agg(
        F.max("__beta__").alias("beta"),
        F.count(F.lit(1)).cast("double").alias("m"),
        F.round(F.sum(F.col("__ul__") * F.col("__du__")), q).alias("sud"),
        F.round(F.sum(F.col("__ul__") * F.col("__ul__")), q).alias("suu"),
        F.round(F.sum(F.col("__du__") * F.col("__du__")), q).alias("sdd"))
    g = g.where(F.col("m") >= 10)
    rho = F.col("sud") / F.col("suu")
    rss = F.col("sdd") - rho * F.col("sud")
    s2 = rss / (F.col("m") - F.lit(1.0))
    tau = rho / F.sqrt(s2 / F.col("suu"))
    T = F.col("m")

    def cv(level):
        b0, b1, b2 = MACKINNON_2010_N2[level]
        return F.lit(b0) + F.lit(b1) / T + F.lit(b2) / (T * T)

    out = g.select(*series_cols, F.col("m").cast("long").alias("n_obs"),
                   "beta", tau.alias("tau"),
                   cv("1pct").alias("cv_1pct"),
                   cv("5pct").alias("cv_5pct"),
                   cv("10pct").alias("cv_10pct"))
    return out.withColumn("cointegrated_5pct",
                          F.col("tau") < F.col("cv_5pct"))


def gap_profile(df: DataFrame, time_col: str,
                series_cols: Sequence[str]) -> DataFrame:
    """Per-series sampling-gap / missing-data profile — the data-quality
    triage before interpolation or model fitting: median and max
    inter-observation gap, an estimate of MISSING grid points (each gap
    contributes ``round(gap/median) - 1`` skipped slots), and the
    resulting coverage ratio.

    Plan: one lag window for the gaps, one groupBy with an exact median
    (``percentile`` — the profiler grain is per series, where exact is
    affordable; swap ``percentile_approx`` for billion-row series), and
    one skinny self-join to score each gap against its series' median.
    Pure Catalyst."""
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    gaps = (df.select(*series_cols, time_col)
            .withColumn("__g__", (us - F.lag(us, 1).over(w))
                        / F.lit(1e6))
            .where(F.col("__g__").isNotNull()))
    # LOWER median — an exact data element, no midpoint interpolation:
    # gaps are micro-second multiples, so an interpolated even-n median
    # lands exactly on a half-microsecond (a decimal .5 at the 7th
    # digit) and the two engines' rounding would systematically diverge
    wg = Window.partitionBy(*series_cols).orderBy("__g__")
    ranked = gaps.withColumn("__rk__", F.row_number().over(wg))         .withColumn("__ng__", F.count(F.lit(1)).over(
            Window.partitionBy(*series_cols)))
    med = ranked.groupBy(*series_cols).agg(
        F.max(F.when(F.col("__rk__")
                     == F.floor((F.col("__ng__") + 1) / 2),
                     F.col("__g__"))).alias("median_gap_s"),
        F.max("__g__").alias("max_gap_s"),
        F.count(F.lit(1)).alias("n_gaps"))
    scored = (gaps.join(med, series_cols)
              .groupBy(*series_cols)
              .agg(F.sum(F.greatest(
                  F.round(F.col("__g__") / F.col("median_gap_s"), 0)
                  - 1, F.lit(0.0))).cast("long").alias("missing_est")))
    out = med.join(scored, series_cols)
    n_obs = F.col("n_gaps") + 1
    return out.select(
        *series_cols, n_obs.cast("long").alias("n_obs"),
        F.col("n_gaps").cast("long").alias("n_gaps"),
        "median_gap_s", "max_gap_s", "missing_est",
        (n_obs / (n_obs + F.col("missing_est"))).alias("coverage"))


def winsorize(df: DataFrame, value_col: str, series_cols: Sequence[str],
              lower: float = 0.01, upper: float = 0.99,
              out_col: str = None) -> DataFrame:
    """Per-series winsorization: clamp ``value_col`` to its series'
    [lower, upper] quantile ELEMENTS (lower-element convention, same
    engine-portable selection as :func:`gap_profile` — no interpolated
    midpoints) and flag clamped rows — the robust-preprocessing step
    before model fitting when sensors spike.

    One window pass (rank + count per series), one groupBy for the two
    bounds, one broadcast-friendly skinny join back.  Adds
    ``{out}_winsorized`` and ``{out}_clamped``; original rows and
    columns pass through."""
    series_cols = list(series_cols)
    out = out_col or value_col
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*series_cols).orderBy(v)
    wf = Window.partitionBy(*series_cols)
    ranked = df.withColumn("__rk__", F.row_number().over(w)) \
        .withColumn("__n__", F.count(F.lit(1)).over(wf))
    lo_idx = F.greatest(F.floor(F.col("__n__") * lower), F.lit(1))
    hi_idx = F.least(F.ceil(F.col("__n__") * upper), F.col("__n__"))
    bounds = (ranked.groupBy(*series_cols).agg(
        F.max(F.when(F.col("__rk__") == lo_idx, v)).alias("__lo__"),
        F.max(F.when(F.col("__rk__") == hi_idx, v)).alias("__hi__")))
    joined = ranked.drop("__rk__", "__n__").join(bounds, series_cols)
    clamped = F.least(F.greatest(v, F.col("__lo__")), F.col("__hi__"))
    return (joined
            .withColumn(f"{out}_winsorized", clamped)
            .withColumn(f"{out}_clamped", clamped != v)
            .drop("__lo__", "__hi__"))


def ecm_fit(df: DataFrame, time_col: str, y_col: str, x_col: str,
            series_cols: Sequence[str], quantize: int = 7) -> DataFrame:
    """Error-correction model per series — the modeling step that
    FOLLOWS a positive :func:`engle_granger` verdict:

        Δy_t = α + γ·u_{t-1} + β·Δx_t + ε_t

    with ``u`` the cointegrating residual.  ``γ`` (the error-correction
    speed) must be negative for a valid ECM — each period closes a
    ``-γ`` fraction of the gap to the long-run relation; ``β`` is the
    short-run pass-through.

    Plan identical to :func:`adf_test`: step-1 residuals via unbounded
    window sums (no join back), then one groupBy of Gram sums and
    closed-form Cramer algebra, all rounded at ``quantize``.  Returns
    ``(series..., n_obs, alpha, ec_gamma, beta_dx, ec_valid)`` where
    ``ec_valid`` means γ < 0."""
    series_cols = list(series_cols)
    q = quantize
    wfull = Window.partitionBy(*series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    rows = df.where(y.isNotNull() & x.isNotNull())
    n1 = F.count(F.lit(1)).over(wfull).cast("double")
    sx1 = F.round(F.sum(x).over(wfull), q)
    sy1 = F.round(F.sum(y).over(wfull), q)
    sxx1 = F.round(F.sum(x * x).over(wfull), q)
    sxy1 = F.round(F.sum(x * y).over(wfull), q)
    b1 = F.round((n1 * sxy1 - sx1 * sy1) / (n1 * sxx1 - sx1 * sx1), q)
    a1 = F.round((sy1 - b1 * sx1) / n1, q)
    base = rows.select(*series_cols, F.col(time_col),
                       y.alias("__y__"), x.alias("__x__"),
                       F.round(y - (a1 + b1 * x), q).alias("__u__"))
    step = base.select(
        *series_cols,
        (F.col("__y__") - F.lag("__y__", 1).over(w)).alias("__t__"),
        (F.col("__x__") - F.lag("__x__", 1).over(w)).alias("__d__"),
        F.lag("__u__", 1).over(w).alias("__e__"))
    step = step.where(F.col("__t__").isNotNull()
                      & F.col("__d__").isNotNull()
                      & F.col("__e__").isNotNull())
    r = lambda c: F.round(c, q)  # noqa: E731
    e, d, t = F.col("__e__"), F.col("__d__"), F.col("__t__")
    g = step.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        r(F.sum(e)).alias("sx"), r(F.sum(d)).alias("sd"),
        r(F.sum(t)).alias("st"),
        r(F.sum(e * e)).alias("sxx"), r(F.sum(d * d)).alias("sdd"),
        r(F.sum(e * d)).alias("sxd"),
        r(F.sum(e * t)).alias("sxt"), r(F.sum(d * t)).alias("sdt"))
    g = g.where(F.col("n") >= 10)
    # identical Cramer layout to adf_test (A rows: const, u_{t-1}, Δx)
    n, sx, sd = F.col("n"), F.col("sx"), F.col("sd")
    st, sxx, sdd = F.col("st"), F.col("sxx"), F.col("sdd")
    sxd, sxt, sdt = F.col("sxd"), F.col("sxt"), F.col("sdt")
    det = (n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
           + sd * (sx * sxd - sxx * sd))
    alpha = (st * (sxx * sdd - sxd * sxd) - sx * (sxt * sdd - sxd * sdt)
             + sd * (sxt * sxd - sxx * sdt)) / det
    gamma = (n * (sxt * sdd - sdt * sxd) - st * (sx * sdd - sxd * sd)
             + sd * (sx * sdt - sxt * sd)) / det
    beta = (n * (sxx * sdt - sxd * sxt) - sx * (sx * sdt - sxt * sd)
            + st * (sx * sxd - sxx * sd)) / det
    out = g.select(*series_cols, F.col("n").cast("long").alias("n_obs"),
                   alpha.alias("alpha"), gamma.alias("ec_gamma"),
                   beta.alias("beta_dx"))
    return out.withColumn("ec_valid", F.col("ec_gamma") < 0)


def hurst_rs(df: DataFrame, time_col: str, value_col: str,
             series_cols: Sequence[str], min_n: int = 8) -> DataFrame:
    """Single-scale rescaled-range (R/S) Hurst estimate per series
    (Hurst 1951; Mandelbrot & Wallis 1969): over the whole series,

        ``R = max_t(cumdev_t) − min_t(cumdev_t)``,  ``S = σ_pop(y)``,
        ``H ≈ ln(R/S) / ln(n)``

    with ``cumdev_t = Σ_{i≤t} (y_i − ȳ)`` — H ≈ 0.5 for a random walk
    of increments, > 0.5 persistent (trending), < 0.5 anti-persistent
    (mean-reverting).  The single-scale estimate is the screening form
    (the multi-scale regression refines it); it is what a monitoring
    fleet computes per metric to route series to the right forecaster.

    Plan: one partition-window mean, one ordered running sum, one
    per-series aggregate — exchanges = 1, no UDF.  Determinism: the
    deviations are rounded 6 dp at SOURCE (the cusum firewall) so the
    running sum is identical on both engines; R and S are rounded 6 dp
    before the log ratio.  Series need ``n ≥ min_n``, ``S > 0`` and
    ``R > 0``."""
    series_cols = list(series_cols)
    pw = Window.partitionBy(*series_cols)
    ow = (pw.orderBy(F.col(time_col).asc(),
                     F.col(value_col).asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    y = F.col(value_col).cast("double")
    base = df.where(y.isNotNull())
    # round the MEAN first, then the deviation: an engine ulp wobble in
    # avg() otherwise shifts every deviation's 6-dp rounding boundary
    # (observed once at sf0.01 — R flipped in the 6th decimal)
    d = F.round(y - F.round(F.avg(y).over(pw), 6), 6)
    base = (base.withColumn("__d__", d)
            .withColumn("__cum__", F.sum("__d__").over(ow)))
    g = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.max("__cum__").alias("__mx__"),
        F.min("__cum__").alias("__mn__"),
        F.stddev_pop(y).alias("__sd__"))
    r_ = F.round(F.col("__mx__") - F.col("__mn__"), 6)
    s_ = F.round(F.col("__sd__"), 6)
    g = (g.withColumn("__r__", r_).withColumn("__s__", s_)
         .where((F.col("__n__") >= min_n) & (F.col("__s__") > 0)
                & (F.col("__r__") > 0)))
    h = (F.log(F.col("__r__") / F.col("__s__"))
         / F.log(F.col("__n__").cast("double")))
    return g.select(
        *series_cols, F.col("__n__").cast("long").alias("n_obs"),
        F.col("__r__").alias("rs_range"),
        F.col("__s__").alias("rs_std"),
        F.round(h, 6).alias("hurst"))


__all__.append("hurst_rs")


def conformal_ar1_interval(df: DataFrame, time_col: str, value_col: str,
                           series_cols: Sequence[str],
                           alpha: float = 0.1, train_frac: float = 0.8,
                           min_train: int = 10, min_cal: int = 5,
                           quantize: int = 7) -> DataFrame:
    """Split-conformal one-step prediction interval per series
    (Vovk et al. 2005; Lei et al. 2018): fit AR(1) by closed-form OLS
    on the first ``train_frac`` of the series, score absolute one-step
    residuals on the held-out calibration tail, and take the
    ``⌈(1−α)(m+1)⌉``-th smallest residual as the interval half-width —
    a DISTRIBUTION-FREE ≥(1−α) coverage guarantee, no Gaussian
    assumption (the honest alternative to the ARIMA ±z·σ bands when
    residuals are fat-tailed).

    Output: ``(series..., n_obs, n_cal, fc1, q_hat, lo, hi)`` — the
    one-step forecast from the last observation with its conformal
    band.  Series needing ``≥ min_train`` train pairs and ``≥ min_cal``
    calibration points; degenerate fits (zero lag variance) drop.

    Plan: ordered windows for (t, n, lag), one train-pair Gram
    aggregation (Cramer closed form over ``quantize``-rounded sums —
    the ADF firewall), one calibration aggregation collecting the
    sorted residual array (bounded by the series length), two
    broadcast-size joins on the series key; exchanges stay on the
    series-key partitioning throughout.  The quantile is an exact
    ELEMENT selection; ``⌈·⌉`` evaluates on the identical IEEE product
    in both engines."""
    series_cols = list(series_cols)
    pw = Window.partitionBy(*series_cols)
    ow = pw.orderBy(F.col(time_col).asc())
    y = F.col(value_col).cast("double")
    base = (df.where(y.isNotNull())
            .select(*series_cols, F.col(time_col), y.alias("__y__"))
            .withColumn("__t__", F.row_number().over(ow))
            .withColumn("__n__", F.count(F.lit(1)).over(pw))
            .withColumn("__lag__", F.lag("__y__", 1).over(ow)))
    ntr = F.floor(F.col("__n__").cast("double") * F.lit(float(train_frac)))
    base = base.withColumn("__ntr__", ntr)

    q = quantize
    r = lambda c: F.round(c, q)  # noqa: E731 — the firewall
    train = base.where((F.col("__t__") >= 2)
                       & (F.col("__t__") <= F.col("__ntr__")))
    fit = train.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__m__"),
        r(F.sum("__lag__")).alias("__sx__"),
        r(F.sum("__y__")).alias("__sy__"),
        r(F.sum(F.col("__lag__") * F.col("__y__"))).alias("__sxy__"),
        r(F.sum(F.col("__lag__") * F.col("__lag__"))).alias("__sxx__"))
    m, sx, sy = F.col("__m__"), F.col("__sx__"), F.col("__sy__")
    sxy, sxx = F.col("__sxy__"), F.col("__sxx__")
    det = m * sxx - sx * sx
    fit = (fit.where((F.col("__m__") >= min_train) & (det != 0))
           .withColumn("__phi__", (m * sxy - sx * sy) / det))
    fit = fit.withColumn("__c__", (sy - F.col("__phi__") * sx) / m) \
             .select(*series_cols, "__m__", "__phi__", "__c__")

    cal = (base.where(F.col("__t__") > F.col("__ntr__"))
           .where(F.col("__lag__").isNotNull())
           .join(fit, on=series_cols, how="inner"))
    resid = r(F.abs(F.col("__y__")
                    - (F.col("__c__")
                       + F.col("__phi__") * F.col("__lag__"))))
    calagg = (cal.withColumn("__r__", resid)
              .groupBy(*series_cols)
              .agg(F.count(F.lit(1)).alias("__mc__"),
                   F.sort_array(F.collect_list("__r__"))
                   .alias("__rs__")))
    calagg = calagg.where(F.col("__mc__") >= min_cal)
    qidx = F.least(
        F.ceil(F.lit(1.0 - float(alpha))
               * (F.col("__mc__").cast("double") + 1)).cast("int"),
        F.col("__mc__").cast("int"))
    calagg = calagg.withColumn(
        "__q__", F.element_at("__rs__", qidx))

    last = (base.where(F.col("__t__") == F.col("__n__"))
            .select(*series_cols, F.col("__y__").alias("__ylast__"),
                    F.col("__n__")))
    out = (last.join(fit, on=series_cols, how="inner")
           .join(calagg, on=series_cols, how="inner"))
    fc1 = F.col("__c__") + F.col("__phi__") * F.col("__ylast__")
    out = out.withColumn("__fc__", fc1)
    # outputs ship UNROUNDED: fc/q are derived from quantized sums and
    # element selection with one shared IEEE association, so the doubles
    # are bit-identical on every engine — while round(.,6) of the
    # 7dp-grid quantile element lands exactly on 6dp half-boundaries
    # (decimal HALF_UP vs binary rounding diverge; seen at sf0.1)
    return out.select(
        *series_cols,
        F.col("__n__").cast("long").alias("n_obs"),
        F.col("__mc__").cast("long").alias("n_cal"),
        F.col("__fc__").alias("fc1"),
        F.col("__q__").alias("q_hat"),
        (F.col("__fc__") - F.col("__q__")).alias("lo"),
        (F.col("__fc__") + F.col("__q__")).alias("hi"))


__all__.append("conformal_ar1_interval")


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  series_cols: Sequence[str],
                  min_n: int = 8) -> DataFrame:
    """Spearman rank correlation between two columns per series:
    ``(series..., n_obs, spearman)`` — the monotone-association
    companion to the Pearson paths (``ccf``, ``rolling_corr``):
    robust to outliers and nonlinearity, the right screen before
    fitting anything linear.

    Bit-exact design: average ranks (min-rank + (ties−1)/2) are exact
    half-integers; the Pearson-on-ranks closed form

        ``r = (n·ΣRxRy − ΣRx·ΣRy) / √((n·ΣRx²−(ΣRx)²)(n·ΣRy²−(ΣRy)²))``

    sums only half-integer products far below 2^53 — EXACT doubles in
    any aggregation order, so the one rounding (6 dp, after the final
    division) is cosmetic, not a firewall.  Rows where either column
    is NULL are dropped pairwise; zero rank variance (all ties) yields
    NULL.  One series-key shuffle: two rank windows + one groupBy."""
    series_cols = list(series_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = (df.where(x.isNotNull() & y.isNotNull())
            .select(*series_cols, x.alias("__x__"), y.alias("__y__")))

    def avg_rank(col_name):
        rk = F.rank().over(Window.partitionBy(*series_cols)
                           .orderBy(F.col(col_name).asc()))
        ties = F.count(F.lit(1)).over(
            Window.partitionBy(*series_cols, F.col(col_name)))
        return rk + (ties - F.lit(1)) / F.lit(2.0)

    ranked = (base.withColumn("__rx__", avg_rank("__x__"))
              .withColumn("__ry__", avg_rank("__y__")))
    g = ranked.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__rx__").alias("__sx__"),
        F.sum("__ry__").alias("__sy__"),
        F.sum(F.col("__rx__") * F.col("__rx__")).alias("__sxx__"),
        F.sum(F.col("__ry__") * F.col("__ry__")).alias("__syy__"),
        F.sum(F.col("__rx__") * F.col("__ry__")).alias("__sxy__"))
    n = F.col("n_obs").cast("double")
    num = n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    vx = n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    vy = n * F.col("__syy__") - F.col("__sy__") * F.col("__sy__")
    r = F.when((vx > 0) & (vy > 0),
               F.round(num / F.sqrt(vx * vy), 6))
    return (g.where(F.col("n_obs") >= F.lit(min_n))
            .select(*series_cols, F.col("n_obs").cast("long")
                    .alias("n_obs"), r.alias("spearman")))


__all__.append("spearman_corr")


def mann_whitney(df: DataFrame, score_units_col: str, label_col: str,
                 group_cols: Sequence[str], min_each: int = 8) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum two-sample test per group:
    ``(group..., n_pos, n_neg, u_stat, auc, z, significant_5pct)`` —
    the distribution-free "do these two samples come from the same
    distribution?" test (Mann & Whitney 1947), with the tie-corrected
    normal approximation:

        U = ΣR⁺ − n⁺(n⁺+1)/2,   E[U] = n⁺n⁻/2,
        Var[U] = (n⁺n⁻/12)·(n+1 − Σ(t³−t)/(n(n−1)))

    (t = size of each tied value group).  ``auc = U/(n⁺n⁻)`` is the
    common-language effect size, the same quantity
    :func:`classifier.rank_auc` reports.

    Determinism: the score must be an exact INTEGER-unit column
    (quantize at source); average ranks ride as BIGINT doubled-ranks,
    the tie sum ``Σ(t³−t)`` is BIGINT-exact, and U/z are fixed-order
    double combinations — bit-identical cross-engine.  One rank window
    + one tie groupBy + one group rollup, all on the group key."""
    group_cols = list(group_cols)
    su = F.col(score_units_col)
    y = F.col(label_col).cast("boolean")
    base = (df.select(*group_cols, su.alias("__su__"), y.alias("__y__"))
            .where(su.isNotNull() & y.isNotNull()))
    w = Window.partitionBy(*group_cols).orderBy("__su__")
    tw = Window.partitionBy(*group_cols, "__su__")
    tcnt = F.count(F.lit(1)).over(tw).cast("bigint")
    rk2 = (F.lit(2).cast("bigint") * F.rank().over(w).cast("bigint")
           + (tcnt - 1))
    b = base.withColumn("__rk2__", rk2).withColumn("__t__", tcnt)
    # per-group tie sum Σ(t³−t) folds into the row aggregate as
    # Σ_rows(t²−1): each size-t tie group contributes t rows of t²−1
    g = b.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__"),
        F.sum(F.when(F.col("__y__"), 1).otherwise(0)).cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("__y__"), F.col("__rk2__"))).cast("bigint")
        .alias("__s2__"),
        F.sum(F.col("__t__") * F.col("__t__") - 1).cast("bigint")
        .alias("__T__"))
    n1 = F.col("n_pos")
    n2 = F.col("__n__") - n1
    nd = F.col("__n__").cast("double")
    u = (F.col("__s2__").cast("double") / F.lit(2.0)
         - (n1 * (n1 + 1)).cast("double") / F.lit(2.0))
    mu = (n1 * n2).cast("double") / F.lit(2.0)
    var = ((n1 * n2).cast("double") / F.lit(12.0)
           * ((nd + 1) - F.col("__T__").cast("double")
              / (nd * (nd - 1))))
    z6 = F.round((u - mu) / F.sqrt(var), 6)
    auc = F.round(u / (n1 * n2).cast("double"), 6)
    return (g.where((n1 >= F.lit(min_each)) & (n2 >= F.lit(min_each))
                    & (var > 0))
            .select(*group_cols, "n_pos",
                    n2.cast("bigint").alias("n_neg"),
                    F.round(u, 1).alias("u_stat"),
                    auc.alias("auc"), z6.alias("z"),
                    (F.abs(z6) > F.lit(1.959964)).alias("significant_5pct")))


def dow_anova(df: DataFrame, time_col: str, value_col: str,
              series_cols: Sequence[str], min_n: int = 50,
              quantize_scale: int = 2) -> DataFrame:
    """One-way ANOVA of value by DAY OF WEEK per series: ``(series...,
    n_obs, f_stat, eta_sq, seasonal_5pct)`` — the significance test
    behind "does this series actually have weekly seasonality?", the
    gate in front of the seasonal decomposition / seasonal-MK tier
    (fitting a 7-phase season to noise manufactures structure).

    ``F = (SSB/(k−1)) / (SSW/(n−k))`` with k = 7 (series missing a
    weekday are dropped — unbalanced-but-present groups are fine,
    absent cells are not); ``eta_sq = SSB/SST`` is the effect size.
    Sums of squares expand to exact BIGINT moments per weekday
    (``n_d, S_d, Q_d`` pivoted to columns, the benford-ladder shape)
    combined in fixed-order double arithmetic: ``SST = Q − S²/n``,
    ``SSB = Σ_d S_d²/n_d − S²/n``.  Verdict compares the 6-dp-rounded
    F to 2.098598 (= χ²₆(5%)/6, the F(6, ∞) 5% point) — a large-n
    approximation (at the default ``min_n`` = 50 the true critical is
    ≈ 2.22, so borderline calls need the emitted F itself).  A series
    with ``SSW = 0`` but ``SSB > 0`` (perfectly weekly-periodic) is
    KEPT and flagged seasonal with a NULL F (the statistic is +∞);
    only zero-total-variance series drop.  Integer-range bound: the
    ``Σu²`` moment needs ``n·(10^s·|value|)² < 2^63`` — rescale
    ``quantize_scale`` down for large-magnitude series.
    One groupBy — one exchange."""
    series_cols = list(series_cols)
    day = F.floor(F.unix_micros(F.col(time_col).cast("timestamp"))
                  / F.lit(86400000000))
    dow = (((day + 3) % 7) + 7) % 7
    u = F.round(F.col(value_col).cast("double")
                * F.lit(float(10 ** quantize_scale))).cast("bigint")
    b = (df.where(F.col(value_col).isNotNull())
         .select(*series_cols, dow.alias("__d__"), u.alias("__u__")))
    aggs = []
    for d in range(7):
        isd = F.col("__d__") == d
        aggs.append(F.sum(F.when(isd, 1).otherwise(0)).cast("bigint")
                    .alias(f"__n{d}__"))
        aggs.append(F.sum(F.when(isd, F.col("__u__"))).alias(f"__s{d}__"))
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    aggs.append(F.sum("__u__").alias("__S__"))
    aggs.append(F.sum(F.col("__u__") * F.col("__u__")).alias("__Q__"))
    g = b.groupBy(*series_cols).agg(*aggs)
    nd = F.col("__n__").cast("double")
    sd = F.col("__S__").cast("double")
    sst = F.col("__Q__").cast("double") - sd * sd / nd
    ssb = F.lit(0.0)
    for d in range(7):
        sdd = F.col(f"__s{d}__").cast("double")
        ssb = ssb + sdd * sdd / F.col(f"__n{d}__").cast("double")
    ssb = ssb - sd * sd / nd
    ssw = sst - ssb
    f_stat = (ssb / F.lit(6.0)) / (ssw / (nd - 7))
    f6 = F.when(ssw > 0, F.round(f_stat, 6))
    present = F.lit(True)
    for d in range(7):
        present = present & (F.col(f"__n{d}__") > 0)
    seasonal = (F.when(ssw > 0, f6 > F.lit(2.098598))
                .otherwise(ssb > 0))
    return (g.where((F.col("__n__") >= F.lit(min_n)) & present)
            .where(sst > 0)
            .select(*series_cols, F.col("__n__").alias("n_obs"),
                    f6.alias("f_stat"),
                    F.round(ssb / sst, 6).alias("eta_sq"),
                    seasonal.alias("seasonal_5pct")))


__all__ += ["mann_whitney", "dow_anova"]


def kruskal_dow(df: DataFrame, time_col: str, value_col: str,
                series_cols: Sequence[str], min_n: int = 50,
                quantize_scale: int = 2) -> DataFrame:
    """Kruskal-Wallis H test of value by DAY OF WEEK per series:
    ``(series..., n_obs, h_stat, seasonal_5pct)`` — the rank-based
    companion to :func:`dow_anova` (Kruskal & Wallis 1952): immune to
    outliers and monotone transforms, the right weekly-seasonality
    gate when the level distribution is heavy-tailed.

        H = [12/(n(n+1))·Σ_d R_d²/n_d − 3(n+1)] / (1 − ΣT/(n³−n))

    with R_d the average-rank sums per weekday and ΣT = Σ(t³−t) the
    tie correction.  Ranks ride as BIGINT doubled-ranks (the spearman
    trick), tie sums are BIGINT-exact, and H is a fixed-order double
    combination; the verdict compares the 6-dp-rounded H to 12.591587
    (χ²(6) 5%) — exact, not an approximation, unlike the ANOVA F's
    large-n critical.  Series missing a weekday are dropped.  One rank
    window + one groupBy on the series key."""
    series_cols = list(series_cols)
    day = F.floor(F.unix_micros(F.col(time_col).cast("timestamp"))
                  / F.lit(86400000000))
    dow = (((day + 3) % 7) + 7) % 7
    u = F.round(F.col(value_col).cast("double")
                * F.lit(float(10 ** quantize_scale))).cast("bigint")
    b = (df.where(F.col(value_col).isNotNull())
         .select(*series_cols, dow.alias("__d__"), u.alias("__u__")))
    w = Window.partitionBy(*series_cols).orderBy("__u__")
    tw = Window.partitionBy(*series_cols, "__u__")
    tcnt = F.count(F.lit(1)).over(tw).cast("bigint")
    rk2 = (F.lit(2).cast("bigint") * F.rank().over(w).cast("bigint")
           + (tcnt - 1))
    b = b.withColumn("__rk2__", rk2).withColumn("__t__", tcnt)
    # Σ(t³−t) as the row-level Σ(t²−1) — no extra rollup + join
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n__"),
            F.sum(F.col("__t__") * F.col("__t__") - 1).cast("bigint")
            .alias("__T__")]
    for d in range(7):
        isd = F.col("__d__") == d
        aggs.append(F.sum(F.when(isd, 1).otherwise(0)).cast("bigint")
                    .alias(f"__n{d}__"))
        aggs.append(F.sum(F.when(isd, F.col("__rk2__"))).cast("bigint")
                    .alias(f"__r{d}__"))
    g = b.groupBy(*series_cols).agg(*aggs)
    nd = F.col("__n__").cast("double")
    acc = F.lit(0.0)
    for d in range(7):
        rd = F.col(f"__r{d}__").cast("double") / F.lit(2.0)
        acc = acc + rd * rd / F.col(f"__n{d}__").cast("double")
    h_raw = (F.lit(12.0) / (nd * (nd + 1)) * acc
             - F.lit(3.0) * (nd + 1))
    corr = (F.lit(1.0) - F.col("__T__").cast("double")
            / (nd * nd * nd - nd))
    h6 = F.round(h_raw / corr, 6)
    present = F.lit(True)
    for d in range(7):
        present = present & (F.col(f"__n{d}__") > 0)
    return (g.where((F.col("__n__") >= F.lit(min_n)) & present
                    & (corr > 0))
            .select(*series_cols, F.col("__n__").alias("n_obs"),
                    h6.alias("h_stat"),
                    (h6 > F.lit(12.591587)).alias("seasonal_5pct")))


__all__.append("kruskal_dow")
