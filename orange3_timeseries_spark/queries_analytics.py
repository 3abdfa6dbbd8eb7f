"""Driver-contract queries for the pandas-UDF analytics tier.

``acf_by_user`` has a full DuckDB oracle: the biased FFT ACF computed by the
NumPy core is cross-checked against a direct self-join autocovariance in
SQL (plus Bartlett confints via a windowed cumulative variance).
``pacf_by_user`` replays the Levinson-Durbin recursion itself as a DuckDB
recursive CTE carrying the phi-coefficient list — also a full value-hash
oracle.  The remaining algorithms (spectral peak picking beyond the
periodogram oracle, Granger F-sf p-values, MA-term forecasts) are not
reasonably SQL-expressible — they are registered without oracles (driver
records a rows-only check) and are covered by the reference-golden pytest
suite instead (tests/test_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.queries import QUERIES, query, r6
from orange3_timeseries_spark.sources import read_table


def _events(spark, sf_dir):
    df = read_table(spark, sf_dir, "events")
    return TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])


@query("acf_by_user", """
WITH s AS (
  SELECT user_id,
         value - avg(value) OVER (PARTITION BY user_id) AS xd,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
p AS (
  SELECT a.user_id, (b.rn - a.rn) AS lag, sum(a.xd * b.xd) AS sp,
         any_value(a.n) AS n
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND b.rn - a.rn BETWEEN 0 AND 20
  GROUP BY 1, 2),
a2 AS (
  SELECT user_id, lag, n,
         sp / first_value(sp) OVER (PARTITION BY user_id ORDER BY lag) AS acf
  FROM p),
c AS (  -- Bartlett: var[k] = (1 + 2*sum_{0<j<k} acf_j^2)/n, 1/n at k=1
  SELECT user_id, lag, n, acf,
         CASE WHEN lag = 0 THEN 0.0
              WHEN lag = 1 THEN 1.0 / n
              ELSE (1 + 2 * coalesce(
                      sum(CASE WHEN lag >= 1 THEN acf * acf END)
                        OVER (PARTITION BY user_id ORDER BY lag
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)) / n
         END AS varacf
  FROM a2)
SELECT user_id, CAST(lag AS INT) AS lag, round(acf, 6) AS acf,
       round(acf - 1.959963986120195 * sqrt(varacf), 6) AS ci_low,
       round(acf + 1.959963986120195 * sqrt(varacf), 6) AS ci_high
FROM c
""")
def q_acf_by_user(spark, sf_dir):
    """Per-series biased ACF with Bartlett 95% confints, lags 0..20 —
    NumPy FFT core under applyInPandas, oracle = direct autocovariance
    self-join + windowed cumulative Bartlett variance."""
    from orange3_timeseries_spark.spark_analytics import acf_table
    out = acf_table(_events(spark, sf_dir), "value", nlags=20, alpha=0.05)
    return out.select("user_id", "lag", r6(F.col("acf"), "acf"),
                      r6(F.col("ci_low"), "ci_low"),
                      r6(F.col("ci_high"), "ci_high"))


@query("pacf_by_user", """
WITH RECURSIVE
s AS (
  SELECT user_id, value - avg(value) OVER (PARTITION BY user_id) AS xd,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
ac AS (  -- biased autocovariance, lags 0..10
  SELECT a.user_id, (b.rn - a.rn) AS lag,
         sum(a.xd * b.xd) / any_value(a.n) AS acov
  FROM s a JOIN s b ON a.user_id = b.user_id AND b.rn - a.rn BETWEEN 0 AND 10
  GROUP BY 1, 2),
acl AS (SELECT user_id, list(acov ORDER BY lag) AS ac FROM ac GROUP BY 1),
ld AS (  -- Levinson-Durbin: k-th step carries phi_{k,1..k} and the
         -- innovation variance den_k; phi lists are 1-indexed
  SELECT user_id, 1 AS k, [ac[2]/ac[1]] AS phi,
         ac[1] * (1 - (ac[2]/ac[1])*(ac[2]/ac[1])) AS den, ac
  FROM acl
  UNION ALL
  SELECT user_id, k + 1 AS k,
         list_append(list_transform(range(1, k+1),
                                    j -> phi[j] - kk * phi[k+1-j]), kk)
             AS phi,
         den * (1 - kk*kk) AS den, ac
  FROM (
    SELECT user_id, k, phi, den, ac,
           (ac[k+2] - coalesce(list_sum(list_transform(range(1, k+1),
                j -> phi[j] * ac[k+2-j])), 0)) / den AS kk
    FROM ld WHERE k < 10) t
)
SELECT user_id, 0 AS lag, 1.0 AS pacf FROM acl
UNION ALL
SELECT user_id, k AS lag, round(phi[k], 6) AS pacf FROM ld
""")
def q_pacf_by_user(spark, sf_dir):
    """Per-series PACF (Levinson-Durbin) — full value-hash oracle: the
    recursion is replayed in DuckDB as a recursive CTE carrying the
    phi-coefficient list (verified element-exact vs the NumPy core);
    also golden-tested on airpassengers in tests/test_analytics.py."""
    from orange3_timeseries_spark.spark_analytics import pacf_table
    out = pacf_table(_events(spark, sf_dir), "value", nlags=10)
    return out.select("user_id", "lag", r6(F.col("pacf"), "pacf"))


_PERIODOGRAM_SQL = """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
d AS (  -- detrend='diff' (reference default), re-indexed 0..m-1
  SELECT user_id, t - 1 AS td, n - 1 AS m,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY t) AS dv
  FROM s
  QUALIFY td >= 0 AND n >= 12),
grid AS (
  SELECT user_id, m, unnest(range(0, m // 2 + 1)) AS k
  FROM (SELECT DISTINCT user_id, m FROM d)),
pw AS (  -- |rfft|^2 as cos/sin sums, one row per (series, frequency bin)
  SELECT d.user_id, g.k, any_value(g.m) AS m,
         pow(sum(d.dv * cos(2 * pi() * g.k * d.td / g.m)), 2)
       + pow(sum(d.dv * sin(2 * pi() * g.k * d.td / g.m)), 2) AS raw
  FROM d JOIN grid g ON d.user_id = g.user_id
  GROUP BY 1, 2),
spec AS (  -- one-sided density: /m, doubled except DC and Nyquist
  SELECT user_id, k, m,
         (raw / m) * (CASE WHEN k = 0 OR (m % 2 = 0 AND k = m // 2)
                           THEN 1 ELSE 2 END) AS p
  FROM pw
  WHERE k >= m // 1000),
scaled AS (  -- min-max scaling (ptp==0 -> divide by 1)
  SELECT user_id, k, m,
         CASE WHEN max(p) OVER w = min(p) OVER w THEN p - min(p) OVER w
              ELSE (p - min(p) OVER w) / (max(p) OVER w - min(p) OVER w)
         END AS sp
  FROM spec WINDOW w AS (PARTITION BY user_id)),
sig AS (  -- strict local maxima, order 5, clip-mode boundaries
  SELECT user_id, k, m, sp,
         max(sp) OVER (PARTITION BY user_id ORDER BY k
                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS lmax,
         max(sp) OVER (PARTITION BY user_id ORDER BY k
                       ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS rmax
  FROM scaled)
SELECT user_id, round(1.0 / (k::DOUBLE / m::DOUBLE), 6) AS period,
       round(sp, 6) AS power
FROM sig WHERE sp > lmax AND sp > rmax
"""


@query("periodogram_by_user", _PERIODOGRAM_SQL)
def q_periodogram_by_user(spark, sf_dir):
    """Per-series significant spectral peaks.  The oracle replays the
    ENTIRE spectral pipeline in SQL — diff detrend, the DFT as per-bin
    cos/sin sums, one-sided density normalization, min-max scaling, and
    the order-5 strict-local-max significance filter (clip-mode
    boundaries = NULL-frame exclusion)."""
    from orange3_timeseries_spark.spark_analytics import periodogram_table
    out = periodogram_table(_events(spark, sf_dir), "value")
    return out.select("user_id", r6(F.col("period"), "period"),
                      r6(F.col("power"), "power"))


@query("seasonal_decompose_daily", """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "Time",
         avg(value) AS v
  FROM events GROUP BY 1),
idx AS (
  SELECT "Time", v,
         row_number() OVER (ORDER BY "Time") - 1 AS t,
         count(*) OVER () AS n
  FROM daily),
tr AS (  -- centered 7-day MA, full windows only
  SELECT *, CASE WHEN t >= 3 AND t <= n - 4 THEN
                 avg(v) OVER (ORDER BY t
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            END AS trend
  FROM idx),
pa AS (  -- zero-mean phase means of the detrended series
  SELECT phase, pavg - avg(pavg) OVER () AS seasonal
  FROM (SELECT t % 7 AS phase, avg(v - trend) AS pavg
        FROM tr WHERE trend IS NOT NULL GROUP BY 1)),
fit AS (  -- linear edge extrapolation from the first/last 3 fitted points
  SELECT (SELECT regr_slope(trend, t) FROM tr WHERE t BETWEEN 3 AND 5) AS kl,
         (SELECT regr_intercept(trend, t) FROM tr
           WHERE t BETWEEN 3 AND 5) AS cl,
         (SELECT regr_slope(trend, t) FROM tr
           WHERE t BETWEEN n - 7 AND n - 5) AS kr,
         (SELECT regr_intercept(trend, t) FROM tr
           WHERE t BETWEEN n - 7 AND n - 5) AS cr),
full_ AS (
  SELECT tr."Time", tr.v, tr.t, tr.n, pa.seasonal,
         CASE WHEN tr.trend IS NOT NULL THEN tr.trend
              WHEN tr.t < 3 THEN f.kl * tr.t + f.cl
              ELSE f.kr * tr.t + f.cr END AS trend_x
  FROM tr JOIN pa ON tr.t % 7 = pa.phase CROSS JOIN fit f)
SELECT "Time", round(v, 6) AS v,
       round(v - seasonal, 6) AS v_adj,
       round(seasonal, 6) AS v_seasonal,
       round(trend_x, 6) AS v_trend,
       round(v - seasonal - trend_x, 6) AS v_residual
FROM full_
""")
def q_seasonal_decompose_daily(spark, sf_dir):
    """Weekly-period classical decomposition of the global daily-mean
    series.  The oracle replays the full classical algorithm in SQL —
    centered MA trend, zero-mean phase means, linear edge extrapolation
    of the trend from the first/last 3 fitted points (``_interp_trend``,
    reference ``functions.py:377-394``), residual against the
    extrapolated trend."""
    from orange3_timeseries_spark.operators.moving_transform import (
        period_aggregation,
    )
    from orange3_timeseries_spark.spark_analytics import seasonal_decompose

    tsf = TimeSeriesFrame(read_table(spark, sf_dir, "events"), time_col="ts")
    daily = period_aggregation(tsf, "Days", [("value", "mean")],
                               names={("value", "mean"): "v"})
    out = seasonal_decompose(daily, ["v"], model="additive", period=7)
    return out.df.select(
        "Time", r6(F.col("v"), "v"),
        r6(F.col("`v (season. adj.)`"), "v_adj"),
        r6(F.col("`v (seasonal)`"), "v_seasonal"),
        r6(F.col("`v (trend)`"), "v_trend"),
        r6(F.col("`v (residual)`"), "v_residual"))


def _granger_search_sql(max_lag=3, alpha=0.1, iters=60):
    """Full Granger first-significant-lag replay: for every ordered pair
    of event-type daily-mean series and every lag 1..max_lag, both
    nested OLS fits' RSS come from Schur-complement Gaussian
    elimination (augment the Gram matrix of [Z | y]; after eliminating
    the regressor columns, the (y, y) entry IS the residual sum of
    squares — no back-substitution), F follows, and the p-value replays
    the engine's own regularized-incomplete-beta continued fraction
    (modified Lentz, ``functions/_extrema.py``) as a recursive CTE with
    a fixed iteration count (both engines converge to < 3e-14, far
    inside the 6-dp hash rounding).  The report row per pair is the
    first lag with p < alpha — exactly ``first_significant_lag``."""
    # one full Lentz iteration (two half-steps), generated textually so
    # the recursive term stays a single SELECT.  mm = fc.m + 1.
    def guard(e):
        return (f"(CASE WHEN abs({e}) < 1e-300 THEN 1e-300 "
                f"ELSE {e} END)")

    mm = "(fc.m + 1)"
    aa1 = (f"({mm} * (fc.bb - {mm}) * fc.xx / "
           f"((fc.aa - 1 + 2*{mm}) * (fc.aa + 2*{mm})))")
    d1 = f"(1.0 / {guard(f'1.0 + {aa1} * fc.d')})"
    c1 = guard(f"1.0 + {aa1} / fc.c")
    h1 = f"(fc.h * {d1} * {c1})"
    aa2 = (f"(-(fc.aa + {mm}) * (fc.aa + fc.bb + {mm}) * fc.xx / "
           f"((fc.aa + 2*{mm}) * (fc.aa + 1 + 2*{mm})))")
    d2 = f"(1.0 / {guard(f'1.0 + {aa2} * {d1}')})"
    c2 = guard(f"1.0 + {aa2} / {c1}")
    h2 = f"({h1} * {d2} * {c2})"
    guard_init = guard("1.0 - (aa + bb) * xx / (aa + 1.0)")

    elim = []
    prev = "gram"
    for k in range(2 * max_lag + 1):  # max unknowns = 1 + 2*max_lag
        cur = f"el{k}"
        # LEFT JOINs: systems whose dimension <= k have no pivot (k,k)
        # and pass through unchanged
        elim.append(f"""{cur} AS MATERIALIZED (
  SELECT t.antecedent, t.consequent, t.lag, t.kind, t.i, t.j,
         CASE WHEN t.i > {k} AND d.a IS NOT NULL
              THEN t.a - f.a / d.a * p.a ELSE t.a END AS a
  FROM {prev} t
  LEFT JOIN (SELECT antecedent, consequent, lag, kind, a FROM {prev}
             WHERE i = {k} AND j = {k}) d
    USING (antecedent, consequent, lag, kind)
  LEFT JOIN (SELECT antecedent, consequent, lag, kind, i, a FROM {prev}
             WHERE j = {k}) f
    ON f.antecedent = t.antecedent AND f.consequent = t.consequent
   AND f.lag = t.lag AND f.kind = t.kind AND f.i = t.i
  LEFT JOIN (SELECT antecedent, consequent, lag, kind, j, a FROM {prev}
             WHERE i = {k}) p
    ON p.antecedent = t.antecedent AND p.consequent = t.consequent
   AND p.lag = t.lag AND p.kind = t.kind AND p.j = t.j)""")
        prev = cur
    elim_sql = ",\n".join(elim)

    return f"""WITH RECURSIVE
d AS (SELECT date_trunc('day', ts) AS day, event_type, avg(value) AS v
      FROM events GROUP BY 1, 2),
ds AS MATERIALIZED (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM d),
pr AS (
  SELECT a.event_type AS antecedent, c.event_type AS consequent
  FROM (SELECT DISTINCT event_type FROM d) a,
       (SELECT DISTINCT event_type FROM d) c
  WHERE a.event_type != c.event_type),
reg AS MATERIALIZED (
  -- long design: i = 0 const, 1..lag consequent lags,
  -- lag+1..2lag antecedent lags (unrestricted only), 7 = target y
  SELECT p.antecedent, p.consequent, lg.lag, k.kind, c0.t, g.i,
         CASE WHEN g.i = 0 THEN 1.0::DOUBLE
              WHEN g.i = 7 THEN c0.v
              WHEN g.i <= lg.lag THEN cl.v
              ELSE al.v END AS x
  FROM pr p
  CROSS JOIN (SELECT unnest(generate_series(1, {max_lag})) AS lag) lg
  CROSS JOIN (SELECT unnest(['r', 'u']) AS kind) k
  JOIN ds c0 ON c0.event_type = p.consequent AND c0.t > lg.lag
  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS i) g
  LEFT JOIN ds cl ON cl.event_type = p.consequent AND cl.t = c0.t - g.i
  LEFT JOIN ds al ON al.event_type = p.antecedent
                 AND al.t = c0.t - (g.i - lg.lag)
  WHERE g.i = 0 OR g.i = 7 OR g.i <= lg.lag
     OR (k.kind = 'u' AND g.i <= 2 * lg.lag)),
gram AS MATERIALIZED (
  SELECT zi.antecedent, zi.consequent, zi.lag, zi.kind,
         zi.i, zj.i AS j, sum(zi.x * zj.x) AS a
  FROM reg zi JOIN reg zj
    ON zi.antecedent = zj.antecedent AND zi.consequent = zj.consequent
   AND zi.lag = zj.lag AND zi.kind = zj.kind AND zi.t = zj.t
  GROUP BY 1, 2, 3, 4, 5, 6),
{elim_sql},
rss AS MATERIALIZED (
  SELECT antecedent, consequent, lag, kind, a AS rss
  FROM {prev} WHERE i = 7 AND j = 7),
ft AS MATERIALIZED (
  SELECT r.antecedent, r.consequent, r.lag,
         nd.nd - r.lag - 2 * r.lag - 1 AS dof,
         (r.rss - u.rss) / r.lag
           / (u.rss / (nd.nd - r.lag - 2 * r.lag - 1)) AS fstat
  FROM rss r
  JOIN rss u ON u.antecedent = r.antecedent
            AND u.consequent = r.consequent AND u.lag = r.lag
            AND u.kind = 'u'
  JOIN (SELECT DISTINCT event_type, nd FROM ds) nd
    ON nd.event_type = r.consequent
  WHERE r.kind = 'r'),
pv0 AS MATERIALIZED (
  -- I_x(a0, b0) with a0 = dof/2, b0 = lag/2, x = dof/(dof + lag*F);
  -- branch per Numerical-Recipes convention, front invariant to the
  -- (a,b,x) <-> (b,a,1-x) swap
  SELECT antecedent, consequent, lag, fstat, dof,
         dof / 2.0 AS a0, lag / 2.0 AS b0,
         dof / (dof + lag * fstat) AS x0
  FROM ft WHERE fstat >= 0 AND isfinite(fstat)),
pvp AS MATERIALIZED (
  SELECT *,
         (x0 < (a0 + 1.0) / (a0 + b0 + 2.0)) AS direct,
         CASE WHEN x0 < (a0 + 1.0) / (a0 + b0 + 2.0)
              THEN a0 ELSE b0 END AS aa,
         CASE WHEN x0 < (a0 + 1.0) / (a0 + b0 + 2.0)
              THEN b0 ELSE a0 END AS bb,
         CASE WHEN x0 < (a0 + 1.0) / (a0 + b0 + 2.0)
              THEN x0 ELSE 1.0 - x0 END AS xx,
         exp(lgamma(a0 + b0) - lgamma(a0) - lgamma(b0)
             + a0 * ln(x0) + b0 * ln(1.0 - x0)) AS front
  FROM pv0 WHERE x0 > 0 AND x0 < 1),
fc AS (  -- modified-Lentz continued fraction, fixed {iters} iterations
  SELECT antecedent, consequent, lag, aa, bb, xx, 0 AS m,
         1.0::DOUBLE AS c,
         1.0 / {guard_init} AS d,
         1.0 / {guard_init} AS h
  FROM pvp
  UNION ALL
  SELECT fc.antecedent, fc.consequent, fc.lag, fc.aa, fc.bb, fc.xx,
         fc.m + 1, {c2}, {d2}, {h2}
  FROM fc WHERE fc.m < {iters}),
pv AS (
  SELECT p.antecedent, p.consequent, p.lag,
         CASE WHEN p.direct THEN p.front * fc.h / p.a0
              ELSE 1.0 - p.front * fc.h / p.b0 END AS pval
  FROM pvp p
  JOIN fc ON fc.antecedent = p.antecedent
         AND fc.consequent = p.consequent AND fc.lag = p.lag
  WHERE fc.m = {iters}
  UNION ALL
  SELECT antecedent, consequent, lag, 1.0 AS pval
  FROM pv0 WHERE x0 >= 1),
sig AS (
  SELECT antecedent, consequent, lag, pval,
         row_number() OVER (PARTITION BY antecedent, consequent
                            ORDER BY lag) AS rk
  FROM pv WHERE isfinite(pval) AND pval < {alpha})
SELECT CAST(lag AS INT) AS lag, round(pval, 6) AS p,
       antecedent, consequent
FROM sig WHERE rk = 1"""


@query("granger_event_types", _granger_search_sql())
def q_granger_event_types(spark, sf_dir):
    """Granger causality between per-event-type daily mean series —
    rows-only check.  Uses the PAIR-parallel plan (each ordered pair is
    its own task) — the per-series plan computes all pairs of one series
    in one task, which serializes for a single wide series; equivalence
    of the two plans is asserted in tests/test_analytics.py."""
    from orange3_timeseries_spark.spark_analytics import (
        granger_causality_pairs,
    )

    ev = read_table(spark, sf_dir, "events")
    # explicit pivot values: without them Spark runs an extra driver-side
    # distinct job over the full table just to discover the columns — a
    # surprise collect at 100 TB.  The event taxonomy is part of the data
    # contract (TESTDATA.md).
    pivoted = (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
               .pivot("event_type",
                      ["click", "error", "purchase", "signup", "view"])
               .agg(F.avg("value")))
    cols = [c for c in pivoted.columns if c != "day"]
    tsf = TimeSeriesFrame(pivoted, time_col="day")
    out = granger_causality_pairs(tsf, cols, max_lag=3, alpha=0.1)
    return out.select("lag", r6(F.col("p"), "p"), "antecedent", "consequent")


@query("granger_f_daily", """
WITH RECURSIVE d AS (
  SELECT date_trunc('day', ts) AS day, event_type, avg(value) AS v
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, day, v,
         lag(v) OVER (PARTITION BY event_type ORDER BY day) AS vlag
  FROM d),
pr AS (
  SELECT a.event_type AS antecedent, c.event_type AS consequent
  FROM (SELECT DISTINCT event_type FROM d) a,
       (SELECT DISTINCT event_type FROM d) c
  WHERE a.event_type != c.event_type),
j AS (
  SELECT pr.antecedent, pr.consequent,
         c.v AS y, c.vlag AS y1, a.vlag AS x1
  FROM pr
  JOIN l c ON c.event_type = pr.consequent
  JOIN l a ON a.event_type = pr.antecedent AND a.day = c.day
  WHERE c.vlag IS NOT NULL AND a.vlag IS NOT NULL),
m AS (  -- centered second moments (covar_pop is Welford-stable)
  SELECT antecedent, consequent, count(*) AS n,
         covar_pop(y, y) * count(*) AS syy,
         covar_pop(y1, y1) * count(*) AS s11,
         covar_pop(x1, x1) * count(*) AS s22,
         covar_pop(y1, x1) * count(*) AS s12,
         covar_pop(y, y1) * count(*) AS sy1,
         covar_pop(y, x1) * count(*) AS sy2
  FROM j GROUP BY 1, 2),
f AS (  -- nested-OLS residual sums in closed form
  SELECT antecedent, consequent, n,
         syy - sy1 * sy1 / s11 AS rss_r,
         syy - ((s22 * sy1 - s12 * sy2) * sy1
               + (s11 * sy2 - s12 * sy1) * sy2)
              / (s11 * s22 - s12 * s12) AS rss_u
  FROM m),
fs AS (
  SELECT antecedent, consequent,
         (rss_r - rss_u) / (rss_u / (n - 3)) AS fstat,
         (n - 3)::DOUBLE AS dof
  FROM f),
-- p-value = F survival function = I_x(dof/2, 1/2), x = dof/(dof+F),
-- via the regularized incomplete beta's modified-Lentz continued
-- fraction (the engine's _extrema.betainc_reg, replayed verbatim):
-- branch choice, front factor, and per-iteration convergence test
-- |delta-1| < 3e-14 all identical.
prep AS (
  SELECT antecedent, consequent, fstat, dof,
         dof / 2.0 AS a0, 0.5::DOUBLE AS b0,
         (dof / (dof + fstat))
           < ((dof / 2.0 + 1.0) / (dof / 2.0 + 2.5)) AS br,
         exp(lgamma(dof / 2.0 + 0.5) - lgamma(dof / 2.0) - lgamma(0.5)
             + (dof / 2.0) * ln(dof / (dof + fstat))
             + 0.5 * ln(fstat / (dof + fstat))) AS front
  FROM fs),
cfp AS (  -- continued-fraction parameterization for the chosen branch
  SELECT antecedent, consequent, fstat, a0, b0, br, front,
         CASE WHEN br THEN a0 ELSE b0 END AS ca,
         CASE WHEN br THEN b0 ELSE a0 END AS cb,
         CASE WHEN br THEN dof / (dof + fstat)
              ELSE fstat / (dof + fstat) END AS cx
  FROM prep),
cf(antecedent, consequent, m, c, dd, h, delta) AS (
  SELECT antecedent, consequent, 0, 1.0::DOUBLE,
         1.0 / (1.0 - (ca + cb) * cx / (ca + 1.0)),
         1.0 / (1.0 - (ca + cb) * cx / (ca + 1.0)),
         1e9::DOUBLE
  FROM cfp
  UNION ALL
  SELECT antecedent, consequent, m, c2,
         d2, h1 * (d2 * c2), d2 * c2
  FROM (
    SELECT antecedent, consequent, m, ca, cb, cx, h1, c1, d1,
           1.0 / (1.0 + aa2 * d1) AS d2, 1.0 + aa2 / c1 AS c2
    FROM (
      SELECT antecedent, consequent, m, ca, cb, cx, c1, d1,
             h * d1 * c1 AS h1,
             -(ca + m) * (ca + cb + m) * cx
               / ((ca + 2 * m) * (ca + 1.0 + 2 * m)) AS aa2
      FROM (
        SELECT cf.antecedent, cf.consequent, cf.m + 1 AS m,
               p.ca, p.cb, p.cx, cf.h,
               1.0 / (1.0 + (cf.m + 1) * (p.cb - cf.m - 1) * p.cx
                      / ((p.ca - 1.0 + 2 * (cf.m + 1))
                         * (p.ca + 2 * (cf.m + 1))) * cf.dd) AS d1,
               1.0 + (cf.m + 1) * (p.cb - cf.m - 1) * p.cx
                      / ((p.ca - 1.0 + 2 * (cf.m + 1))
                         * (p.ca + 2 * (cf.m + 1))) / cf.c AS c1
        FROM cf JOIN cfp p ON p.antecedent = cf.antecedent
                          AND p.consequent = cf.consequent
        WHERE abs(cf.delta - 1.0) >= 3e-14 AND cf.m < 200) t1) t2) t3),
cfh AS (SELECT antecedent, consequent, arg_max(h, m) AS h
        FROM cf GROUP BY 1, 2)
SELECT p.antecedent, p.consequent, round(p.fstat, 6) AS fstat,
       round(CASE WHEN p.fstat >= 0 THEN
               CASE WHEN p.br THEN p.front * c.h / p.a0
                    ELSE 1.0 - p.front * c.h / p.b0 END
             END, 6) AS p
FROM cfp p JOIN cfh c ON c.antecedent = p.antecedent
                     AND c.consequent = p.consequent
""")
def q_granger_f_daily(spark, sf_dir):
    """Granger F-statistics AND p-values at lag 1 for every ordered
    pair of daily per-event-type mean series.  The nested OLS reduces to
    covariance algebra at lag 1; the p-value (F survival function =
    regularized incomplete beta) is replayed in SQL as the engine's own
    modified-Lentz continued fraction (``_extrema.betainc_reg``) inside
    a recursive CTE — same branch choice, same front factor, same
    per-iteration |delta-1| < 3e-14 convergence test (r4; r3 precedent:
    Levinson-Durbin and Thomas solves)."""
    from orange3_timeseries_spark.spark_analytics import granger_f_table

    ev = read_table(spark, sf_dir, "events")
    pivoted = (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
               .pivot("event_type",
                      ["click", "error", "purchase", "signup", "view"])
               .agg(F.avg("value")))
    cols = [c for c in pivoted.columns if c != "day"]
    tsf = TimeSeriesFrame(pivoted, time_col="day")
    out = granger_f_table(tsf, cols, lag=1)
    return out.select("antecedent", "consequent",
                      r6(F.col("fstat"), "fstat"), r6(F.col("p"), "p"))


@query("lombscargle_by_user", """
WITH s AS (
  SELECT user_id,
         (epoch_ns(ts) // 1000) / 1000000.0 AS tt, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
  QUALIFY n >= 12),
x AS (  -- index-based linear detrend (np.polyfit over arange(n))
  SELECT user_id, tt, t, n,
         value - (regr_slope(value, t) OVER (PARTITION BY user_id) * t
                  + regr_intercept(value, t) OVER (PARTITION BY user_id))
         AS xd
  FROM s),
xv AS (
  SELECT *, pow(stddev_pop(xd) OVER (PARTITION BY user_id), 2) AS vr
  FROM x),
gaps AS (  -- auto grid from 5th/80th gap percentiles
  SELECT user_id,
         quantile_cont(dt, 0.05) AS p5, quantile_cont(dt, 0.80) AS p80
  FROM (SELECT user_id,
               tt - lag(tt) OVER (PARTITION BY user_id ORDER BY t) AS dt
        FROM s)
  WHERE dt IS NOT NULL
  GROUP BY 1),
grid AS (  -- linspace(period_high, period_low, 250)
  SELECT user_id, j,
         ph + j * (p5 - ph) / 249.0 AS period,
         2 * pi() / (ph + j * (p5 - ph) / 249.0) AS w
  FROM (SELECT user_id, p5, greatest(200 * p5, p80) AS ph FROM gaps),
       unnest(range(0, 250)) AS u(j)),
tau AS (  -- time offset per frequency (double-angle identity form)
  SELECT x.user_id, g.j, any_value(g.w) AS w,
         any_value(g.period) AS period,
         atan2(sum(2 * sin(g.w * x.tt) * cos(g.w * x.tt)),
               sum(cos(g.w * x.tt) * cos(g.w * x.tt)
                   - sin(g.w * x.tt) * sin(g.w * x.tt)))
           / (2 * any_value(g.w)) AS tau
  FROM xv x JOIN grid g ON x.user_id = g.user_id
  GROUP BY 1, 2),
pg AS (  -- classic Lomb-Scargle power, 2/(n*var) normalization
  SELECT x.user_id, t2.j, any_value(t2.period) AS period,
         0.5 * (pow(sum(x.xd * cos(t2.w * (x.tt - t2.tau))), 2)
                / sum(pow(cos(t2.w * (x.tt - t2.tau)), 2))
              + pow(sum(x.xd * sin(t2.w * (x.tt - t2.tau))), 2)
                / sum(pow(sin(t2.w * (x.tt - t2.tau)), 2)))
           * 2 / (any_value(x.n) * any_value(x.vr)) AS p
  FROM xv x JOIN tau t2 ON x.user_id = t2.user_id
  GROUP BY 1, 2),
scaled AS (
  SELECT user_id, j, period,
         CASE WHEN max(p) OVER w2 = min(p) OVER w2 THEN p - min(p) OVER w2
              ELSE (p - min(p) OVER w2) / (max(p) OVER w2 - min(p) OVER w2)
         END AS sp
  FROM pg WINDOW w2 AS (PARTITION BY user_id)),
sig AS (
  SELECT user_id, period, sp,
         max(sp) OVER (PARTITION BY user_id ORDER BY j
                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS lmax,
         max(sp) OVER (PARTITION BY user_id ORDER BY j
                       ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS rmax
  FROM scaled)
SELECT user_id, round(period, 6) AS period, round(sp, 6) AS power
FROM sig WHERE sp > lmax AND sp > rmax
""")
def q_lombscargle_by_user(spark, sf_dir):
    """Per-series Lomb-Scargle periodogram peaks over the irregular event
    times (``periodogram_nonequispaced``, ``functions.py:109-174``).  The
    oracle replays the full pipeline — linear index detrend, the 5th/80th
    gap-percentile period grid (250 points), per-frequency tau via
    atan2, the classic uncentered power, and the significance filter —
    value-for-value in SQL.  Times are epoch micros truncated exactly as
    the nanos reader does (``epoch_ns // 1000``)."""
    from orange3_timeseries_spark.spark_analytics import periodogram_table
    out = periodogram_table(_events(spark, sf_dir), "value",
                            equispaced=False, n_periods=250)
    return out.select("user_id", r6(F.col("period"), "period"),
                      r6(F.col("power"), "power"))


_DECOMP_BY_USER_SQL = """
WITH s AS (
  SELECT user_id, event_id, value AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
tr AS (  -- centered even-period MA: half-weight ends, window 13
  SELECT *, CASE WHEN t >= 6 AND t <= n - 7 THEN
            (sum(v) OVER (PARTITION BY user_id ORDER BY t
                          ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
             + 0.5 * lag(v, 6) OVER (PARTITION BY user_id ORDER BY t)
             + 0.5 * lead(v, 6) OVER (PARTITION BY user_id ORDER BY t))
            / 12 END AS trend
  FROM s),
pa AS (  -- unit-mean phase means of x/trend (multiplicative model)
  SELECT user_id, phase,
         pavg / avg(pavg) OVER (PARTITION BY user_id) AS seasonal
  FROM (SELECT user_id, t % 12 AS phase, avg(v / trend) AS pavg
        FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2)),
fl AS (
  SELECT user_id, regr_slope(trend, t) AS kl, regr_intercept(trend, t) AS cl
  FROM tr WHERE t BETWEEN 6 AND 8 GROUP BY 1),
fr AS (
  SELECT user_id, regr_slope(trend, t) AS kr, regr_intercept(trend, t) AS cr
  FROM tr WHERE t BETWEEN n - 10 AND n - 8 GROUP BY 1)
SELECT tr.user_id, tr.event_id,
       round(tr.v / pa.seasonal, 6) AS v_adj,
       round(pa.seasonal, 6) AS v_seasonal,
       round(CASE WHEN tr.trend IS NOT NULL THEN tr.trend
                  WHEN tr.t < 6 THEN fl.kl * tr.t + fl.cl
                  ELSE fr.kr * tr.t + fr.cr END, 6) AS v_trend
FROM tr
JOIN pa ON tr.user_id = pa.user_id AND tr.t % 12 = pa.phase
JOIN fl ON tr.user_id = fl.user_id
JOIN fr ON tr.user_id = fr.user_id
"""


@query("seasonal_decompose_by_user", _DECOMP_BY_USER_SQL)
def q_seasonal_decompose_by_user(spark, sf_dir):
    """PER-SERIES classical decomposition (period 12, multiplicative) over
    each user's event sequence — the grouped grain of the decompose stage
    (one pack-series group per series).  The oracle replays the whole
    algorithm per series in SQL, including the half-weight even-period
    moving average and the per-series linear trend-edge extrapolation."""
    from orange3_timeseries_spark.spark_analytics import (
        seasonal_components_table,
    )

    tsf = _events(spark, sf_dir)
    out = seasonal_components_table(tsf, "value", "event_id",
                                    model="multiplicative", period=12)
    return out.select(
        "user_id", "event_id", r6(F.col("adj"), "v_adj"),
        r6(F.col("seasonal"), "v_seasonal"),
        r6(F.col("trend"), "v_trend"))


@query("ccf_by_user", """
WITH e AS (
  SELECT user_id, ts, value AS x,
         CAST(json_extract(props, '$.k') AS DOUBLE) AS y
  FROM events),
r AS (
  -- complete-case COMPACTION (the engine's stated null policy): rows
  -- where either series is missing are dropped BEFORE sequence
  -- numbering, so lags run over the compacted observation sequence
  SELECT user_id, x, y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM e WHERE x IS NOT NULL AND y IS NOT NULL),
s AS (
  SELECT user_id, count(*)::INT AS n, avg(x) AS mx, avg(y) AS my,
         stddev_pop(x) AS sx, stddev_pop(y) AS sy
  FROM r GROUP BY 1),
l AS (SELECT unnest(generate_series(-5, 5)) AS lag),
j AS (
  SELECT a.user_id, l.lag,
         sum((a.x - s.mx) * (b.y - s.my)) AS num,
         any_value(s.n) AS n, any_value(s.sx) AS sx,
         any_value(s.sy) AS sy
  FROM r a
  JOIN s ON s.user_id = a.user_id
  CROSS JOIN l
  JOIN r b ON b.user_id = a.user_id AND b.rn = a.rn + l.lag
  WHERE s.sx > 0 AND s.sy > 0
  GROUP BY 1, 2)
SELECT user_id, lag::INT AS lag, round(num / (n * sx * sy), 6) AS ccf
FROM j
""")
def q_ccf_by_user(spark, sf_dir):
    """Per-series cross-correlation between the event value and its
    numeric JSON property at lags -5..5 — the two-series companion of
    ``acf_by_user``: biased normalization n·σx·σy (population σ),
    observation-sequence lags.  Oracle is a direct shifted self-join."""
    from orange3_timeseries_spark.spark_analytics import ccf_table

    df = read_table(spark, sf_dir, "events")
    df = df.withColumn(
        "y", F.get_json_object("props", "$.k").cast("double"))
    tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])
    out = ccf_table(tsf, "value", "y", nlags=5)
    return out.select("user_id", "lag", r6(F.col("ccf"), "ccf"))


@query("distinct_users_sketch_daily", f"""
WITH e AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  user_id,
                  (('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT)
                      AS h
           FROM events),
b AS (SELECT day, (h % 256)::INT AS reg,
             CASE WHEN (h >> 8) = 0 THEN 53
                  ELSE bit_count(((h >> 8) & -(h >> 8)) - 1) + 1
             END AS rho
      FROM e),
r AS (SELECT day, reg, max(rho) AS max_rho FROM b GROUP BY 1, 2),
a AS (SELECT day, sum(1.0 / (1::BIGINT << max_rho)) AS s,
             (256 - count(*))::DOUBLE AS zeros
      FROM r GROUP BY 1),
est AS (SELECT day,
               CASE WHEN (47072.71267120224 / (s + zeros)) <= 640.0
                         AND zeros > 0
                    THEN 256.0 * ln(256.0 / zeros)
                    ELSE 47072.71267120224 / (s + zeros)
               END AS raw
        FROM a),
x AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1)
SELECT x.day AS day, x.n_exact, round(est.raw, 6) AS approx_users
FROM x JOIN est ON x.day = est.day
""")
def q_distinct_users_sketch_daily(spark, sf_dir):
    """Per-day distinct users via a deterministic HyperLogLog (p=8,
    portable md5 hash, integer-exact rho) next to the exact count — the
    oracle replays registers AND estimate.  At 100 TB the sketch is the
    only viable distinct count: registers aggregate map-side to ≤256
    rows per day and merge across corpora (``sketch.hll_merge``), no
    key shuffle ever."""
    from orange3_timeseries_spark.operators.sketch import approx_distinct

    ev = read_table(spark, sf_dir, "events")
    ev = ev.withColumn("day", F.date_trunc("day", F.col("ts")))
    est = approx_distinct(ev, "user_id", p=8, group_cols=("day",),
                          out_col="approx_users")
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return exact.join(est, "day").select("day", "n_exact", "approx_users")


@query("cohort_retention", """
WITH a AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
           FROM events GROUP BY 1, 2),
c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1),
s AS (SELECT cohort_day, count(*) AS cohort_size FROM c GROUP BY 1),
j AS (SELECT c.cohort_day,
             CAST(date_diff('day', c.cohort_day, a.day) AS INT)
                 AS day_offset,
             a.user_id
      FROM a JOIN c USING (user_id))
SELECT j.cohort_day, j.day_offset,
       count(DISTINCT j.user_id) AS n_active,
       round(count(DISTINCT j.user_id)::DOUBLE
             / any_value(s.cohort_size), 6) AS retention
FROM j JOIN s USING (cohort_day)
GROUP BY 1, 2
""")
def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix over the event log: users grouped by
    first-seen day, activity tracked per day offset — the standard
    product-analytics rollup.  Two hash aggregations plus one skinny
    join on (user, day) pairs; cohort sizes broadcast."""
    ev = read_table(spark, sf_dir, "events")
    a = (ev.select("user_id",
                   F.date_trunc("day", F.col("ts")).alias("day"))
         .distinct())
    c = a.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    s = c.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    j = a.join(c, "user_id").select(
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        "user_id")
    agg = (j.groupBy("cohort_day", "day_offset")
           .agg(F.countDistinct("user_id").alias("n_active")))
    return (agg.join(F.broadcast(s), "cohort_day")
            .select("cohort_day", "day_offset", "n_active",
                    F.round(F.col("n_active").cast("double")
                            / F.col("cohort_size"), 6).alias("retention")))


@query("event_funnel", """
WITH f AS (SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
  FROM events GROUP BY 1)
SELECT user_id,
       t1 IS NOT NULL AS reached_view,
       (t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1) AS reached_click,
       (t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1
        AND t3 IS NOT NULL AND t3 > t2) AS reached_purchase
FROM f
""")
def q_event_funnel(spark, sf_dir):
    """First-touch funnel view→click→purchase per user: stage reached
    iff each FIRST occurrence strictly follows the previous stage's —
    one conditional-min aggregation, map-side combinable, no
    sequence-matching state."""
    ev = read_table(spark, sf_dir, "events")

    def first(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    f = ev.groupBy("user_id").agg(first("view").alias("t1"),
                                  first("click").alias("t2"),
                                  first("purchase").alias("t3"))
    r1 = F.col("t1").isNotNull()
    r2 = r1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    r3 = r2 & F.col("t3").isNotNull() & (F.col("t3") > F.col("t2"))
    return f.select("user_id", r1.alias("reached_view"),
                    r2.alias("reached_click"),
                    r3.alias("reached_purchase"))


@query("changepoint_by_user", """
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  avg(value) AS x
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS t,
             count(*) OVER (PARTITION BY user_id) AS n,
             sum(x) OVER (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cs,
             sum(x) OVER (PARTITION BY user_id) AS total
      FROM d),
g AS (SELECT user_id, day, t,
             round(abs(cs / t - (total - cs) / (n - t))
                   * sqrt((t * (n - t)) / n::DOUBLE), 6) AS gap
      FROM r WHERE t < n),
b AS (SELECT user_id, day, gap,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY gap DESC, t) AS rn
      FROM g)
SELECT user_id, day AS change_day, gap FROM b WHERE rn = 1
""")
def q_changepoint_by_user(spark, sf_dir):
    """Single change-point per series (binary-segmentation statistic):
    the day split maximizing |left mean − right mean|·√(t(n−t)/n) over
    each user's daily series — running prefix sums in one ordered
    window, argmax by rounded statistic (6 dp) with earliest-day
    tie-break so engine fp order cannot flip the winner.  The classic
    mean-shift detector, O(n) per series, no recursion."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    d = (ev.groupBy("user_id",
                    F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.avg("value").alias("x")))
    pw = W.partitionBy("user_id")
    ow = pw.orderBy("day")
    r = d.select(
        "user_id", "day", "x",
        F.row_number().over(ow).alias("t"),
        F.count("*").over(pw).alias("n"),
        F.sum("x").over(ow.rowsBetween(W.unboundedPreceding, 0))
        .alias("cs"),
        F.sum("x").over(pw).alias("total"))
    gap = F.round(
        F.abs(F.col("cs") / F.col("t")
              - (F.col("total") - F.col("cs")) / (F.col("n") - F.col("t")))
        * F.sqrt((F.col("t") * (F.col("n") - F.col("t")))
                 / F.col("n").cast("double")), 6)
    g = r.where(F.col("t") < F.col("n")).select(
        "user_id", "day", "t", gap.alias("gap"))
    bw = W.partitionBy("user_id").orderBy(F.col("gap").desc(),
                                          F.col("t").asc())
    return (g.withColumn("rn", F.row_number().over(bw))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("day").alias("change_day"), "gap"))


@query("anomalies_by_user", """
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  avg(value) AS x
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, day, x,
             avg(x) OVER w AS mu,
             stddev_pop(x) OVER w AS sd,
             count(*) OVER w AS n
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT user_id, day, round(x, 6) AS x,
       round((x - mu) / sd, 6) AS zscore
FROM r
WHERE n >= 4 AND sd > 0 AND abs((x - mu) / sd) > 2.0
""")
def q_anomalies_by_user(spark, sf_dir):
    """Per-series anomaly flags: trailing-7-day rolling z-score over
    each user's daily mean, emitting days with |z| > 2 (≥4 obs in
    window, zero-variance windows skipped) — the monitoring companion
    to ``changepoint_by_user``: one ordered window per series, no
    model state."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    d = (ev.groupBy("user_id",
                    F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.avg("value").alias("x")))
    w = (W.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0))
    r = d.select(
        "user_id", "day", "x",
        F.avg("x").over(w).alias("mu"),
        F.stddev_pop("x").over(w).alias("sd"),
        F.count("*").over(w).alias("n"))
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    return (r.where((F.col("n") >= 4) & (F.col("sd") > 0)
                    & (F.abs(z) > 2.0))
            .select("user_id", "day", F.round("x", 6).alias("x"),
                    F.round(z, 6).alias("zscore")))


def _daily_tsf(spark, sf_dir):
    """The smoothing tier's shared per-user DAILY grid (mean value per
    day) — ONE definition for the four live fits AND their registry
    twins, which share oracles: a drift here would silently diverge
    five queries at once."""
    ev = read_table(spark, sf_dir, "events")
    daily = (ev.groupBy("user_id",
                        F.date_trunc("day", F.col("ts")).alias("day"))
             .agg(F.avg("value").alias("x")))
    return TimeSeriesFrame(daily, time_col="day", series_cols=["user_id"])


@query("holt_forecast_by_user", """
WITH RECURSIVE d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
n AS (SELECT user_id, count(*) AS n FROM r GROUP BY 1),
hw(user_id, t, l, b) AS (
  SELECT a.user_id, 1, a.x, b2.x - a.x
  FROM r a JOIN r b2 ON b2.user_id = a.user_id
  WHERE a.rn = 1 AND b2.rn = 2
  UNION ALL
  SELECT hw.user_id, hw.t + 1,
         0.5 * r.x + 0.5 * (hw.l + hw.b),
         0.3 * ((0.5 * r.x + 0.5 * (hw.l + hw.b)) - hw.l) + 0.7 * hw.b
  FROM hw JOIN r ON r.user_id = hw.user_id AND r.rn = hw.t + 1),
fin AS (SELECT hw.user_id, hw.l, hw.b
        FROM hw JOIN n ON n.user_id = hw.user_id
        WHERE hw.t = n.n)
SELECT fin.user_id, h.step::INT AS step,
       round(fin.l + h.step * fin.b, 6) AS forecast
FROM fin, LATERAL (SELECT unnest(generate_series(1, 5)) AS step) h
""")
def q_holt_forecast_by_user(spark, sf_dir):
    """Holt linear-trend 5-step forecasts per user's daily series
    (α=0.5, β=0.3) — the smoothing recursion replayed as a recursive
    CTE with identical expression order, so the level/trend states and
    forecasts hash-match exactly."""
    from orange3_timeseries_spark.spark_analytics import (
        holt_forecast_table,
    )

    out = holt_forecast_table(_daily_tsf(spark, sf_dir), "x",
                              alpha=0.5, beta=0.3, horizon=5)
    return out.select("user_id", "step",
                      r6(F.col("forecast"), "forecast"))


@query("holt_winters_by_user", """
WITH RECURSIVE d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
n AS (SELECT user_id, count(*) AS n FROM r GROUP BY 1),
i1 AS (SELECT user_id,
              avg(x) FILTER (WHERE rn <= 7) AS l0,
              (avg(x) FILTER (WHERE rn BETWEEN 8 AND 14)
               - avg(x) FILTER (WHERE rn <= 7)) / 7.0 AS b0,
              list(x ORDER BY rn) FILTER (WHERE rn <= 7) AS cyc
       FROM r GROUP BY 1
       HAVING count(*) >= 14),
hw(user_id, t, l, b, s) AS (
  SELECT user_id, 7, l0, b0, list_transform(cyc, v -> v - l0) FROM i1
  UNION ALL
  SELECT hw.user_id, hw.t + 1,
         0.5 * (r.x - hw.s[1]) + 0.5 * (hw.l + hw.b),
         0.3 * ((0.5 * (r.x - hw.s[1]) + 0.5 * (hw.l + hw.b)) - hw.l)
             + 0.7 * hw.b,
         list_slice(hw.s, 2, 7)
             || [0.4 * (r.x - (0.5 * (r.x - hw.s[1])
                              + 0.5 * (hw.l + hw.b)))
                 + 0.6 * hw.s[1]]
  FROM hw JOIN r ON r.user_id = hw.user_id AND r.rn = hw.t + 1),
fin AS (SELECT hw.user_id, hw.l, hw.b, hw.s
        FROM hw JOIN n USING (user_id) WHERE hw.t = n.n)
SELECT user_id, h.step::INT AS step,
       round(l + h.step * b + s[((h.step - 1) % 7) + 1], 6) AS forecast
FROM fin, LATERAL (SELECT unnest(generate_series(1, 5)) AS step) h
""")
def q_holt_winters_by_user(spark, sf_dir):
    """Additive Holt-Winters (weekly season m=7, α=0.5 β=0.3 γ=0.4)
    5-step forecasts per user's daily series — the full level/trend/
    season recursion replayed as a recursive CTE carrying the seasonal
    state as a LIST column, so every smoothing state and forecast
    hash-matches."""
    from orange3_timeseries_spark.spark_analytics import (
        holt_winters_table,
    )

    out = holt_winters_table(_daily_tsf(spark, sf_dir), "x", m=7,
                             alpha=0.5, beta=0.3, gamma=0.4, horizon=5)
    return out.select("user_id", "step",
                      r6(F.col("forecast"), "forecast"))


@query("holt_damped_by_user", """
WITH RECURSIVE d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
n AS (SELECT user_id, count(*) AS n FROM r GROUP BY 1),
hw(user_id, t, l, b) AS (
  SELECT a.user_id, 1, a.x, b2.x - a.x
  FROM r a JOIN r b2 ON b2.user_id = a.user_id
  WHERE a.rn = 1 AND b2.rn = 2
  UNION ALL
  SELECT hw.user_id, hw.t + 1,
         0.5 * r.x + 0.5 * (hw.l + 0.9 * hw.b),
         0.3 * ((0.5 * r.x + 0.5 * (hw.l + 0.9 * hw.b)) - hw.l)
           + 0.7 * 0.9 * hw.b
  FROM hw JOIN r ON r.user_id = hw.user_id AND r.rn = hw.t + 1),
fin AS (SELECT hw.user_id, hw.l, hw.b
        FROM hw JOIN n ON n.user_id = hw.user_id
        WHERE hw.t = n.n)
SELECT fin.user_id, h.step::INT AS step,
       round(fin.l + (0.9 * (1 - pow(0.9, h.step)) / (1 - 0.9)) * fin.b,
             6) AS forecast
FROM fin, LATERAL (SELECT unnest(generate_series(1, 5)) AS step) h
""")
def q_holt_damped_by_user(spark, sf_dir):
    """Damped-trend Holt (Gardner-McKenzie, φ=0.9) 5-step forecasts per
    user's daily series — the damped recursion replayed as a recursive
    CTE with identical expression order; the forecast's damped-trend
    multiplier folds to the geometric partial sum
    φ(1−φ^h)/(1−φ)."""
    from orange3_timeseries_spark.spark_analytics import (
        holt_damped_table,
    )

    out = holt_damped_table(_daily_tsf(spark, sf_dir), "x", alpha=0.5,
                            beta=0.3, phi=0.9, horizon=5)
    return out.select("user_id", "step",
                      r6(F.col("forecast"), "forecast"))


@query("theta_forecast_by_user", """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day)
                 ::DOUBLE AS t
      FROM d),
fit AS (  -- theta0 line: OLS of x on the 1-indexed position
  SELECT user_id, count(*) AS n,
         regr_slope(x, t) AS b, regr_intercept(x, t) AS a
  FROM r GROUP BY 1),
ses AS (  -- SES level of the theta2 line 2x - (a + b t), folded to the
          -- closed geometric-weight sum: l_n = (1-α)^(n-1) θ2_1
          --   + α Σ_{t=2..n} (1-α)^(n-t) θ2_t   (α = 0.5)
  SELECT r.user_id,
         sum(CASE WHEN r.t = 1
                  THEN pow(0.5, f.n - 1)
                         * (2 * r.x - (f.a + f.b * r.t))
                  ELSE 0.5 * pow(0.5, f.n - r.t)
                         * (2 * r.x - (f.a + f.b * r.t)) END) AS l
  FROM r JOIN fit f USING (user_id)
  GROUP BY 1)
SELECT f.user_id, h.step::INT AS step,
       round(((f.a + f.b * (f.n + h.step)) + s.l) / 2.0, 6) AS forecast
FROM fit f JOIN ses s USING (user_id),
     LATERAL (SELECT unnest(generate_series(1, 5)) AS step) h
WHERE f.n >= 3
""")
def q_theta_forecast_by_user(spark, sf_dir):
    """Theta-method (θ=2, the M3 winner) 5-step forecasts per user's
    daily series: OLS drift line + SES-smoothed θ2 line, averaged.  The
    oracle replays the OLS via regr_slope/intercept and the SES level
    via its closed geometric-weight sum — no recursion needed."""
    from orange3_timeseries_spark.spark_analytics import (
        theta_forecast_table,
    )

    out = theta_forecast_table(_daily_tsf(spark, sf_dir), "x",
                               alpha=0.5, horizon=5)
    return out.select("user_id", "step",
                      r6(F.col("forecast"), "forecast"))


def _smoothing_registry_forecast(spark, sf_dir, family, **params):
    """Shared body of the smoothing-family persistence queries: fit the
    state table, WRITE it to parquet, READ IT BACK, and forecast from
    the loaded table without refitting — hash-green against the live
    fit's oracle proves the persisted state is sufficient and serving
    is bit-faithful (models/registry.py:smoothing_model_table)."""
    import os
    import tempfile

    from orange3_timeseries_spark.models.registry import (
        forecast_from_smoothing_table,
        read_model_table,
        smoothing_model_table,
        write_model_table,
    )

    models = smoothing_model_table(_daily_tsf(spark, sf_dir), ["x"],
                                   family=family, **params)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{family}_models_{os.getpid()}")
    write_model_table(models, path)
    out = forecast_from_smoothing_table(read_model_table(spark, path),
                                        steps=5)
    return out.select("user_id", "step",
                      r6(F.col("forecast"), "forecast"))


from orange3_timeseries_spark.queries import ORACLE_SQL as _OSA  # noqa: E402


@query("holt_registry_forecast_by_user", _OSA["holt_forecast_by_user"])
def q_holt_registry_forecast_by_user(spark, sf_dir):
    """Holt MODEL-PERSISTENCE path under the SAME recursive-CTE oracle
    as holt_forecast_by_user: fit the (level, trend) state per series
    into a parquet model table, write, READ BACK, forecast refit-free.
    Serving calls the same holt_forecast_from_state the live fit uses
    (models/registry.py:smoothing_model_table)."""
    return _smoothing_registry_forecast(spark, sf_dir, "holt",
                                        alpha=0.5, beta=0.3)


@query("hw_registry_forecast_by_user", _OSA["holt_winters_by_user"])
def q_hw_registry_forecast_by_user(spark, sf_dir):
    """Holt-Winters persistence path under the SAME recursive-CTE
    oracle as holt_winters_by_user: the (level, trend, season[7])
    state round-trips through parquet and serves refit-free
    (models/registry.py:smoothing_model_table)."""
    return _smoothing_registry_forecast(spark, sf_dir, "holt_winters",
                                        m=7, alpha=0.5, beta=0.3,
                                        gamma=0.4)


@query("damped_registry_forecast_by_user", _OSA["holt_damped_by_user"])
def q_damped_registry_forecast_by_user(spark, sf_dir):
    """Damped-trend Holt persistence path under the SAME oracle as
    holt_damped_by_user: (level, trend, phi) state table, write/read/
    serve without refitting (models/registry.py)."""
    return _smoothing_registry_forecast(spark, sf_dir, "holt_damped",
                                        alpha=0.5, beta=0.3, phi=0.9)


@query("theta_registry_forecast_by_user",
       _OSA["theta_forecast_by_user"])
def q_theta_registry_forecast_by_user(spark, sf_dir):
    """Theta-method persistence path under the SAME closed-form oracle
    as theta_forecast_by_user: the (a, b, l, n) state rides the shared
    smoothing parquet contract (slope in ``trend``, intercept in
    ``aux``), serving refit-free (models/registry.py)."""
    return _smoothing_registry_forecast(spark, sf_dir, "theta",
                                        alpha=0.5)


@query("baseline_forecasts_by_user", """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM d),
st AS (SELECT user_id, any_value(n) AS n,
              max(CASE WHEN rn = n THEN x END) AS lastv,
              max(CASE WHEN rn = 1 THEN x END) AS firstv
       FROM r GROUP BY 1),
h AS (SELECT unnest(generate_series(1, 5)) AS step)
SELECT user_id, 'naive' AS method, step::INT AS step,
       round(lastv, 6) AS forecast
FROM st, h
UNION ALL
SELECT user_id, 'drift', step::INT,
       round(lastv + step * (lastv - firstv) / (n - 1), 6)
FROM st, h WHERE n > 1
UNION ALL
SELECT s.user_id, 'snaive', h.step::INT, round(r.x, 6)
FROM st s JOIN h ON true
JOIN r ON r.user_id = s.user_id
      AND r.rn = s.n - 7 + ((h.step - 1) % 7 + 1)
WHERE s.n >= 7
""")
def q_baseline_forecasts_by_user(spark, sf_dir):
    """Benchmark baselines per user's daily series: naive (last value),
    seasonal naive (one week back, m=7), drift (last + h x mean
    increment) — the yardsticks the model-evaluation suite reports
    against.  Pure window/agg Catalyst expressions; oracle is the same
    closed form."""
    from orange3_timeseries_spark.spark_analytics import (
        baseline_forecast_table,
    )

    out = baseline_forecast_table(_daily_tsf(spark, sf_dir), "x", m=7,
                                  horizon=5)
    return out.select("user_id", "method", "step",
                      r6(F.col("forecast"), "forecast"))


@query("ts_features_by_user", f"""
WITH dec AS ({_DECOMP_BY_USER_SQL}),
c AS (
  SELECT user_id,
         v_adj / v_trend AS rem,
         v_adj AS adj,
         v_adj * v_seasonal / v_trend AS detr
  FROM dec),
g AS (
  SELECT user_id, count(*)::DOUBLE AS n,
         round(sum(rem), 7) AS s_r, round(sum(rem*rem), 7) AS s_rr,
         round(sum(adj), 7) AS s_a, round(sum(adj*adj), 7) AS s_aa,
         round(sum(detr), 7) AS s_d, round(sum(detr*detr), 7) AS s_dd
  FROM c GROUP BY 1),
v AS (
  SELECT user_id, n,
         (s_rr - s_r * s_r / n) / n AS var_rem,
         (s_aa - s_a * s_a / n) / n AS var_adj,
         (s_dd - s_d * s_d / n) / n AS var_detr
  FROM g)
SELECT user_id, n::BIGINT AS n_obs,
       round(greatest(0.0, 1.0 - var_rem / var_adj), 6)
           AS trend_strength,
       round(greatest(0.0, 1.0 - var_rem / var_detr), 6)
           AS seasonal_strength,
       round(var_rem, 6) AS var_remainder
FROM v
""")
def q_ts_features_by_user(spark, sf_dir):
    """Per-series trend / seasonal STRENGTH features (Hyndman-style
    tsfeatures, adapted to the multiplicative decomposition):
    ``Ft = max(0, 1 - Var(R)/Var(deseasonalized))``, ``Fs`` against the
    detrended series — the features that drive model triage (strong
    seasonality -> Holt-Winters/SARIMA, strong trend -> damped Holt) at
    fleet scale.  Composes the ALREADY-oracled decomposition (the
    oracle literally embeds the decompose replay as a CTE), then pure
    Catalyst variance algebra on the 6-dp-rounded components."""
    from orange3_timeseries_spark.spark_analytics import (
        seasonal_components_table,
    )

    tsf = _events(spark, sf_dir)
    out = seasonal_components_table(tsf, "value", "event_id",
                                    model="multiplicative", period=12)
    c = out.select(
        "user_id",
        (F.round(F.col("adj"), 6) / F.round(F.col("trend"), 6))
        .alias("rem"),
        F.round(F.col("adj"), 6).alias("adj"),
        (F.round(F.col("adj"), 6) * F.round(F.col("seasonal"), 6)
         / F.round(F.col("trend"), 6)).alias("detr"))
    r7 = lambda col: F.round(col, 7)  # noqa: E731
    g = c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        r7(F.sum("rem")).alias("s_r"),
        r7(F.sum(F.col("rem") * F.col("rem"))).alias("s_rr"),
        r7(F.sum("adj")).alias("s_a"),
        r7(F.sum(F.col("adj") * F.col("adj"))).alias("s_aa"),
        r7(F.sum("detr")).alias("s_d"),
        r7(F.sum(F.col("detr") * F.col("detr"))).alias("s_dd"))
    n = F.col("n")
    var_rem = (F.col("s_rr") - F.col("s_r") * F.col("s_r") / n) / n
    var_adj = (F.col("s_aa") - F.col("s_a") * F.col("s_a") / n) / n
    var_detr = (F.col("s_dd") - F.col("s_d") * F.col("s_d") / n) / n
    return g.select(
        "user_id", n.cast("long").alias("n_obs"),
        r6(F.greatest(F.lit(0.0), F.lit(1.0) - var_rem / var_adj),
           "trend_strength"),
        r6(F.greatest(F.lit(0.0), F.lit(1.0) - var_rem / var_detr),
           "seasonal_strength"),
        r6(var_rem, "var_remainder"))


@query("auto_period_by_user", f"""
WITH pg AS ({_PERIODOGRAM_SQL})
SELECT user_id, period, power FROM (
  SELECT user_id, period, power,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY power DESC, period) AS rk
  FROM pg) t
WHERE rk = 1
""")
def q_auto_period_by_user(spark, sf_dir):
    """Automatic seasonal-period detection per series: the strongest
    significant periodogram peak — the value a user would type into the
    Holt-Winters / seasonal-decompose period box, automated for a fleet
    of series.  Composes the already-oracled periodogram (the oracle
    embeds its full replay as a CTE) with a per-series top-1 window."""
    from pyspark.sql import Window

    base = QUERIES["periodogram_by_user"](spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("power").desc(), F.col("period"))
    return (base.withColumn("__rk__", F.row_number().over(w))
            .where(F.col("__rk__") == 1)
            .select("user_id", "period", "power"))


def _holt_search_sql(grid=None):
    """Unrolled recursion per (α, β) candidate: each combo replays the
    engine's exact Holt recursion accumulating one-step SSE; winner by
    (round(sse,6), α, β).  Smoothing complements are emitted as
    ``repr(1-α)`` so the SQL literal parses to the identical double the
    engine computes (1-0.8 is 0.19999999999999996, not 0.2)."""
    from orange3_timeseries_spark.spark_analytics import HOLT_PARAM_GRID
    grid = grid or HOLT_PARAM_GRID
    ctes, fins = [], []
    for i, (a, bta) in enumerate(grid):
        ra, r1a = repr(a), repr(1 - a)
        rb, r1b = repr(bta), repr(1 - bta)
        lnew = f"{ra}::DOUBLE * r.x + {r1a}::DOUBLE * (hw.l + hw.b)"
        ctes.append(f"""hw{i}(user_id, t, l, b, sse) AS (
  SELECT a.user_id, 1, a.x, b2.x - a.x, 0.0::DOUBLE
  FROM r a JOIN r b2 ON b2.user_id = a.user_id
  WHERE a.rn = 1 AND b2.rn = 2
  UNION ALL
  SELECT hw.user_id, hw.t + 1,
         {lnew},
         {rb}::DOUBLE * (({lnew}) - hw.l) + {r1b}::DOUBLE * hw.b,
         hw.sse + (r.x - (hw.l + hw.b)) * (r.x - (hw.l + hw.b))
  FROM hw{i} hw JOIN r ON r.user_id = hw.user_id AND r.rn = hw.t + 1)""")
        fins.append(f"""SELECT hw.user_id, {ra}::DOUBLE AS alpha,
       {rb}::DOUBLE AS beta, hw.sse, n.n
FROM hw{i} hw JOIN n ON n.user_id = hw.user_id WHERE hw.t = n.n""")
    body = ",\n".join(ctes)
    un = "\nUNION ALL\n".join(fins)
    return f"""WITH RECURSIVE d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         avg(value) AS x
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
n AS (SELECT user_id, count(*) AS n FROM r GROUP BY 1
      HAVING count(*) >= 3),
{body},
allc AS ({un})
SELECT user_id, alpha, beta, round(sse, 6) AS sse, n::BIGINT AS n_obs
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY round(sse, 6), alpha, beta) AS rk FROM allc) t
WHERE rk = 1"""


@query("holt_param_search_by_user", _holt_search_sql())
def q_holt_param_search_by_user(spark, sf_dir):
    """Automatic Holt smoothing-weight selection per series: 6-point
    (α, β) grid scored by one-step in-sample SSE, winner per series —
    the exponential-smoothing counterpart of the auto-ARIMA order
    search.  The oracle unrolls ALL six smoothing recursions (each the
    proven holt CTE shape, extended with an SSE accumulator) and
    re-derives the same winner, with smoothing complements emitted as
    exact double reprs so 1-α matches bit for bit."""
    from orange3_timeseries_spark.spark_analytics import (
        holt_param_search_table,
    )

    out = holt_param_search_table(_daily_tsf(spark, sf_dir), "x")
    return out.select("user_id", "alpha", "beta",
                      r6(F.col("sse"), "sse"), "n_obs")


@query("croston_by_user", """
WITH RECURSIVE s AS (
  SELECT user_id,
         CASE WHEN event_id % 7 < 2 THEN value ELSE 0 END AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events),
nz AS (
  SELECT user_id, rn, x,
         row_number() OVER (PARTITION BY user_id ORDER BY rn) AS k
  FROM s WHERE x != 0),
n AS (SELECT user_id, count(*) AS kn FROM nz GROUP BY 1
      HAVING count(*) >= 2),
rec(user_id, k, z, p) AS (
  SELECT nz.user_id, 1, nz.x, nz.rn::DOUBLE FROM nz WHERE nz.k = 1
  UNION ALL
  SELECT rec.user_id, rec.k + 1,
         0.2::DOUBLE * b.x + 0.8::DOUBLE * rec.z,
         0.2::DOUBLE * (b.rn - a.rn)::DOUBLE + 0.8::DOUBLE * rec.p
  FROM rec
  JOIN nz a ON a.user_id = rec.user_id AND a.k = rec.k
  JOIN nz b ON b.user_id = rec.user_id AND b.k = rec.k + 1)
SELECT rec.user_id, round(z, 6) AS z_hat, round(p, 6) AS p_hat,
       round(z / p, 6) AS forecast, n.kn::BIGINT AS n_nonzero
FROM rec JOIN n USING (user_id) WHERE rec.k = n.kn
""")
def q_croston_by_user(spark, sf_dir):
    """Croston's intermittent-demand forecast per series: the events
    stream is made intermittent deterministically (demand only where
    event_id % 7 < 2, ~28% of periods), then separate SES recursions
    over non-zero sizes and inter-demand intervals give the flat
    demand-rate forecast z/p — the forecaster SES/Holt cannot replace
    when most periods are zero.  The oracle replays both recursions
    over the identical non-zero subsequence."""
    from orange3_timeseries_spark.spark_analytics import croston_table

    ev = read_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", "ts",
        F.when(F.col("event_id") % 7 < 2, F.col("value"))
        .otherwise(F.lit(0.0)).alias("x"))
    tsf = TimeSeriesFrame(d, time_col="ts", series_cols=["user_id"])
    out = croston_table(tsf, "x", alpha=0.2)
    return out.select("user_id", r6(F.col("z_hat"), "z_hat"),
                      r6(F.col("p_hat"), "p_hat"),
                      r6(F.col("forecast"), "forecast"), "n_nonzero")


@query("changepoint_effect_by_user", """
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
                      AS day,
                  avg(value) AS x
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS t,
             count(*) OVER (PARTITION BY user_id) AS n,
             round(sum(x) OVER (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING), 7) AS cs,
             round(sum(x * x) OVER (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING), 7) AS css,
             round(sum(x) OVER (PARTITION BY user_id), 7) AS total,
             round(sum(x * x) OVER (PARTITION BY user_id), 7) AS total2
      FROM d),
g AS (SELECT *,
             round(abs(cs / t - (total - cs) / (n - t))
                   * sqrt((t * (n - t)) / n::DOUBLE), 6) AS gap
      FROM r WHERE t < n),
b AS (SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY gap DESC, t) AS rn
      FROM g),
w AS (SELECT user_id, day, gap, t, n,
             cs / t AS m1, (total - cs) / (n - t) AS m2,
             (css / t - (cs / t) * (cs / t)) * t / (t - 1.0) AS v1,
             ((total2 - css) / (n - t)
              - ((total - cs) / (n - t)) * ((total - cs) / (n - t)))
                 * (n - t) / (n - t - 1.0) AS v2
      FROM b WHERE rn = 1 AND t >= 2 AND n - t >= 2)
SELECT user_id, day AS change_day, gap,
       m1 AS pre_mean, m2 AS post_mean,
       m2 - m1 AS effect,
       (m2 - m1) / sqrt(v1 / t + v2 / (n - t)) AS welch_t,
       abs((m2 - m1) / sqrt(v1 / t + v2 / (n - t))) > 1.96
           AS significant_5pct
FROM w
""")
def q_changepoint_effect_by_user(spark, sf_dir):
    """Change-point EFFECT estimation: at each series' winning
    mean-shift split, the pre/post means, the shift size, and a Welch
    t-statistic with a 5% verdict — turning detection into the
    actionable 'how big was the break' number.  Same prefix-sum plan
    as the detector plus a squared-sum channel; the rounded-cumsum
    firewall pins both engines."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    d = (ev.groupBy("user_id",
                    F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.avg("value").alias("x")))
    pw = W.partitionBy("user_id")
    ow = pw.orderBy("day")
    x = F.col("x")
    r = d.select(
        "user_id", "day",
        F.row_number().over(ow).alias("t"),
        F.count("*").over(pw).alias("n"),
        F.round(F.sum(x).over(ow.rowsBetween(W.unboundedPreceding, 0)),
                7).alias("cs"),
        F.round(F.sum(x * x).over(ow.rowsBetween(W.unboundedPreceding,
                                                 0)), 7).alias("css"),
        F.round(F.sum(x).over(pw), 7).alias("total"),
        F.round(F.sum(x * x).over(pw), 7).alias("total2"))
    t, n = F.col("t"), F.col("n")
    cs, css = F.col("cs"), F.col("css")
    total, total2 = F.col("total"), F.col("total2")
    gap = F.round(F.abs(cs / t - (total - cs) / (n - t))
                  * F.sqrt((t * (n - t)) / n.cast("double")), 6)
    g = r.where(t < n).withColumn("gap", gap)
    b = g.withColumn("rn", F.row_number().over(
        pw.orderBy(F.col("gap").desc(), t)))
    w = b.where((F.col("rn") == 1) & (t >= 2) & (n - t >= 2))
    m1 = cs / t
    m2 = (total - cs) / (n - t)
    v1 = (css / t - m1 * m1) * t / (t - F.lit(1.0))
    v2 = (((total2 - css) / (n - t)) - m2 * m2) \
        * (n - t) / (n - t - F.lit(1.0))
    wt = (m2 - m1) / F.sqrt(v1 / t + v2 / (n - t))
    # means/effect/welch_t are emitted UNROUNDED: every input (cs, css,
    # total, total2) is already on the 7dp grid — bit-identical across
    # engines — and the downstream arithmetic replays the same IEEE
    # association, so the doubles match exactly.  A final round(.,6)
    # would REINTRODUCE divergence: a 7dp grid value divided by a small
    # integer t lands exactly on 6dp half-boundaries at rate ~1/(20t),
    # where decimal HALF_UP and binary rounding disagree (seen at sf0.1).
    return w.select(
        "user_id", F.col("day").alias("change_day"), "gap",
        m1.alias("pre_mean"), m2.alias("post_mean"),
        (m2 - m1).alias("effect"), wt.alias("welch_t"),
        (F.abs(wt) > 1.96).alias("significant_5pct"))


# ------------------------------------------------- monitoring/anomaly tier
@query("robust_anomalies_by_user", """
WITH base AS (
  SELECT user_id, event_id, ts, value::DOUBLE AS x
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT user_id, event_id, x,
         list_sort(list(x) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 24 PRECEDING
                                          AND CURRENT ROW)) AS arr
  FROM base),
m AS (SELECT user_id, event_id, x, arr,
             arr[(len(arr) + 1) // 2] AS med
      FROM r WHERE len(arr) = 25),
f AS (SELECT user_id, event_id, x, med,
             list_sort(list_transform(arr, y -> abs(y - med)))
                 [(len(arr) + 1) // 2] AS mad
      FROM m)
SELECT user_id, event_id, round(x, 6) AS x, round(med, 6) AS med,
       round(mad, 6) AS mad,
       CASE WHEN mad > 0
            THEN 0.6745 * (x - med) / mad END AS mod_z,
       (mad > 0 AND
        abs(0.6745 * (x - med) / mad) > 3.5) AS is_outlier
FROM f
""")
def q_robust_anomalies_by_user(spark, sf_dir):
    """ROBUST rolling outlier flags (modified z-score, Iglewicz-Hoaglin):
    trailing-25-row exact median + MAD per user, so the outliers being
    hunted cannot poison the baseline the way they inflate a rolling
    mean/std z-score (``anomalies_by_user``'s known weakness).  Median
    and MAD are exact lower-median ELEMENT selections from the sorted
    window array — zero float aggregation, so engine and oracle agree
    bit-for-bit before the display rounding."""
    from orange3_timeseries_spark.operators.anomaly import (
        rolling_mad_flags,
    )

    ev = read_table(spark, sf_dir, "events")
    out = rolling_mad_flags(ev, "value", "ts", ["user_id"], window=25,
                            thresh=3.5, tie_cols=("event_id",))
    return out.select("user_id", "event_id", "x", "med", "mad",
                      "mod_z", "is_outlier")


@query("cusum_by_user", """
WITH base AS (
  SELECT user_id, event_id, ts, value::DOUBLE AS x
  FROM events WHERE value IS NOT NULL),
s AS (SELECT user_id, event_id, ts, x,
             avg(x) OVER (PARTITION BY user_id) AS mu,
             stddev_pop(x) OVER (PARTITION BY user_id) AS sd
      FROM base),
z AS (SELECT user_id, event_id, ts, round((x - mu) / sd, 6) AS z
      FROM s WHERE sd > 0),
p AS (SELECT user_id, event_id, ts, z,
             sum(z - 0.5) OVER w AS pu,
             sum(-z - 0.5) OVER w AS pd
      FROM z
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)),
q AS (SELECT user_id, event_id, z,
             round(pu - least(0, min(pu) OVER w), 6) AS s_up,
             round(pd - least(0, min(pd) OVER w), 6) AS s_dn
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING))
SELECT user_id, event_id, z, s_up, s_dn,
       s_up > 4.0 AS alarm_up, s_dn > 4.0 AS alarm_dn
FROM q
""")
def q_cusum_by_user(spark, sf_dir):
    """Two-sided standardized CUSUM drift detector (Page 1954) per user
    with k=0.5σ slack and h=4σ alarms.  The textbook recursion
    ``max(0, s+z-k)`` runs as its closed prefix form — running sum plus
    running min, plain ordered windows (operators/anomaly.py) — so the
    detector distributes without applyInPandas and the oracle replays
    the identical prefix algebra."""
    from orange3_timeseries_spark.operators.anomaly import cusum

    ev = read_table(spark, sf_dir, "events")
    out = cusum(ev, "value", "ts", ["user_id"], k=0.5, h=4.0,
                tie_cols=("event_id",))
    return out.select("user_id", "event_id", "z", "s_up", "s_dn",
                      "alarm_up", "alarm_dn")


def _ewma_sql(lam=0.2, L=3.0):
    beta = repr(1.0 - lam)          # exact same double on both engines
    ratio = repr(lam / (2.0 - lam))  # computed once, injected as literal
    return f"""
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  avg(value) AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
s AS (SELECT user_id, day, x,
             avg(x) OVER (PARTITION BY user_id) AS mu,
             stddev_pop(x) OVER (PARTITION BY user_id) AS sd,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS t
      FROM d),
g AS (SELECT user_id, day, x, mu, sd, t,
             list(x) OVER (PARTITION BY user_id ORDER BY day
                           ROWS BETWEEN 199 PRECEDING
                                    AND CURRENT ROW) AS arr
      FROM s WHERE sd > 0),
e AS (SELECT user_id, day, x, t,
             round(list_reduce(
                 list_prepend(CASE WHEN t <= 200 THEN mu
                              ELSE 0.0 END, arr),
                 (acc, y) -> acc * {beta} + {lam!r} * y), 6) AS ewma,
             round(mu + {L!r} * sd * sqrt({ratio}
                   * (1 - power({beta}, 2 * t))), 6) AS ucl,
             round(mu - {L!r} * sd * sqrt({ratio}
                   * (1 - power({beta}, 2 * t))), 6) AS lcl
      FROM g)
SELECT user_id, day, t, round(x, 6) AS x, ewma, ucl, lcl,
       (ewma > ucl OR ewma < lcl) AS violation
FROM e
"""


@query("ewma_chart_by_user", _ewma_sql())
def q_ewma_chart_by_user(spark, sf_dir):
    """EWMA control chart (λ=0.2, L=3) over each user's daily-mean
    series: the recursion unrolls to an exact geometric running sum
    (the Holt/theta trick), limits carry the Lucas-Saccucci start-up
    tightening, and the violation flag compares ROUNDED chart values so
    a 1-ulp pow() difference between engines can never flip it."""
    from orange3_timeseries_spark.operators.anomaly import ewma_control

    ev = read_table(spark, sf_dir, "events")
    d = (ev.where(F.col("value").isNotNull())
         .groupBy("user_id",
                  F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.avg("value").alias("x")))
    out = ewma_control(d, "x", "day", ["user_id"], lam=0.2, L=3.0)
    return out.select("user_id", "day", "t", "x", "ewma", "ucl", "lcl",
                      "violation")


@query("residual_anomalies_by_user", f"""
WITH dec AS ({_DECOMP_BY_USER_SQL}),
r AS (SELECT user_id, event_id, v_adj - v_trend AS r FROM dec),
a AS (SELECT user_id, list_sort(list(r)) AS arr FROM r GROUP BY 1),
m AS (SELECT user_id, arr[(len(arr) + 1) // 2] AS med,
             list_sort(list_transform(
                 arr, y -> abs(y - arr[(len(arr) + 1) // 2])))
                 [(len(arr) + 1) // 2] AS mad
      FROM a)
SELECT r.user_id, r.event_id, round(r.r, 6) AS resid,
       round(0.6745 * (r.r - m.med) / m.mad, 6) AS mod_z
FROM r JOIN m USING (user_id)
WHERE m.mad > 0
  AND abs(round(0.6745 * (r.r - m.med) / m.mad, 6)) > 3.5
""")
def q_residual_anomalies_by_user(spark, sf_dir):
    """Deseasonalized residual anomalies — the composition a real
    monitoring stack runs: classical decomposition strips trend and
    period-12 seasonality (``seasonal_decompose_by_user``'s exact
    stage), then a per-series robust modified z-score over the
    residuals flags |z| > 3.5.  Flagging on residuals instead of raw
    values is what stops seasonal peaks from flagging as anomalies.
    Median/MAD are exact element selections; the residual is a
    difference of the decomposition's 6-dp-rounded components, so both
    engines score identical doubles."""
    from orange3_timeseries_spark.spark_analytics import (
        seasonal_components_table,
    )
    from pyspark.sql import Window as W

    tsf = _events(spark, sf_dir)
    dec = seasonal_components_table(tsf, "value", "event_id",
                                    model="multiplicative", period=12)
    r = dec.select(
        "user_id", "event_id",
        (F.round(F.col("adj"), 6) - F.round(F.col("trend"), 6))
        .alias("r")).localCheckpoint()
    # med/MAD ONCE per user (150 skinny rows, broadcast back) — the
    # per-row window-array form re-sorted the same ~660-element residual
    # array once per ROW (measured ~2x the whole query's cost at sf0.1)
    from orange3_timeseries_spark.operators.anomaly import (
        _lower_median,
    )

    arr = F.sort_array(F.collect_list("r"))
    stats = r.groupBy("user_id").agg(arr.alias("__arr__"))
    stats = stats.withColumn("__med__",
                             _lower_median(F.col("__arr__")))
    devs = F.array_sort(F.transform(
        F.col("__arr__"), lambda y: F.abs(y - F.col("__med__"))))
    stats = stats.select("user_id", "__med__",
                         _lower_median(devs).alias("__mad__"))
    j = r.join(F.broadcast(stats), "user_id")
    mz = F.round(F.lit(0.6745) * (F.col("r") - F.col("__med__"))
                 / F.col("__mad__"), 6)
    return (j.where((F.col("__mad__") > 0) & (F.abs(mz) > 3.5))
            .select("user_id", "event_id",
                    F.round("r", 6).alias("resid"),
                    mz.alias("mod_z")))


# ------------------------------------------- round-7 forecasting workflow
@query("lag_features_by_user", """
WITH base AS (SELECT user_id, event_id, ts, value::DOUBLE AS x
              FROM events WHERE value IS NOT NULL),
l AS (SELECT user_id, event_id, x,
             lag(x, 1) OVER w AS lag_1, lag(x, 2) OVER w AS lag_2,
             lag(x, 3) OVER w AS lag_3, lag(x, 4) OVER w AS lag_4,
             avg(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING
                                   AND 1 PRECEDING) AS rm,
             count(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 4 PRECEDING
                                     AND 1 PRECEDING) AS c
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id,
       round(lag_1, 6) AS lag_1, round(lag_2, 6) AS lag_2,
       round(lag_3, 6) AS lag_3, round(lag_4, 6) AS lag_4,
       round(rm, 6) AS roll_mean_4, round(x, 6) AS y
FROM l
WHERE c = 4 AND lag_1 IS NOT NULL AND lag_2 IS NOT NULL
  AND lag_3 IS NOT NULL AND lag_4 IS NOT NULL
""")
def q_lag_features_by_user(spark, sf_dir):
    """Supervised lag matrix per series — the "forecasting as
    regression" transform: lags 1-4 plus a trailing 4-row mean that
    EXCLUDES the current row (leakage-safe), current value as the
    label.  One series-key shuffle, then narrow window lags; every
    emitted row is a complete training example."""
    from orange3_timeseries_spark.operators.features import lag_features

    ev = read_table(spark, sf_dir, "events")
    out = lag_features(ev, "value", "ts", ["user_id"],
                       lags=(1, 2, 3, 4), roll=4,
                       tie_cols=("event_id",))
    return out.select("user_id", "event_id", "lag_1", "lag_2", "lag_3",
                      "lag_4", "roll_mean_4", "y")


@query("calendar_features_daily", """
WITH days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)
                  AS day FROM events),
f AS (SELECT day,
             ((date_diff('day', DATE '1970-01-01', day::DATE) + 3)
                  % 7 + 7) % 7 + 1 AS dow,
             dayofyear(day::DATE) AS doy
      FROM days)
SELECT day, dow::INT AS dow_iso,
       day(f.day::DATE)::INT AS dom,
       month(f.day::DATE)::INT AS month,
       weekofyear(f.day::DATE)::INT AS week_iso,
       doy::INT AS doy,
       round(sin(0.8975979010256552 * (dow - 1)), 6) AS sin_w1,
       round(cos(0.8975979010256552 * (dow - 1)), 6) AS cos_w1,
       round(sin(2.0 * (0.8975979010256552 * (dow - 1))), 6) AS sin_w2,
       round(cos(2.0 * (0.8975979010256552 * (dow - 1))), 6) AS cos_w2,
       round(sin(0.017202423838958484 * (doy - 1)), 6) AS sin_a1,
       round(cos(0.017202423838958484 * (doy - 1)), 6) AS cos_a1
FROM f
""")
def q_calendar_features_daily(spark, sf_dir):
    """Per-day calendar covariates + weekly/annual Fourier terms — the
    seasonality encoding regression forecasters consume.  Day-of-week
    derives from the integer day count since 1970-01-01 (a Thursday),
    sidestepping the engines' dayofweek() origin disagreement; trig
    rounds 6 dp.  Map-only (one distinct on the day grain)."""
    from orange3_timeseries_spark.operators.features import (
        calendar_features,
    )

    ev = read_table(spark, sf_dir, "events")
    days = (ev.select(F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct())
    return calendar_features(days, "day")


@query("rolling_origin_eval_by_user", """
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  avg(value) AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
p AS (SELECT user_id, list(x ORDER BY day) AS arr, count(*) AS n
      FROM d GROUP BY 1),
o AS (SELECT unnest([18, 22, 26]) AS t),
m AS (SELECT unnest(['naive', 'drift', 'snaive']) AS model)
SELECT user_id, t AS origin_t, model,
       round((abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 1.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 1 - 7] END) - arr[t + 1]) + abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 2.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 2 - 7] END) - arr[t + 2]) + abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 3.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 3 - 7] END) - arr[t + 3]) + abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 4.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 4 - 7] END) - arr[t + 4])) / 4.0, 6) AS mae,
       round((2.0 * abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 1.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 1 - 7] END) - arr[t + 1]) / nullif(abs(CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 1.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 1 - 7] END) + abs(arr[t + 1]), 0.0) + 2.0 * abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 2.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 2 - 7] END) - arr[t + 2]) / nullif(abs(CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 2.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 2 - 7] END) + abs(arr[t + 2]), 0.0) + 2.0 * abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 3.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 3 - 7] END) - arr[t + 3]) / nullif(abs(CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 3.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 3 - 7] END) + abs(arr[t + 3]), 0.0) + 2.0 * abs((CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 4.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 4 - 7] END) - arr[t + 4]) / nullif(abs(CASE model WHEN 'naive' THEN arr[t] WHEN 'drift' THEN arr[t] + 4.0 * (arr[t] - arr[1]) / (t - 1) ELSE arr[t + 4 - 7] END) + abs(arr[t + 4]), 0.0)) / 4.0, 6) AS smape
FROM p CROSS JOIN o CROSS JOIN m
WHERE n >= t + 4 AND t > 7
""")
def q_rolling_origin_eval_by_user(spark, sf_dir):
    """Rolling-origin backtesting (tsCV) of the three closed-form
    baselines — naive, drift, seasonal-naive(7) — at training cutoffs
    18/22/26 over each user's daily-mean series, scored by 4-step MAE
    and sMAPE.  The production generalization of the reference's
    one-shot model_evaluation (functions.py:550-567): each series packs
    once into an ordered array, every forecast is an exact element
    lookup, metrics accumulate in fixed step order (6-dp rounded)."""
    from orange3_timeseries_spark.operators.backtest import (
        rolling_origin_eval,
    )

    ev = read_table(spark, sf_dir, "events")
    d = (ev.where(F.col("value").isNotNull())
         .groupBy("user_id",
                  F.date_trunc("day", F.col("ts")).alias("day"))
         .agg(F.avg("value").alias("x")))
    return rolling_origin_eval(d, "x", "day", ["user_id"],
                               origins=(18, 22, 26), horizon=4,
                               season=7)


@query("zorder_events", """
WITH b AS (
  SELECT event_id,
         (user_id & 2097151) AS x,
         ((epoch_us(ts) // 3600000000) & 2097151) AS y
  FROM events)
SELECT event_id,
       ((((x >> 0) & 1) * 1)
         + (((y >> 0) & 1) * 2)
         + (((x >> 1) & 1) * 4)
         + (((y >> 1) & 1) * 8)
         + (((x >> 2) & 1) * 16)
         + (((y >> 2) & 1) * 32)
         + (((x >> 3) & 1) * 64)
         + (((y >> 3) & 1) * 128)
         + (((x >> 4) & 1) * 256)
         + (((y >> 4) & 1) * 512)
         + (((x >> 5) & 1) * 1024)
         + (((y >> 5) & 1) * 2048)
         + (((x >> 6) & 1) * 4096)
         + (((y >> 6) & 1) * 8192)
         + (((x >> 7) & 1) * 16384)
         + (((y >> 7) & 1) * 32768)
         + (((x >> 8) & 1) * 65536)
         + (((y >> 8) & 1) * 131072)
         + (((x >> 9) & 1) * 262144)
         + (((y >> 9) & 1) * 524288)
         + (((x >> 10) & 1) * 1048576)
         + (((y >> 10) & 1) * 2097152)
         + (((x >> 11) & 1) * 4194304)
         + (((y >> 11) & 1) * 8388608)
         + (((x >> 12) & 1) * 16777216)
         + (((y >> 12) & 1) * 33554432)
         + (((x >> 13) & 1) * 67108864)
         + (((y >> 13) & 1) * 134217728)
         + (((x >> 14) & 1) * 268435456)
         + (((y >> 14) & 1) * 536870912)
         + (((x >> 15) & 1) * 1073741824)
         + (((y >> 15) & 1) * 2147483648)
         + (((x >> 16) & 1) * 4294967296)
         + (((y >> 16) & 1) * 8589934592)
         + (((x >> 17) & 1) * 17179869184)
         + (((y >> 17) & 1) * 34359738368)
         + (((x >> 18) & 1) * 68719476736)
         + (((y >> 18) & 1) * 137438953472)
         + (((x >> 19) & 1) * 274877906944)
         + (((y >> 19) & 1) * 549755813888)
         + (((x >> 20) & 1) * 1099511627776)
         + (((y >> 20) & 1) * 2199023255552)) AS zkey
FROM b
""")
def q_zorder_events(spark, sf_dir):
    '''Morton (Z-order) clustering key over (user_id, event hour) —
    the layout primitive behind clustered parquet writes: range-
    partitioning this key co-locates rows close in BOTH dimensions so
    file min/max stats prune either predicate
    (operators/partitioning.py:zorder_key; the repartition itself is
    exercised with a pruning-stats assertion in tests/test_zorder.py).
    Pure int64 shift/mask Catalyst arithmetic — bit-identical in SQL.'''
    from orange3_timeseries_spark.operators.partitioning import zorder_key

    ev = read_table(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000")
    keyed = ev.select("event_id",
                      F.col("user_id").alias("__zx__"),
                      hour.alias("__zy__"))
    return keyed.select("event_id",
                        zorder_key("__zx__", "__zy__").alias("zkey"))


@query("hurst_rs_by_user", """
WITH base AS (
  SELECT user_id, ts, value::DOUBLE AS y
  FROM events WHERE value IS NOT NULL),
d AS (
  SELECT user_id, ts, y,
         round(y - round(avg(y) OVER (PARTITION BY user_id), 6), 6) AS dd
  FROM base),
c AS (
  SELECT user_id, y,
         sum(dd) OVER (PARTITION BY user_id ORDER BY ts, y
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM d),
g AS (
  SELECT user_id, count(*) AS n, max(cum) AS mx, min(cum) AS mn,
         stddev_pop(y) AS sd
  FROM c GROUP BY 1),
f AS (
  SELECT user_id, n, round(mx - mn, 6) AS r, round(sd, 6) AS s
  FROM g)
SELECT user_id, n::BIGINT AS n_obs, r AS rs_range, s AS rs_std,
       round(ln(r / s) / ln(n::DOUBLE), 6) AS hurst
FROM f WHERE n >= 8 AND s > 0 AND r > 0
""")
def q_hurst_rs_by_user(spark, sf_dir):
    '''Single-scale rescaled-range Hurst estimate per series — the
    persistence screen (H>0.5 trending / H<0.5 mean-reverting) that
    routes series to the right forecaster, complementing the
    stationarity tests (adf/kpss).  Deviations round 6 dp at SOURCE so
    the running cumdev sum is engine-identical (the cusum firewall);
    R and S round before the log ratio
    (operators/stattests.py:hurst_rs).'''
    from orange3_timeseries_spark.operators.stattests import hurst_rs

    ev = read_table(spark, sf_dir, "events")
    return hurst_rs(ev, "ts", "value", ["user_id"])


@query("burstiness_by_user", """
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS us FROM events),
g AS (
  SELECT user_id, ts,
         (us - lag(us) OVER (PARTITION BY user_id ORDER BY ts))::BIGINT
             AS gus
  FROM e QUALIFY gus IS NOT NULL),
p AS (
  SELECT user_id, gus, gus / 1e6 AS gap,
         lag(gus / 1e6) OVER (PARTITION BY user_id ORDER BY ts) AS gp
  FROM g),
a AS (
  SELECT user_id, count(*) AS n_gaps,
         (sum(gus)::BIGINT::DOUBLE / count(*)) / 1e6 AS m,
         round(stddev_pop(gap), 6) AS s,
         round(corr(gap, gp), 6) AS mem
  FROM p GROUP BY 1),
b AS (
  SELECT user_id, n_gaps, m, s, mem,
         round((s - m) / (s + m), 6) AS bb
  FROM a WHERE n_gaps >= 8)
SELECT user_id, n_gaps::BIGINT AS n_gaps, m AS mean_gap_s,
       s AS std_gap_s, bb AS burstiness, mem AS memory_coef,
       CASE WHEN bb < -0.1 THEN 'periodic'
            WHEN bb > 0.1 THEN 'bursty'
            ELSE 'poisson' END AS regime
FROM b
""")
def q_burstiness_by_user(spark, sf_dir):
    '''Goh-Barabasi burstiness B = (s-m)/(s+m) and memory coefficient
    (lag-1 gap correlation) per series -- the stream-shape triage that
    decides whether a series may be resampled to a grid (periodic),
    rate-aggregated (poisson), or must be sessionized first (bursty).
    Gaps are exact integer-microsecond differences; the mean gap is
    ONE IEEE division of the exact BIGINT microsecond sum (never a
    rounded mean of derived values -- the ensemble_forecast boundary
    rule); sigma/corr round 6 dp before the ratio (the hurst firewall)
    (operators/eventstats.py:burstiness).'''
    from orange3_timeseries_spark.operators.eventstats import burstiness

    ev = read_table(spark, sf_dir, "events")
    return burstiness(ev, "ts", ["user_id"])


def _benford_sql() -> str:
    """Benford oracle with the digit CASE-ladder and the χ² terms as
    order-free integer micro-units; the Benford probabilities are the
    SAME full-precision Python literals the engine injects."""
    from orange3_timeseries_spark.operators.eventstats import BENFORD_P

    ladder = """CASE WHEN x >= 1.0 THEN x
                 WHEN x >= 1e-1 THEN x * 1e1
                 WHEN x >= 1e-2 THEN x * 1e2
                 WHEN x >= 1e-3 THEN x * 1e3
                 WHEN x >= 1e-4 THEN x * 1e4
                 WHEN x >= 1e-5 THEN x * 1e5
                 WHEN x >= 1e-6 THEN x * 1e6 END"""
    counts = ",\n         ".join(
        f"sum(CASE WHEN dig = {d} THEN 1 ELSE 0 END) AS c{d}"
        for d in range(1, 10))
    units = " + ".join(
        f"CAST(round((c{d} - n * {BENFORD_P[d]!r})"
        f" * (c{d} - n * {BENFORD_P[d]!r})"
        f" / (n * {BENFORD_P[d]!r}) * 1e6, 0) AS BIGINT)"
        for d in range(1, 10))
    shares = ",\n       ".join(
        f"round(c{d} / n, 6) AS obs_share_{d}" for d in range(1, 10))
    return f"""
WITH v AS (
  SELECT event_type, abs(value::DOUBLE) AS x FROM events
  WHERE value IS NOT NULL
    AND abs(value::DOUBLE) >= 1e-6 AND abs(value::DOUBLE) < 1e15),
d AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(floor({ladder}) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS dig
  FROM v),
c AS (
  SELECT event_type, count(*)::DOUBLE AS n,
         {counts}
  FROM d GROUP BY 1),
t AS (
  SELECT event_type, n, c1, c2, c3, c4, c5, c6, c7, c8, c9,
         ({units}) AS units
  FROM c WHERE n >= 50)
SELECT event_type, CAST(n AS BIGINT) AS n_values,
       units / 1e6 AS chi2,
       (units / 1e6) <= 15.507313 AS benford_ok,
       {shares}
FROM t
"""


@query("benford_qa_events", _benford_sql())
def q_benford_qa_events(spark, sf_dir):
    '''First-significant-digit audit of event values against Benford's
    law per event_type -- the classic corruption/forgery screen for
    multi-scale positive measurements.  The digit is extracted libm-
    free (decade CASE-ladder of exact power-of-ten literals + BIGINT
    decimal rendering), and the χ² statistic is summed as integer
    micro-units so both engines add identical BIGINTs
    (operators/eventstats.py:benford_digits).'''
    from orange3_timeseries_spark.operators.eventstats import benford_digits

    ev = read_table(spark, sf_dir, "events")
    return benford_digits(ev, "value", ["event_type"])


@query("spectral_entropy_by_user", """
WITH s AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
d AS (  -- diff detrend, re-indexed 0..m-1 (periodogram family shape)
  SELECT user_id, t - 1 AS td, n - 1 AS m,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY t) AS dv
  FROM s
  QUALIFY td >= 0 AND n >= 12),
grid AS (  -- DC excluded: k = 1 .. m//2
  SELECT user_id, m, unnest(range(1, m // 2 + 1)) AS k
  FROM (SELECT DISTINCT user_id, m FROM d)),
pw AS (
  SELECT d.user_id, g.k, any_value(g.m) AS m,
         pow(sum(d.dv * cos(2 * pi() * g.k * d.td / g.m)), 2)
       + pow(sum(d.dv * sin(2 * pi() * g.k * d.td / g.m)), 2) AS raw
  FROM d JOIN grid g ON d.user_id = g.user_id
  GROUP BY 1, 2),
spec AS (  -- one-sided density: /m, doubled except Nyquist on even m
  SELECT user_id, k,
         (raw / m) * (CASE WHEN m % 2 = 0 AND k = m // 2
                           THEN 1 ELSE 2 END) AS p
  FROM pw),
tot AS (
  SELECT user_id, sum(p) AS sp, count(*) AS kbins
  FROM spec GROUP BY 1),
ent AS (
  SELECT s.user_id, any_value(t.kbins) AS kbins,
         -sum(CASE WHEN s.p > 0
                   THEN (s.p / t.sp) * ln(s.p / t.sp) ELSE 0 END)
             / ln(any_value(t.kbins)) AS h
  FROM spec s JOIN tot t ON s.user_id = t.user_id
  WHERE t.sp > 0 AND t.kbins >= 2
  GROUP BY 1)
SELECT user_id, kbins::BIGINT AS n_bins,
       round(h, 6) AS spectral_entropy,
       round(1 - h, 6) AS forecastability
FROM ent
""")
def q_spectral_entropy_by_user(spark, sf_dir):
    '''Normalized spectral entropy H and Goerg forecastability 1-H per
    series -- the scalar triage that routes series between the modeling
    tier (low H: seasonal structure worth fitting) and plain rate
    aggregation (H near 1: noise).  NumPy rfft under the packed
    mapInPandas stage; the oracle replays the DFT as per-bin trig sums
    over the diff-detrended series, DC excluded, one-sided density
    weights, then the entropy sum
    (spark_analytics.py:spectral_entropy_table).'''
    from orange3_timeseries_spark.spark_analytics import (
        spectral_entropy_table,
    )
    out = spectral_entropy_table(_events(spark, sf_dir), "value")
    return out.select("user_id", "n_bins",
                      r6(F.col("spectral_entropy"), "spectral_entropy"),
                      r6(F.col("forecastability"), "forecastability"))


@query("matrix_profile_by_user", """
WITH s AS (
  SELECT user_id, value::DOUBLE AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
g AS (SELECT DISTINCT user_id, n FROM s WHERE n <= 4096),
wi AS (SELECT user_id, unnest(range(0, n - 8 + 1)) AS i FROM g),
el AS MATERIALIZED (
  SELECT s.user_id, w.i, s.rn - w.i AS k, s.v
  FROM s JOIN wi w ON s.user_id = w.user_id
   AND s.rn BETWEEN w.i AND w.i + 7),
st AS MATERIALIZED (
  SELECT user_id, i, round(avg(v), 6) AS mu,
         round(stddev_pop(v), 6) AS sg
  FROM el GROUP BY 1, 2),
z AS MATERIALIZED (
  SELECT el.user_id, el.i, el.k, (el.v - st.mu) / st.sg AS z
  FROM el JOIN st ON el.user_id = st.user_id AND el.i = st.i
  WHERE st.sg > 0),
pu AS MATERIALIZED (
  SELECT a.user_id, a.i AS idx, b.i AS j,
         sum(CAST(round((a.z - b.z) * (a.z - b.z) * 1e7, 0) AS BIGINT))
             AS u
  FROM z a JOIN z b ON a.user_id = b.user_id AND a.k = b.k
  WHERE abs(a.i - b.i) >= 4
  GROUP BY 1, 2, 3)
SELECT user_id, idx, j AS nn_idx, round(sqrt(u / 1e7), 6) AS nn_dist
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, idx
                                   ORDER BY u, j) AS rk FROM pu)
WHERE rk = 1
UNION ALL
SELECT user_id, -1 AS idx, n::INT AS nn_idx,
       CAST(NULL AS DOUBLE) AS nn_dist
FROM (SELECT DISTINCT user_id, n FROM s WHERE n > 4096)
""")
def q_matrix_profile_by_user(spark, sf_dir):
    '''Matrix profile (Yeh et al. 2016) per series: for every length-8
    subsequence, the z-normalized Euclidean distance + index of its
    nearest non-trivial neighbor (exclusion zone 4) -- motifs score
    low, discords high.  Window-pair self-join in pure Catalyst;
    pair distances accumulate as order-free BIGINT micro-units so the
    argmin is an integer comparison.  Series past the max_n=4096 cap
    surface as sentinel rows (idx=-1, nn_idx=length, NULL dist), never
    silently vanish (operators/motif.py:matrix_profile).'''
    from orange3_timeseries_spark.operators.motif import matrix_profile

    ev = read_table(spark, sf_dir, "events")
    return matrix_profile(ev, "ts", "value", ["user_id"], m=8)


def _ensemble_sql(origins=(18, 22, 26), horizon=4, season=7):
    """Inverse-MAE forecast-combination replay: per-origin absolute
    errors as exact BIGINT micro-units (never a rounded mean — sums of
    6-dp values over small integer divisors sit exactly on decimal
    rounding boundaries, the one class where Spark's shortest-string
    HALF_UP and a binary-value round systematically disagree), mean
    MAE as plain IEEE division of the integer sum, ``1/(mae+1e-6)``
    weights, fixed naive+drift+snaive accumulation — exactly
    operators/backtest.py:ensemble_forecast."""
    def pred(model, t, h):
        if model == "naive":
            return f"arr[{t}]"
        if model == "drift":
            return (f"(arr[{t}] + {h}.0 * (arr[{t}] - arr[1])"
                    f" / ({t} - 1))")
        return f"arr[{t} + {h} - {season}]"

    def units(model, t):
        return " + ".join(
            f"CAST(round(abs({pred(model, t, h)} - arr[{t} + {h}])"
            f" * 1e6, 0) AS BIGINT)"
            for h in range(1, horizon + 1))

    per = []
    for t in origins:
        per.append(f"""SELECT user_id, n,
       {units('naive', t)} AS un,
       {units('drift', t)} AS ud,
       {units('snaive', t)} AS us
FROM p WHERE n >= {t + horizon}""")
    perorigin = "\nUNION ALL ".join(per)
    fcs = []
    for h in range(1, horizon + 1):
        fn = "arr[n]"
        fd = f"(arr[n] + {h}.0 * (arr[n] - arr[1]) / (n - 1))"
        fs = f"arr[n + {h} - {season}]"
        num = f"(wn * {fn} + wd * {fd} + ws * {fs})"
        fcs.append(f"""SELECT user_id, {h} AS step,
       {fn} AS fc_naive, {fd} AS fc_drift,
       {fs} AS fc_snaive,
       wn AS w_naive, wd AS w_drift,
       ws AS w_snaive,
       {num} / (wn + wd + ws) AS fc_ensemble
FROM f""")
    body = "\nUNION ALL ".join(fcs)
    hz = f"{horizon}.0"
    return f"""
WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                  round(avg(value), 6) AS x
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
p AS (SELECT user_id, list(x ORDER BY day) AS arr, count(*) AS n
      FROM d GROUP BY 1),
perorigin AS (
{perorigin}),
sc AS (SELECT user_id, sum(un) AS sn, sum(ud) AS sd, sum(us) AS ss,
              count(*) AS cnt
       FROM perorigin GROUP BY 1),
f AS (SELECT p.user_id, p.arr, p.n,
             1.0 / ((sc.sn::DOUBLE / ({hz} * sc.cnt::DOUBLE)) / 1e6
                    + 1e-6) AS wn,
             1.0 / ((sc.sd::DOUBLE / ({hz} * sc.cnt::DOUBLE)) / 1e6
                    + 1e-6) AS wd,
             1.0 / ((sc.ss::DOUBLE / ({hz} * sc.cnt::DOUBLE)) / 1e6
                    + 1e-6) AS ws
      FROM p JOIN sc ON p.user_id = sc.user_id)
{body}"""


@query("forecast_ensemble_by_user", _ensemble_sql())
def q_forecast_ensemble_by_user(spark, sf_dir):
    '''Inverse-MAE forecast combination (Bates-Granger) of the three
    closed-form baselines over each user's daily-mean series: rolling-
    origin backtest MAEs (cutoffs 18/22/26, horizon 4) set the weights,
    the combined 4-step forecast launches from the series end.  The
    pipeline-scale default when per-series model selection is too
    expensive -- combination beat every single model in M4
    (operators/backtest.py:ensemble_forecast).'''
    from orange3_timeseries_spark.operators.backtest import (
        ensemble_forecast,
    )

    ev = read_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("value").isNotNull())
             .groupBy("user_id", F.date_trunc("day", F.col("ts"))
                      .alias("day"))
             # round-at-source firewall: packed array elements must be
             # identical doubles on both engines before the closed-form
             # forecast arithmetic
             .agg(F.round(F.avg("value"), 6).alias("x")))
    return ensemble_forecast(daily, "x", "day", ["user_id"],
                             origins=(18, 22, 26), horizon=4, season=7)


@query("approx_quantiles_by_type", """
WITH base AS (
  SELECT event_type, value::DOUBLE AS x FROM events
  WHERE value IS NOT NULL),
ext AS (
  SELECT event_type, min(x) AS mn, max(x) AS mx, count(*) AS n
  FROM base GROUP BY 1),
b AS (
  SELECT base.event_type,
         CASE WHEN mx = mn THEN 0
              ELSE least(CAST(floor((x - mn) / ((mx - mn) / 256.0))
                              AS INT), 255) END AS bin
  FROM base JOIN ext USING (event_type)),
c AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
cm AS (
  SELECT event_type, bin, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM c),
j AS (SELECT cm.*, ext.mn, ext.mx, ext.n
      FROM cm JOIN ext USING (event_type)),
q AS (
  SELECT event_type, p, n,
         CASE WHEN mx = mn THEN mn
              ELSE mn + ((mx - mn) / 256.0)
                   * (bin + (p * n - ((cum - c)::DOUBLE)) / (c::DOUBLE))
         END AS q
  FROM j CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.9,
                                  0.99]::DOUBLE[]) AS p)
  WHERE cum::DOUBLE >= p * n AND (cum - c)::DOUBLE < p * n)
SELECT event_type, p AS prob, n::BIGINT AS n_values,
       round(q, 6) AS quantile
FROM q
""")
def q_approx_quantiles_by_type(spark, sf_dir):
    '''Mergeable-histogram approximate quantiles per event_type -- the
    100 TB alternative to exact percentile sorts AND to
    percentile_approx (whose sketch is merge-order-dependent and
    unreplayable): two map-combinable aggregation passes, fixed
    equi-width bins, deterministic within-bin interpolation, error
    bounded by one bin width (operators/profile.py:
    histogram_quantiles).'''
    from orange3_timeseries_spark.operators.profile import (
        histogram_quantiles,
    )

    ev = read_table(spark, sf_dir, "events")
    return histogram_quantiles(ev, "value", ["event_type"], bins=256)


@query("hilbert_events", """
WITH RECURSIVE pts AS (
  SELECT event_id,
         user_id & 65535 AS x0,
         (epoch_us(ts) // 3600000000) & 65535 AS y0
  FROM events),
rec AS (
  SELECT event_id, x0::BIGINT AS x, y0::BIGINT AS y,
         0::BIGINT AS d, 32768::BIGINT AS s
  FROM pts
  UNION ALL
  SELECT event_id,
         CASE WHEN (y & s) = 0 THEN
              (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN (y & s) = 0 THEN
              (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
              ELSE y END AS y,
         d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                         CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END) AS d,
         s // 2 AS s
  FROM rec WHERE s > 0)
SELECT event_id, d AS hkey
FROM rec WHERE s = 0
""")
def q_hilbert_events(spark, sf_dir):
    '''Hilbert-curve clustering key over (user_id, event hour) -- the
    locality-preserving upgrade of zorder_events: no diagonal jumps,
    so consecutive key ranges cover tighter rectangles and file
    min/max stats prune better on range predicates.  One integer
    aggregate-fold over the 16 levels (pure Catalyst, compact codegen
    body); the oracle replays the xy->d bit transform as a recursive
    CTE carrying (x, y, d, s) -- bit-exact int64 arithmetic
    (operators/partitioning.py:hilbert_key).'''
    from orange3_timeseries_spark.operators.partitioning import (
        hilbert_key,
    )

    ev = read_table(spark, sf_dir, "events")
    hour = F.expr("unix_micros(ts) div 3600000000")
    keyed = ev.select("event_id",
                      F.col("user_id").alias("__hx__"),
                      hour.alias("__hy__"))
    return keyed.select("event_id",
                        hilbert_key("__hx__", "__hy__", 16).alias("hkey"))


@query("risk_metrics_by_user", """
WITH base AS (
  SELECT user_id, ts, value::DOUBLE AS v FROM events
  WHERE value IS NOT NULL AND value > 0),
r AS (
  SELECT user_id,
         CAST(round(ln(v / lag(v) OVER w) * 1e6, 0) AS BIGINT) AS ru,
         round(1.0 - v / max(v) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING), 6)
             AS dd
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
a AS (
  SELECT user_id, count(ru) AS n,
         (sum(ru)::BIGINT::DOUBLE / count(ru)) / 1e6 AS m,
         round(stddev_pop(ru::DOUBLE / 1e6), 6) AS s, max(dd) AS mdd
  FROM r GROUP BY 1)
SELECT user_id, n::BIGINT AS n_returns, m AS mean_return,
       s AS volatility,
       CASE WHEN s > 0 THEN round(m / s, 6) END AS sharpe,
       mdd AS max_drawdown
FROM a WHERE n >= 8
""")
def q_risk_metrics_by_user(spark, sf_dir):
    '''Per-series financial risk trio over the value path: log-return
    volatility, per-period Sharpe ratio, maximum drawdown -- the
    metrics a risk user derives from the price series the reference's
    finance connector fetches.  Log returns are exact BIGINT
    micro-units at SOURCE (ln is the one libm call); mean_return is
    ONE IEEE division of the exact integer sum (never a rounded mean
    of rounded values -- the ensemble_forecast boundary rule); one
    ordered-window pass + one groupBy, exchanges=1
    (operators/risk.py:risk_metrics).'''
    from orange3_timeseries_spark.operators.risk import risk_metrics

    ev = read_table(spark, sf_dir, "events")
    return risk_metrics(ev, "ts", "value", ["user_id"])


@query("quantile_bins_events", """
SELECT event_id, event_type,
       ntile(10) OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS decile
FROM events WHERE value IS NOT NULL
""")
def q_quantile_bins_events(spark, sf_dir):
    '''Equal-frequency discretization (decile binning) of event values
    within each event_type -- the feature-engineering transform
    regression/classifier pipelines consume, and the deterministic
    sibling of histogram_quantiles (exact ranks, not estimates).
    ntile is SQL-standard (first buckets take the remainder), made
    total by the (value, event_id) tie-break; one window pass per
    type partition.'''
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type")
         .orderBy(F.col("value").asc(), F.col("event_id").asc()))
    return (ev.where(F.col("value").isNotNull())
            .select("event_id", "event_type",
                    F.ntile(10).over(w).alias("decile")))


@query("event_transitions", """
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (
  SELECT event_type AS cur_type, next_type, count(*) AS n
  FROM o WHERE next_type IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT cur_type, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.cur_type, c.next_type, c.n::BIGINT AS n_transitions,
       round(c.n / t.tot::DOUBLE, 6) AS prob
FROM c JOIN t ON c.cur_type = t.cur_type
""")
def q_event_transitions(spark, sf_dir):
    '''First-order Markov transition matrix over per-user event-type
    sequences: counts and conditional probabilities P(next | current)
    -- the user-journey/sequence-analytics primitive (funnel drop-off,
    anomalous-flow detection).  Integer counts + one ratio, exact on
    any engine; one ordered window + two skinny aggregations.'''
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    o = ev.select("user_id", "event_type",
                  F.lead("event_type").over(w).alias("next_type"))
    c = (o.where(F.col("next_type").isNotNull())
         .groupBy(F.col("event_type").alias("cur_type"), "next_type")
         .agg(F.count(F.lit(1)).alias("n")))
    t = c.groupBy("cur_type").agg(F.sum("n").alias("tot"))
    return (c.join(F.broadcast(t), "cur_type")
            .select("cur_type", "next_type",
                    F.col("n").cast("bigint").alias("n_transitions"),
                    F.round(F.col("n") / F.col("tot").cast("double"), 6)
                    .alias("prob")))


@query("spearman_by_user", """
WITH e AS (
  SELECT user_id, value::DOUBLE AS x,
         CAST(json_extract(props, '$.k') AS DOUBLE) AS y
  FROM events),
b AS (SELECT user_id, x, y FROM e
      WHERE x IS NOT NULL AND y IS NOT NULL),
r AS (
  SELECT user_id,
         rank() OVER (PARTITION BY user_id ORDER BY x)
           + (count(*) OVER (PARTITION BY user_id, x) - 1) / 2.0 AS rx,
         rank() OVER (PARTITION BY user_id ORDER BY y)
           + (count(*) OVER (PARTITION BY user_id, y) - 1) / 2.0 AS ry
  FROM b),
g AS (SELECT user_id, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
             sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
             sum(rx * ry) AS sxy
      FROM r GROUP BY 1)
SELECT user_id, n::BIGINT AS n_obs,
       CASE WHEN (n::DOUBLE * sxx - sx * sx) > 0
                 AND (n::DOUBLE * syy - sy * sy) > 0
            THEN round((n::DOUBLE * sxy - sx * sy)
                       / sqrt((n::DOUBLE * sxx - sx * sx)
                              * (n::DOUBLE * syy - sy * sy)), 6)
       END AS spearman
FROM g WHERE n >= 8
""")
def q_spearman_by_user(spark, sf_dir):
    '''Spearman rank correlation between the event value and its
    numeric JSON property per series -- the outlier-robust monotone-
    association screen beside the Pearson paths (ccf, rolling_corr).
    Average ranks are exact half-integers, every sum in the closed
    form is exact below 2^53, so the statistic is bit-identical on
    any engine before the cosmetic 6-dp round
    (operators/stattests.py:spearman_corr).'''
    from orange3_timeseries_spark.operators.stattests import (
        spearman_corr,
    )

    ev = read_table(spark, sf_dir, "events")
    ev = ev.withColumn(
        "y", F.get_json_object("props", "$.k").cast("double"))
    return spearman_corr(ev, "value", "y", ["user_id"])


@query("runs_test_by_user", """
WITH b AS (
  SELECT user_id, ts, value::DOUBLE AS v
  FROM events WHERE value IS NOT NULL),
m AS (
  SELECT user_id,
         list_sort(list(v))[CAST(floor((count(*) + 1) / 2) AS INT)] AS med
  FROM b GROUP BY 1),
k AS (
  SELECT b.user_id, ts, CASE WHEN v > med THEN 1 ELSE 0 END AS s
  FROM b JOIN m USING (user_id) WHERE v <> med),
r AS (
  SELECT user_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY ts)
                   IS DISTINCT FROM s THEN 1 ELSE 0 END AS br
  FROM k),
g AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(s)::BIGINT AS a,
         (count(*) - sum(s))::BIGINT AS bl, sum(br)::BIGINT AS runs
  FROM r GROUP BY 1),
z AS (
  SELECT user_id, n, a, bl, runs,
         round((runs::DOUBLE - ((2 * a * bl)::DOUBLE / n::DOUBLE + 1))
               / sqrt(((2 * a * bl)::DOUBLE
                       * ((2 * a * bl)::DOUBLE - n::DOUBLE))
                      / ((n::DOUBLE * n::DOUBLE) * (n::DOUBLE - 1))),
               6) AS z6
  FROM g
  WHERE n >= 20 AND a > 0 AND bl > 0 AND 2 * a * bl > n)
SELECT user_id, n AS n_obs, a AS n_above, bl AS n_below, runs AS n_runs,
       z6 AS z, abs(z6) > 1.959964 AS nonrandom_5pct
FROM z
""")
def q_runs_test_by_user(spark, sf_dir):
    '''Wald-Wolfowitz runs test per series -- the distribution-free
    randomness screen (too few runs = sticky/trending, too many =
    oscillating).  Dichotomized against the lower-median ELEMENT with
    exact ties dropped; E[R]/Var[R] are BIGINT-exact integer products,
    so the z statistic is bit-identical on any engine
    (operators/randomness.py:runs_test).'''
    from orange3_timeseries_spark.operators.randomness import runs_test

    ev = read_table(spark, sf_dir, "events")
    return runs_test(ev, "ts", "value", ["user_id"])


@query("variance_ratio_by_user", """
WITH b AS (
  SELECT user_id, ts,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
l AS (
  SELECT user_id,
         u - lag(u, 1) OVER pw AS x,
         u - lag(u, 4) OVER pw AS y
  FROM b WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT user_id, count(x)::BIGINT AS n, sum(x)::BIGINT AS d,
         sum(y)::BIGINT AS t,
         sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2
  FROM l GROUP BY 1),
c AS (
  SELECT user_id, n,
         n::DOUBLE * sx2::DOUBLE - d::DOUBLE * d::DOUBLE AS av,
         (n::DOUBLE * n::DOUBLE * sy2::DOUBLE
            - 8.0 * n::DOUBLE * d::DOUBLE * t::DOUBLE)
           + (n::DOUBLE - 4 + 1) * 16.0 * d::DOUBLE * d::DOUBLE AS bv,
         (4 * (n - 4 + 1) * (n - 4))::DOUBLE AS f
  FROM g WHERE n >= 40),
v AS (
  SELECT user_id, n, (bv * (n::DOUBLE - 1)) / (av * f) AS vr
  FROM c WHERE av > 0),
z AS (
  SELECT user_id, n, vr,
         round((vr - 1) / sqrt(3.5 / n::DOUBLE), 6) AS z6
  FROM v)
SELECT user_id, n AS n_obs, round(vr, 6) AS vr, z6 AS z,
       abs(z6) > 1.959964 AS reject_rw_5pct
FROM z
""")
def q_variance_ratio_by_user(spark, sf_dir):
    '''Lo-MacKinlay variance-ratio test (q=4) per series -- THE
    standard random-walk screen: VR > 1 momentum, VR < 1 mean
    reversion.  Levels are quantized to integer centi-units at source;
    the overlapping-sum moments expand to bounded BIGINT raw sums
    combined in fixed-order double arithmetic, so VR and z are
    bit-identical cross-engine
    (operators/randomness.py:variance_ratio).'''
    from orange3_timeseries_spark.operators.randomness import (
        variance_ratio,
    )

    ev = read_table(spark, sf_dir, "events")
    return variance_ratio(ev, "ts", "value", ["user_id"])


@query("hac_mean_by_user", """
WITH b AS (
  SELECT user_id, ts,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
l AS (
  SELECT user_id, u,
         lag(u, 1) OVER pw AS u1, lag(u, 2) OVER pw AS u2,
         lag(u, 3) OVER pw AS u3, lag(u, 4) OVER pw AS u4,
         lag(u, 5) OVER pw AS u5
  FROM b WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(u)::BIGINT AS uu,
         sum(u * u)::BIGINT AS p0,
         sum(u * u1)::BIGINT AS p1, sum(u + u1)::BIGINT AS e1,
         sum(u * u2)::BIGINT AS p2, sum(u + u2)::BIGINT AS e2,
         sum(u * u3)::BIGINT AS p3, sum(u + u3)::BIGINT AS e3,
         sum(u * u4)::BIGINT AS p4, sum(u + u4)::BIGINT AS e4,
         sum(u * u5)::BIGINT AS p5, sum(u + u5)::BIGINT AS e5
  FROM l GROUP BY 1),
c AS (
  SELECT user_id, n, n::DOUBLE AS nd, uu::DOUBLE AS ud,
         (nd * nd * p0::DOUBLE - nd * ud * (2.0 * ud))
           + (nd - 0) * ud * ud AS g0,
         (nd * nd * p1::DOUBLE - nd * ud * e1::DOUBLE)
           + (nd - 1) * ud * ud AS g1,
         (nd * nd * p2::DOUBLE - nd * ud * e2::DOUBLE)
           + (nd - 2) * ud * ud AS g2,
         (nd * nd * p3::DOUBLE - nd * ud * e3::DOUBLE)
           + (nd - 3) * ud * ud AS g3,
         (nd * nd * p4::DOUBLE - nd * ud * e4::DOUBLE)
           + (nd - 4) * ud * ud AS g4,
         (nd * nd * p5::DOUBLE - nd * ud * e5::DOUBLE)
           + (nd - 5) * ud * ud AS g5
  FROM g WHERE n >= 30),
d AS (
  SELECT user_id, n, nd, ud, g0,
         6.0 * g0 + 10.0 * g1 + 8.0 * g2 + 6.0 * g3 + 4.0 * g4
           + 2.0 * g5 AS lrvn,
         (100.0 * nd) * (100.0 * nd) * nd AS deng
  FROM c)
SELECT user_id, n AS n_obs, ud / (100.0 * nd) AS mean,
       round(g0 / deng, 6) AS gamma0,
       round(lrvn / (6.0 * deng), 6) AS lrv,
       round(sqrt((lrvn / (6.0 * deng)) / nd), 6) AS se_mean,
       round(6.0 * nd * g0 / lrvn, 6) AS n_eff
FROM d WHERE g0 > 0 AND lrvn > 0
""")
def q_hac_mean_by_user(spark, sf_dir):
    '''Newey-West HAC inference on each series mean: Bartlett-kernel
    long-run variance, autocorrelation-robust standard error, and the
    effective sample size n_eff = n*gamma0/lrv -- the honest "how many
    independent observations is this series worth?" number a sampling
    stage budgets against.  Centi-unit lag moments are bounded exact
    BIGINTs combined in fixed-order double arithmetic
    (operators/randomness.py:hac_mean).'''
    from orange3_timeseries_spark.operators.randomness import hac_mean

    ev = read_table(spark, sf_dir, "events")
    return hac_mean(ev, "ts", "value", ["user_id"])


@query("permutation_entropy_by_user", """
WITH b AS (
  SELECT user_id, ts, value::DOUBLE AS v
  FROM events WHERE value IS NOT NULL),
l AS (
  SELECT user_id, lag(v, 2) OVER pw AS a, lag(v, 1) OVER pw AS m,
         v AS c
  FROM b WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
p AS (
  SELECT user_id,
         CASE WHEN a <= m AND m <= c THEN 0
              WHEN a <= m AND c < m AND a <= c THEN 1
              WHEN a <= m AND c < m AND c < a THEN 4
              WHEN m < a AND a <= c THEN 2
              WHEN m < a AND c < a AND m <= c THEN 3
              ELSE 5 END AS pid
  FROM l WHERE a IS NOT NULL),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CASE WHEN pid = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
         sum(CASE WHEN pid = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN pid = 2 THEN 1 ELSE 0 END)::BIGINT AS c2,
         sum(CASE WHEN pid = 3 THEN 1 ELSE 0 END)::BIGINT AS c3,
         sum(CASE WHEN pid = 4 THEN 1 ELSE 0 END)::BIGINT AS c4,
         sum(CASE WHEN pid = 5 THEN 1 ELSE 0 END)::BIGINT AS c5
  FROM p GROUP BY 1)
SELECT user_id, n AS n_triples,
       ((CASE WHEN c0 > 0 THEN 1 ELSE 0 END
         + CASE WHEN c1 > 0 THEN 1 ELSE 0 END)
         + CASE WHEN c2 > 0 THEN 1 ELSE 0 END
         + CASE WHEN c3 > 0 THEN 1 ELSE 0 END
         + CASE WHEN c4 > 0 THEN 1 ELSE 0 END
         + CASE WHEN c5 > 0 THEN 1 ELSE 0 END)::INT AS n_patterns,
       round(-(((((( 0.0
         + CASE WHEN c0 > 0 THEN (c0::DOUBLE / n::DOUBLE)
                        * ln(c0::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         + CASE WHEN c1 > 0 THEN (c1::DOUBLE / n::DOUBLE)
                        * ln(c1::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         + CASE WHEN c2 > 0 THEN (c2::DOUBLE / n::DOUBLE)
                        * ln(c2::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         + CASE WHEN c3 > 0 THEN (c3::DOUBLE / n::DOUBLE)
                        * ln(c3::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         + CASE WHEN c4 > 0 THEN (c4::DOUBLE / n::DOUBLE)
                        * ln(c4::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         + CASE WHEN c5 > 0 THEN (c5::DOUBLE / n::DOUBLE)
                        * ln(c5::DOUBLE / n::DOUBLE) ELSE 0.0 END)
         / 1.791759469228055, 6) AS pe
FROM g WHERE n >= 30
""")
def q_permutation_entropy_by_user(spark, sf_dir):
    '''Bandt-Pompe permutation entropy (order 3) per series -- the
    ordinal-complexity leg of the randomness triage: pe -> 1 white
    noise, -> 0 deterministic dynamics.  Integer pattern counts are
    the only aggregates; the entropy is a fixed-order expression over
    them (operators/randomness.py:permutation_entropy).'''
    from orange3_timeseries_spark.operators.randomness import (
        permutation_entropy,
    )

    ev = read_table(spark, sf_dir, "events")
    return permutation_entropy(ev, "ts", "value", ["user_id"])


@query("assoc_rules_events", """
WITH base AS (
  SELECT DISTINCT user_id AS b, event_type AS i FROM events),
uu AS (SELECT count(DISTINCT b)::BIGINT AS u FROM base),
inn AS (SELECT i, count(*)::BIGINT AS ni FROM base GROUP BY 1),
p AS (
  SELECT l.i AS antecedent, r.i AS consequent, count(*)::BIGINT AS n_both
  FROM base l JOIN base r ON l.b = r.b AND l.i <> r.i
  GROUP BY 1, 2)
SELECT antecedent, consequent, n_both,
       round(n_both::DOUBLE / u::DOUBLE, 6) AS support,
       round(n_both::DOUBLE / na.ni::DOUBLE, 6) AS confidence,
       round((n_both * u)::DOUBLE / (na.ni * nb.ni)::DOUBLE, 6) AS lift
FROM p
CROSS JOIN uu
JOIN inn na ON p.antecedent = na.i
JOIN inn nb ON p.consequent = nb.i
WHERE n_both >= 5
""")
def q_assoc_rules_events(spark, sf_dir):
    '''Directional association rules between event types over user
    baskets (support / confidence / lift) -- the co-occurrence
    companion to the sequential event_transitions matrix.  All three
    ratios are single divisions of exact BIGINT counts
    (operators/eventstats.py:assoc_rules).'''
    from orange3_timeseries_spark.operators.eventstats import assoc_rules

    ev = read_table(spark, sf_dir, "events")
    return assoc_rules(ev, "user_id", "event_type")


def _dtw_sql():
    k = 7
    cells = k * k
    return f"""
WITH RECURSIVE b AS (
  SELECT user_id,
         (((epoch_us(ts) // 86400000000 + 3) % 7) + 7) % 7 AS dow,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
up AS (
  SELECT user_id, dow,
         CAST(floor((sum(cents) * 10000)::DOUBLE / count(*)::DOUBLE)
              AS BIGINT) AS su
  FROM b GROUP BY 1, 2),
ua AS (
  SELECT user_id, list(su ORDER BY dow) AS a
  FROM up GROUP BY 1 HAVING count(*) = {k}),
gp AS (
  SELECT dow,
         CAST(floor((sum(cents) * 10000)::DOUBLE / count(*)::DOUBLE)
              AS BIGINT) AS su
  FROM b GROUP BY 1),
ga AS (SELECT list(su ORDER BY dow) AS g FROM gp),
dp AS (
  SELECT user_id, a, g, 1 AS t,
         [abs(a[1] - g[1])] AS d
  FROM ua CROSS JOIN ga
  UNION ALL
  SELECT user_id, a, g, t + 1,
         list_append(d,
           abs(a[((t + 1) - 1) // {k} + 1] - g[((t + 1) - 1) % {k} + 1])
           + CASE WHEN t + 1 <= {k} THEN d[t]
                  WHEN (t + 1 - 1) % {k} = 0 THEN d[t + 1 - {k}]
                  ELSE least(d[t + 1 - {k}], d[t + 1 - {k} - 1], d[t])
             END)
  FROM dp WHERE t < {cells})
SELECT user_id, d[{cells}]::DOUBLE / 1000000.0 AS dtw
FROM dp WHERE t = {cells}
"""


@query("dtw_dow_profile_by_user", _dtw_sql())
def q_dtw_dow_profile_by_user(spark, sf_dir):
    '''DTW distance between each user's day-of-week mean profile and
    the corpus-wide profile -- the "same weekly shape, shifted phase?"
    ranking Euclidean distance gets wrong.  The O(K^2) dynamic program
    runs as pure Catalyst nested aggregate folds over exact BIGINT
    micro-unit arrays (runtime loops, no codegen unroll, no Python);
    the oracle replays the identical recurrence cell-by-cell through a
    flattened recursive CTE in row-major order
    (operators/dtw.py:dtw_units_expr).'''
    from orange3_timeseries_spark.operators.dtw import dtw_units_expr

    k = 7
    ev = read_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    dow = (((F.floor(F.unix_micros("ts") / F.lit(86400000000)) + 3)
            % 7) + 7) % 7  # pmod: pre-1970 days must not go negative
    cents = F.round(F.col("value").cast("double") * 100.0).cast("bigint")
    b = ev.select("user_id", dow.alias("dow"), cents.alias("cents"))
    su = F.floor((F.sum("cents") * 10000).cast("double")
                 / F.count(F.lit(1)).cast("double")).cast("bigint")
    up = b.groupBy("user_id", "dow").agg(su.alias("su"))
    ua = (up.groupBy("user_id")
          .agg(F.transform(
              F.array_sort(F.collect_list(F.struct("dow", "su"))),
              lambda s: s["su"]).alias("a"),
              F.count(F.lit(1)).alias("__k__"))
          .where(F.col("__k__") == k).drop("__k__"))
    gp = b.groupBy("dow").agg(su.alias("su"))
    ga = gp.agg(F.transform(
        F.array_sort(F.collect_list(F.struct("dow", "su"))),
        lambda s: s["su"]).alias("g"))
    j = ua.crossJoin(F.broadcast(ga))
    units = dtw_units_expr(F.col("a"), F.col("g"), k)
    return j.select("user_id",
                    (units.cast("double") / F.lit(1000000.0))
                    .alias("dtw"))


@query("turning_points_by_user", """
WITH b AS (
  SELECT user_id, ts, value::DOUBLE AS v
  FROM events WHERE value IS NOT NULL),
l AS (
  SELECT user_id,
         lag(v) OVER pw AS p, v AS c, lead(v) OVER pw AS nx
  FROM b WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                   AND ((p < c AND nx < c) OR (p > c AND nx > c))
                  THEN 1 ELSE 0 END)::BIGINT AS t
  FROM l GROUP BY 1),
z AS (
  SELECT user_id, n, t,
         round((t::DOUBLE - 2.0 * (n::DOUBLE - 2) / 3.0)
               / sqrt((16.0 * n::DOUBLE - 29) / 90.0), 6) AS z6
  FROM g WHERE n >= 20)
SELECT user_id, n AS n_obs, t AS n_turning, z6 AS z,
       abs(z6) > 1.959964 AS nonrandom_5pct
FROM z
""")
def q_turning_points_by_user(spark, sf_dir):
    '''Turning-points randomness test per series (Kendall): count of
    strict local extrema vs the iid expectation 2(n-2)/3 -- the cheap
    trend-vs-oscillation screen beside runs_test that needs no median
    pass.  Integer moments, single divisions, rounded-z verdict
    (operators/randomness.py:turning_points_test).'''
    from orange3_timeseries_spark.operators.randomness import (
        turning_points_test,
    )

    ev = read_table(spark, sf_dir, "events")
    return turning_points_test(ev, "ts", "value", ["user_id"])


@query("page_hinkley_by_user", """
WITH b AS (
  SELECT user_id, ts,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
w1 AS (
  SELECT user_id, ts, u,
         row_number() OVER pw AS t,
         sum(u) OVER (pw ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS s,
         count(*) OVER pf AS n,
         sum(u) OVER pf AS uu,
         sum(u * u) OVER pf AS u2
  FROM b
  WINDOW pw AS (PARTITION BY user_id ORDER BY ts),
         pf AS (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)),
w2 AS (
  SELECT user_id, ts, n,
         sqrt((n::DOUBLE * u2::DOUBLE - uu::DOUBLE * uu::DOUBLE)
              / ((n::DOUBLE * n::DOUBLE) * 10000.0)) AS sig,
         (u * t - s)::DOUBLE / (100.0 * t::DOUBLE) AS term
  FROM w1),
w3 AS (
  SELECT user_id, ts, n, sig,
         sum(term - 0.5 * sig) OVER (pw ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS mu,
         sum(term + 0.5 * sig) OVER (pw ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS md
  FROM w2 WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
w4 AS (
  SELECT user_id, ts, n, 5.0 * sig AS lam,
         mu - min(mu) OVER (pw ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pu,
         max(md) OVER (pw ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) - md AS pd
  FROM w3 WINDOW pw AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT user_id, max(n)::BIGINT AS n_obs, max(pu) AS phu,
         max(pd) AS phd, max(lam) AS lam,
         min(CASE WHEN pu > lam OR pd > lam THEN ts END) AS alarm_ts
  FROM w4 GROUP BY 1)
SELECT user_id, n_obs, round(phu, 6) AS ph_up, round(phd, 6) AS ph_down,
       round(lam, 6) AS lambda_thr,
       alarm_ts IS NOT NULL AS alarm, alarm_ts
FROM g WHERE n_obs >= 30 AND lam > 0
""")
def q_page_hinkley_by_user(spark, sf_dir):
    '''Page-Hinkley sequential mean-shift detector per series (both
    directions, running-mean baseline, sigma-scaled slack/threshold)
    -- the drift test that catches GRADUAL shifts cusum's fixed
    reference dilutes.  Each term is one division of exact BIGINT
    prefix sums; the cumulations are sequential running-frame sums of
    bit-identical doubles (operators/drift.py:page_hinkley).'''
    from orange3_timeseries_spark.operators.drift import page_hinkley

    ev = read_table(spark, sf_dir, "events")
    return page_hinkley(ev, "ts", "value", ["user_id"])


@query("transition_entropy_by_user", """
WITH b AS (
  SELECT user_id, event_type AS a,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nb
  FROM events WHERE event_type IS NOT NULL),
p AS (
  SELECT user_id, a, nb, count(*)::BIGINT AS nab
  FROM b WHERE nb IS NOT NULL GROUP BY 1, 2, 3),
w AS (
  SELECT user_id, a, nb, nab,
         sum(nab) OVER (PARTITION BY user_id, a) AS na,
         sum(nab) OVER (PARTITION BY user_id) AS nn
  FROM p),
g AS (
  SELECT user_id, max(nn)::BIGINT AS n_transitions,
         len(list_distinct(flatten(list([a, nb]))))::INT AS n_states,
         (-sum((nab::DOUBLE / nn::DOUBLE)
               * ln(nab::DOUBLE / na::DOUBLE))) AS h
  FROM w GROUP BY 1)
SELECT user_id, n_transitions, n_states, round(h, 6) AS h_cond,
       CASE WHEN n_states > 1
            THEN round(1.0 - h / ln(n_states::DOUBLE), 6)
       END AS predictability
FROM g WHERE n_transitions >= 20
""")
def q_transition_entropy_by_user(spark, sf_dir):
    '''Conditional entropy H(next|current) of each user's event-type
    stream plus the normalized predictability score -- the scalar
    summary of the event_transitions matrix that routes replayable
    protocol sessions away from noise.  Exact BIGINT counts, single
    divisions per term (operators/eventstats.py:transition_entropy).'''
    from orange3_timeseries_spark.operators.eventstats import (
        transition_entropy,
    )

    ev = read_table(spark, sf_dir, "events")
    return transition_entropy(ev, "ts", "event_type", ["user_id"])


@query("incremental_daily_rollup", """
WITH b AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS day,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT user_id, day::BIGINT AS day, count(*)::BIGINT AS n,
         sum(u)::BIGINT AS su, min(u)::BIGINT AS mn,
         max(u)::BIGINT AS mx
  FROM b GROUP BY 1, 2)
SELECT user_id, day, n AS n_events,
       su::DOUBLE / 100.0 AS total,
       mn::DOUBLE / 100.0 AS vmin,
       mx::DOUBLE / 100.0 AS vmax,
       su::DOUBLE / (n * 100)::DOUBLE AS mean
FROM g
""")
def q_incremental_daily_rollup(spark, sf_dir):
    '''Incremental ETL contract: the first half of the month is reduced
    to a parquet STATE TABLE of exact BIGINT partial aggregates
    (written day-partitioned, read back), the second half is folded in
    with one skinny merge -- and the served rollup must hash
    IDENTICALLY to the oracle's full recompute over all raw rows.
    This is the 100 TB daily-pipeline shape: history is never
    rescanned, and because the state is integer-exact the merge is
    associative in any order/partitioning (float partials are not)
    (operators/incremental.py).'''
    import os
    import tempfile

    from orange3_timeseries_spark.operators.incremental import (
        merge_states,
        rollup_state,
        serve_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    cutoff = "2024-01-16"   # mid-range of the fixtures' January span
    old = rollup_state(ev.where(F.col("ts") < cutoff), "ts", "value",
                       ["user_id"])
    # FIXED overwrite path per process: a fresh mkdtemp per call would
    # leak a /tmp directory every bench/driver invocation, while a
    # shared unnamespaced path lets two concurrent sessions clobber
    # each other mid read-back (the ARIMA/VAR registry convention)
    path = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_rollup_state_{os.getpid()}")
    old.write.mode("overwrite").partitionBy("day").parquet(path)
    delta = rollup_state(ev.where(F.col("ts") >= cutoff), "ts", "value",
                         ["user_id"])
    try:
        state = spark.read.parquet(path) \
            .select("user_id", "day", "n", "sum_units", "min_units",
                    "max_units")
    except Exception:   # empty pre-cutoff slice -> schema-less dir
        state = old
    return serve_rollup(merge_states(state, delta))


@query("mann_whitney_purchase_by_user", """
WITH b AS (
  SELECT user_id,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS su,
         event_type = 'purchase' AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
r AS (
  SELECT user_id, su, y,
         2 * rank() OVER (PARTITION BY user_id ORDER BY su)
           + (count(*) OVER (PARTITION BY user_id, su) - 1) AS rk2,
         count(*) OVER (PARTITION BY user_id, su) AS tc
  FROM b),
ties AS (
  SELECT user_id, sum(tg * tg * tg - tg)::BIGINT AS t
  FROM (SELECT user_id, su, max(tc) AS tg FROM r GROUP BY 1, 2)
  GROUP BY 1),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN y THEN rk2 END)::BIGINT AS s2
  FROM r GROUP BY 1),
c AS (
  SELECT g.user_id, n, n1, (n - n1)::BIGINT AS n2, s2, t,
         s2::DOUBLE / 2.0 - (n1 * (n1 + 1))::DOUBLE / 2.0 AS u,
         (n1 * (n - n1))::DOUBLE / 2.0 AS mu,
         (n1 * (n - n1))::DOUBLE / 12.0
           * ((n::DOUBLE + 1) - t::DOUBLE
              / (n::DOUBLE * (n::DOUBLE - 1))) AS v
  FROM g JOIN ties ON g.user_id = ties.user_id),
z AS (
  SELECT user_id, n1, n2, u,
         round(u / (n1 * n2)::DOUBLE, 6) AS auc,
         round((u - mu) / sqrt(v), 6) AS z6
  FROM c WHERE n1 >= 8 AND n2 >= 8 AND v > 0)
SELECT user_id, n1 AS n_pos, n2 AS n_neg, round(u, 1) AS u_stat,
       auc, z6 AS z, abs(z6) > 1.959964 AS significant_5pct
FROM z
""")
def q_mann_whitney_purchase_by_user(spark, sf_dir):
    '''Mann-Whitney rank-sum test per user: do purchase events carry a
    different value distribution than the user's other events?  The
    distribution-free two-sample screen (tie-corrected normal
    approximation) plus the common-language effect size (AUC).
    Centi-unit integer scores, BIGINT doubled-ranks and tie sums,
    fixed-order double combinations
    (operators/stattests.py:mann_whitney).'''
    from orange3_timeseries_spark.operators.stattests import mann_whitney

    ev = read_table(spark, sf_dir, "events") \
        .where(F.col("event_type").isNotNull())
    ev = ev.select(
        "user_id",
        F.round(F.col("value").cast("double") * 100.0).cast("bigint")
        .alias("su"),
        (F.col("event_type") == "purchase").alias("y"))
    return mann_whitney(ev, "su", "y", ["user_id"])


@query("dow_anova_by_user", """
WITH b AS (
  SELECT user_id,
         (((epoch_us(ts) // 86400000000 + 3) % 7) + 7) % 7 AS d,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT user_id,
         sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN d = 0 THEN u END)::BIGINT AS s0,
         sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN d = 1 THEN u END)::BIGINT AS s1,
         sum(CASE WHEN d = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN d = 2 THEN u END)::BIGINT AS s2,
         sum(CASE WHEN d = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
         sum(CASE WHEN d = 3 THEN u END)::BIGINT AS s3,
         sum(CASE WHEN d = 4 THEN 1 ELSE 0 END)::BIGINT AS n4,
         sum(CASE WHEN d = 4 THEN u END)::BIGINT AS s4,
         sum(CASE WHEN d = 5 THEN 1 ELSE 0 END)::BIGINT AS n5,
         sum(CASE WHEN d = 5 THEN u END)::BIGINT AS s5,
         sum(CASE WHEN d = 6 THEN 1 ELSE 0 END)::BIGINT AS n6,
         sum(CASE WHEN d = 6 THEN u END)::BIGINT AS s6,
         count(*)::BIGINT AS n, sum(u)::BIGINT AS s,
         sum(u * u)::BIGINT AS q
  FROM b GROUP BY 1),
c AS (
  SELECT user_id, n,
         q::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE AS sst,
         ((((((0.0
           + s0::DOUBLE * s0::DOUBLE / n0::DOUBLE)
           + s1::DOUBLE * s1::DOUBLE / n1::DOUBLE)
           + s2::DOUBLE * s2::DOUBLE / n2::DOUBLE)
           + s3::DOUBLE * s3::DOUBLE / n3::DOUBLE)
           + s4::DOUBLE * s4::DOUBLE / n4::DOUBLE)
           + s5::DOUBLE * s5::DOUBLE / n5::DOUBLE)
           + s6::DOUBLE * s6::DOUBLE / n6::DOUBLE
           - s::DOUBLE * s::DOUBLE / n::DOUBLE AS ssb
  FROM g
  WHERE n >= 50 AND n0 > 0 AND n1 > 0 AND n2 > 0 AND n3 > 0
    AND n4 > 0 AND n5 > 0 AND n6 > 0),
f AS (
  SELECT user_id, n, sst, ssb,
         CASE WHEN sst - ssb > 0
              THEN round((ssb / 6.0) / ((sst - ssb) / (n::DOUBLE - 7)),
                         6)
         END AS f6
  FROM c WHERE sst > 0)
SELECT user_id, n AS n_obs, f6 AS f_stat,
       round(ssb / sst, 6) AS eta_sq,
       CASE WHEN sst - ssb > 0 THEN f6 > 2.098598
            ELSE ssb > 0 END AS seasonal_5pct
FROM f
""")
def q_dow_anova_by_user(spark, sf_dir):
    '''One-way day-of-week ANOVA per series -- "is the weekly
    seasonality statistically real?", the gate in front of the
    seasonal decomposition tier.  Exact BIGINT per-weekday moments
    pivoted to columns, fixed-order SSB/SST combination, rounded-F
    verdict against the F(6, inf) 5% point
    (operators/stattests.py:dow_anova).'''
    from orange3_timeseries_spark.operators.stattests import dow_anova

    ev = read_table(spark, sf_dir, "events")
    return dow_anova(ev, "ts", "value", ["user_id"])


@query("kruskal_dow_by_user", """
WITH b AS (
  SELECT user_id,
         (((epoch_us(ts) // 86400000000 + 3) % 7) + 7) % 7 AS d,
         CAST(round(value::DOUBLE * 100.0) AS BIGINT) AS u
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT user_id, d, u,
         2 * rank() OVER (PARTITION BY user_id ORDER BY u)
           + (count(*) OVER (PARTITION BY user_id, u) - 1) AS rk2,
         count(*) OVER (PARTITION BY user_id, u) AS tc
  FROM b),
ties AS (
  SELECT user_id, sum(tg * tg * tg - tg)::BIGINT AS t
  FROM (SELECT user_id, u, max(tc) AS tg FROM r GROUP BY 1, 2)
  GROUP BY 1),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN d = 0 THEN rk2 END)::BIGINT AS r0,
         sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN d = 1 THEN rk2 END)::BIGINT AS r1,
         sum(CASE WHEN d = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN d = 2 THEN rk2 END)::BIGINT AS r2,
         sum(CASE WHEN d = 3 THEN 1 ELSE 0 END)::BIGINT AS n3,
         sum(CASE WHEN d = 3 THEN rk2 END)::BIGINT AS r3,
         sum(CASE WHEN d = 4 THEN 1 ELSE 0 END)::BIGINT AS n4,
         sum(CASE WHEN d = 4 THEN rk2 END)::BIGINT AS r4,
         sum(CASE WHEN d = 5 THEN 1 ELSE 0 END)::BIGINT AS n5,
         sum(CASE WHEN d = 5 THEN rk2 END)::BIGINT AS r5,
         sum(CASE WHEN d = 6 THEN 1 ELSE 0 END)::BIGINT AS n6,
         sum(CASE WHEN d = 6 THEN rk2 END)::BIGINT AS r6
  FROM r GROUP BY 1),
c AS (
  SELECT g.user_id, n,
         round((12.0 / (n::DOUBLE * (n::DOUBLE + 1))
           * (((((((0.0
             + (r0::DOUBLE / 2.0) * (r0::DOUBLE / 2.0) / n0::DOUBLE)
             + (r1::DOUBLE / 2.0) * (r1::DOUBLE / 2.0) / n1::DOUBLE)
             + (r2::DOUBLE / 2.0) * (r2::DOUBLE / 2.0) / n2::DOUBLE)
             + (r3::DOUBLE / 2.0) * (r3::DOUBLE / 2.0) / n3::DOUBLE)
             + (r4::DOUBLE / 2.0) * (r4::DOUBLE / 2.0) / n4::DOUBLE)
             + (r5::DOUBLE / 2.0) * (r5::DOUBLE / 2.0) / n5::DOUBLE)
             + (r6::DOUBLE / 2.0) * (r6::DOUBLE / 2.0) / n6::DOUBLE)
           - 3.0 * (n::DOUBLE + 1))
           / (1.0 - t::DOUBLE
              / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)),
           6) AS h6
  FROM g JOIN ties ON g.user_id = ties.user_id
  WHERE n >= 50 AND n0 > 0 AND n1 > 0 AND n2 > 0 AND n3 > 0
    AND n4 > 0 AND n5 > 0 AND n6 > 0
    AND 1.0 - t::DOUBLE
        / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) > 0)
SELECT user_id, n AS n_obs, h6 AS h_stat,
       h6 > 12.591587 AS seasonal_5pct
FROM c
""")
def q_kruskal_dow_by_user(spark, sf_dir):
    '''Kruskal-Wallis H weekly-seasonality gate per series -- the
    rank-based, outlier-immune companion to dow_anova with an EXACT
    chi-square(6) critical value.  BIGINT doubled-ranks, exact tie
    sums, fixed-order H combination
    (operators/stattests.py:kruskal_dow).'''
    from orange3_timeseries_spark.operators.stattests import kruskal_dow

    ev = read_table(spark, sf_dir, "events")
    return kruskal_dow(ev, "ts", "value", ["user_id"])


def _window_funnel_sql(steps, w_us=3_600_000_000):
    """N-step anchor-forwarding funnel replay.  The strict-past frames
    are RANGE frames on the integer-microsecond timestamp (``RANGE
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``) — rows tied on
    (series, ts) are excluded by VALUE, so the chain is deterministic
    under any tie order, exactly like the operator."""
    types = ", ".join(f"'{s}'" for s in steps)
    ctes = [f"""b AS (
  SELECT user_id, event_type AS e, epoch_us(ts) AS t
  FROM events WHERE event_type IN ({types})),
w1 AS (
  SELECT user_id, e, t,
         CASE WHEN e = '{steps[0]}' THEN t END AS a1
  FROM b)"""]
    for i in range(2, len(steps) + 1):
        ctes.append(f"""w{i} AS (
  SELECT user_id, e, t, {', '.join(f'a{j}' for j in range(1, i))},
         CASE WHEN e = '{steps[i - 1]}'
                   AND max(a{i - 1})
                         OVER (PARTITION BY user_id ORDER BY t
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                       >= t - {w_us} THEN
           max(a{i - 1}) OVER (PARTITION BY user_id ORDER BY t
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) END AS a{i}
  FROM w{i - 1})""")
    lvl = "CASE " + " ".join(
        f"WHEN a{i} IS NOT NULL THEN {i}"
        for i in range(len(steps), 0, -1)) + " ELSE 0 END"
    return f"""
WITH {', '.join(ctes)}
SELECT user_id, max({lvl})::INT AS funnel_level,
       count(*)::BIGINT AS n_events
FROM w{len(steps)} GROUP BY 1
"""


@query("window_funnel_by_user",
       _window_funnel_sql(("view", "click", "purchase")))
def q_window_funnel_by_user(spark, sf_dir):
    '''ClickHouse-windowFunnel-style sliding-window funnel per user:
    deepest view->click->purchase chain with every step inside ONE
    HOUR of the anchoring view, through ANY chain (not just first
    touch).  Anchor-forwarding window algebra on exact integer
    microseconds with strict-past RANGE frames (tie-order
    deterministic) -- bit-exact cross-engine, one ordered pass
    (operators/eventstats.py:window_funnel).'''
    from orange3_timeseries_spark.operators.eventstats import (
        window_funnel,
    )

    ev = read_table(spark, sf_dir, "events")
    return window_funnel(ev, "ts", "event_type", ["user_id"])


@query("window_funnel4_by_user",
       _window_funnel_sql(("signup", "view", "click", "purchase")))
def q_window_funnel4_by_user(spark, sf_dir):
    '''Four-step sliding-window funnel (signup->view->click->purchase,
    one hour): the N-step generalization of window_funnel_by_user --
    the anchor-forwarding construction chains once per extra step,
    still one window exchange (the k-1 running maxes share a single
    window spec) (operators/eventstats.py:window_funnel).'''
    from orange3_timeseries_spark.operators.eventstats import (
        window_funnel,
    )

    ev = read_table(spark, sf_dir, "events")
    return window_funnel(ev, "ts", "event_type", ["user_id"],
                         steps=("signup", "view", "click", "purchase"))


# --------------------------------------------------------- round-9 additions
@query("ccf_value_volume_by_user", """
WITH daily AS (
  -- the 4dp daily mean from EXACT integer sums: one shared division of
  -- two exact integers + round (a float avg's accumulation order could
  -- straddle the rounding tie; ties here divide to exactly .5 where
  -- HALF_UP and half-away agree for either sign)
  SELECT user_id,
         epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
         CAST(round((sum(CAST(round(value * 100) AS BIGINT)) * 100)::DOUBLE
                    / count(*)) AS BIGINT) AS xu,
         count(*)::BIGINT AS yu
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2),
l AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
p AS (SELECT a.user_id, l.lag, a.xu, b.yu
      FROM daily a CROSS JOIN l
      JOIN daily b ON b.user_id = a.user_id AND b.d = a.d + l.lag),
g AS (SELECT user_id, lag, count(*)::BIGINT AS n,
             sum(xu)::BIGINT AS sx, sum(yu)::BIGINT AS sy,
             sum(xu * yu)::BIGINT AS sxy,
             sum(xu * xu)::BIGINT AS sxx,
             sum(yu * yu)::BIGINT AS syy
      FROM p GROUP BY 1, 2)
SELECT user_id, CAST(lag AS INT) AS lag, n AS n_days,
       (n * sxy - sx * sy)::DOUBLE
       / (sqrt((n * sxx - sx * sx)::DOUBLE)
          * sqrt((n * syy - sy * sy)::DOUBLE)) AS ccf
FROM g
WHERE n >= 8 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
""")
def q_ccf_value_volume_by_user(spark, sf_dir):
    """Daily value-vs-volume cross-correlation at lags -3..3 per user —
    'does the metric follow activity' (operators/eventstats.py:
    ccf_value_volume).  All five Pearson moments are exact int64 over
    4dp-quantized daily means and integer counts, so the correlation is
    bit-identical cross-engine and ships unrounded."""
    from orange3_timeseries_spark.operators.eventstats import (
        ccf_value_volume,
    )

    ev = read_table(spark, sf_dir, "events")
    return ccf_value_volume(ev, "ts", "value", ["user_id"])


@query("hurst_rs_scales_by_user", """
WITH base AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS u,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t,
         count(*) OVER (PARTITION BY user_id) AS ntot
  FROM events WHERE value IS NOT NULL),
sc AS (SELECT unnest([8, 16, 32]) AS n),
fb AS (SELECT b.user_id, sc.n, (b.t - 1) // sc.n AS blk,
              b.t - ((b.t - 1) // sc.n) * sc.n AS k, b.u, b.t
       FROM base b CROSS JOIN sc
       WHERE (b.t - 1) // sc.n < b.ntot // sc.n),
wr AS (SELECT user_id, n, blk,
              n * (sum(u) OVER w) - k * (sum(u) OVER bw) AS z,
              n * (sum(u * u) OVER bw)
                - (sum(u) OVER bw) * (sum(u) OVER bw) AS s2
       FROM fb
       WINDOW w AS (PARTITION BY user_id, n, blk ORDER BY t
                    ROWS UNBOUNDED PRECEDING),
              bw AS (PARTITION BY user_id, n, blk)),
blocks AS (SELECT user_id, n, blk,
                  (max(z) - min(z))::BIGINT AS r, max(s2)::BIGINT AS s2
           FROM wr GROUP BY 1, 2, 3 HAVING max(s2) > 0),
ps AS (SELECT user_id, n,
              (sum(CAST(round(r::DOUBLE / sqrt(s2::DOUBLE) * 1e6)
                        AS BIGINT))::BIGINT)::DOUBLE
              / count(*) / 1e6 AS mrs
       FROM blocks GROUP BY 1, 2),
pv AS (SELECT user_id,
              max(CASE WHEN n = 8 THEN mrs END) AS rs8,
              max(CASE WHEN n = 16 THEN mrs END) AS rs16,
              max(CASE WHEN n = 32 THEN mrs END) AS rs32
       FROM ps GROUP BY 1)
SELECT user_id, rs8, rs16, rs32,
       round(CASE WHEN rs8 > 0 AND rs32 > 0
                  THEN (ln(rs32) - ln(rs8)) / 1.3862943611198908 END, 6) AS hurst
FROM pv
""")
def q_hurst_rs_scales_by_user(spark, sf_dir):
    '''Hurst exponent by rescaled-range analysis at octave scales
    8/16/32 per user (operators/trend.py:hurst_rs): block R/S =
    R_int/sqrt(S_int) from exact 0.01-grid integer units, H = the
    closed-form log-log slope over the octave-spaced scales.  The
    across-block mean is an exact BIGINT sum of 6dp-snapped block R/S
    micro-units over the block count (order-free both engines); the
    rs columns are emitted UNROUNDED — the mean is an exact
    grid/smallint rational, which a second 6dp round would park
    exactly on cross-engine tie boundaries.'''
    from orange3_timeseries_spark.operators.trend import hurst_rs

    ev = read_table(spark, sf_dir, "events")
    return hurst_rs(ev, "ts", "value", ["user_id"],
                    tie_cols=("event_id",))


@query("reconcile_forecasts_by_user", """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(round(value * 100)::BIGINT) AS u
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
b AS (SELECT max(day) AS mx FROM daily),
grid AS (SELECT user_id, h
         FROM (SELECT DISTINCT user_id FROM daily)
         CROSS JOIN (SELECT unnest(range(1, 8))::INT AS h)),
bu AS (SELECT user_id, (datediff('day', mx, day) + 7)::INT AS h, u
       FROM daily, b WHERE day > mx - INTERVAL 7 DAY),
tot AS (SELECT h, sum(u)::BIGINT AS t FROM bu GROUP BY h),
w AS (SELECT user_id, sum(u)::BIGINT AS w28 FROM daily, b
      WHERE day > mx - INTERVAL 28 DAY GROUP BY user_id),
tw AS (SELECT sum(u)::BIGINT AS t28 FROM daily, b
       WHERE day > mx - INTERVAL 28 DAY)
SELECT g.user_id, g.h,
       coalesce(bu.u, 0)::DOUBLE / 100.0 AS bu_fc,
       round((coalesce(tot.t, 0) * coalesce(w.w28, 0))::DOUBLE
             / nullif(t28, 0) / 100.0, 6) AS td_fc
FROM grid g
LEFT JOIN bu ON bu.user_id = g.user_id AND bu.h = g.h
LEFT JOIN tot ON tot.h = g.h
LEFT JOIN w ON w.user_id = g.user_id
CROSS JOIN tw
""")
def q_reconcile_forecasts_by_user(spark, sf_dir):
    """Hierarchical forecast reconciliation over the user hierarchy
    (operators/reconcile.py): per-user seasonal-naive bottom-up base
    forecasts (exact integer units) next to the proportional top-down
    split of the aggregate forecast by trailing-28-day share —
    integer-domain product, one float division, association shared
    with the oracle verbatim.  One corpus-sized daily rollup; every
    later table is users × 7.  Beyond-reference: the reference
    forecasts series independently (orange3-timeseries models.py);
    coherence across the hierarchy is the property a distributed
    rollup pipeline actually consumes."""
    from orange3_timeseries_spark.operators.reconcile import (
        reconcile_forecasts,
    )

    ev = read_table(spark, sf_dir, "events")
    return reconcile_forecasts(ev, "ts", "user_id", "value",
                               horizon=7, season=7, share_window=28)
