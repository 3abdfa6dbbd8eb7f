"""Distribution-drift monitoring: Population Stability Index between a
reference window and a current window — the standard production check
that a feature / score / data distribution has not shifted (banking's
PSI, also the usual training-data drift gate between crawl snapshots):

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

over quantile buckets of the REFERENCE distribution (so buckets hold
~equal reference mass and the index is scale-free).  Rule of thumb:
< 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action.

Scale design: the only non-distributed object is the 9-edge quantile
row, which stays in the PLAN (1-row aggregate, broadcast cross join —
no driver collect); bucket assignment is a higher-order-function count
over that array; the per-bucket shares are two map-combinable counts.
Empty buckets are clamped to ``eps`` before the log so PSI stays
finite (the standard smoothing).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["psi_drift"]


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              n_buckets: int = 10, eps: float = 1e-4) -> DataFrame:
    """One row per bucket: ``(bucket, p_ref, p_cur, contrib, psi)`` —
    ``contrib`` the bucket's PSI term, ``psi`` the total repeated on
    every row (the long-form layout keeps the whole decomposition in
    one value-verifiable table).  Buckets are
    ``(-inf, e1], (e1, e2], ..., (e_{n-1}, inf)`` with ``e_k`` the
    k/n reference quantiles (linear interpolation)."""
    qs = [k / n_buckets for k in range(1, n_buckets)]
    v = F.col(value_col).cast("double")
    # eager 1-row materialization: the edge array feeds BOTH bucketing
    # branches — left lazy, Catalyst re-derives the whole reference
    # scan+percentile subtree in every branch (measured 68 Exchange
    # nodes in the composed plan; 2 after pinning)
    edges = ref.agg(
        F.percentile(v, F.array(*[F.lit(q) for q in qs]))
        .alias("__edges__")).localCheckpoint()

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        b = (F.size(F.filter(F.col("__edges__"),
                             lambda e: v > e)) + 1).alias("bucket")
        counts = (df.select(v.alias(value_col)).where(v.isNotNull())
                  .crossJoin(F.broadcast(edges))
                  .groupBy(b).agg(F.count(F.lit(1)).alias("__c__"))
                  ).localCheckpoint()  # <= n_buckets rows, reused twice
        total = counts.agg(F.sum("__c__").alias("__t__"))
        return (counts.crossJoin(F.broadcast(total))
                .select("bucket", (F.col("__c__") / F.col("__t__"))
                        .alias(name)))

    all_buckets = ref.sparkSession.range(1, n_buckets + 1) \
        .select(F.col("id").cast("int").alias("bucket"))
    shares = (all_buckets
              .join(bucketed(ref, "p_ref"), "bucket", "left")
              .join(bucketed(cur, "p_cur"), "bucket", "left")
              .select("bucket",
                      F.coalesce("p_ref", F.lit(0.0)).alias("p_ref"),
                      F.coalesce("p_cur", F.lit(0.0)).alias("p_cur")))
    p = F.greatest(F.col("p_ref"), F.lit(eps))
    q = F.greatest(F.col("p_cur"), F.lit(eps))
    contrib = (p - q) * F.log(p / q)
    out = shares.withColumn("contrib", contrib).localCheckpoint()
    total = out.agg(F.sum("contrib").alias("psi"))
    return out.crossJoin(F.broadcast(total))


def ks_drift(ref: DataFrame, cur: DataFrame, value_col: str,
             group_cols=()) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test between a
    reference and a current sample, optionally per group: the max ECDF
    gap ``D = sup |F_ref − F_cur|`` with the asymptotic p-value
    (Kolmogorov distribution, Stephens' small-sample λ correction).

    Exactness: with per-value counts ``c1, c2`` and totals ``n1, n2``,
    the gap at each distinct value is ``|c1·n2 − c2·n1| / (n1·n2)`` —
    the maximization runs entirely on the INTEGER numerator (running
    sums of counts), so D is bit-exact on any engine; only the p-value
    touches floats (exp/sqrt, ~1 ulp, rounded 6 dp).  Ties are handled
    correctly because the ECDFs are evaluated AFTER all rows of a value
    (per-distinct-value aggregation before the running sum).

    Plan: two map-combinable counts, one (group, value)-ordered window
    pass, one max — no collect, no UDF; groups parallelize."""
    group_cols = list(group_cols)
    x = F.col(value_col).cast("double")

    def counted(df: DataFrame, name: str) -> DataFrame:
        return (df.where(x.isNotNull())
                .groupBy(*group_cols, x.alias("__v__"))
                .agg(F.count(F.lit(1)).alias(name)))

    a = counted(ref, "__c1__")
    b = counted(cur, "__c2__")
    both = (a.join(b, group_cols + ["__v__"], "full_outer")
            .select(*group_cols, "__v__",
                    F.coalesce("__c1__", F.lit(0)).alias("__c1__"),
                    F.coalesce("__c2__", F.lit(0)).alias("__c2__")))
    pw = Window.partitionBy(*group_cols) if group_cols \
        else Window.partitionBy()
    ow = (pw.orderBy(F.col("__v__").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = (both.withColumn("__r1__", F.sum("__c1__").over(ow))
           .withColumn("__r2__", F.sum("__c2__").over(ow))
           .withColumn("__n1__", F.sum("__c1__").over(pw))
           .withColumn("__n2__", F.sum("__c2__").over(pw)))
    # products as DOUBLE: int64 r1*n2 overflows once n_ref*n_cur >
    # 2^63 (~3e9 rows per side); doubles are exact below 2^53 and
    # IEEE-identically rounded beyond — far inside the 6-dp firewall
    num = F.abs(F.col("__r1__").cast("double") * F.col("__n2__")
                - F.col("__r2__").cast("double") * F.col("__n1__"))
    agg = (run.withColumn("__num__", num)
           .groupBy(*group_cols)
           .agg(F.max("__num__").alias("__mx__"),
                F.max("__n1__").alias("n_ref"),
                F.max("__n2__").alias("n_cur")))
    d = F.col("__mx__") / (F.col("n_ref").cast("double")
                           * F.col("n_cur"))

    # asymptotic Kolmogorov survival with Stephens' correction,
    # evaluated as a Catalyst expression.  Below λ = 0.2 the true
    # survival is 1 to double precision (the CDF is ~e^{-π²/(8λ²)}) but
    # the 20-term alternating series truncates badly (at λ = 0 it sums
    # to exactly 0) — so small λ short-circuits to 1, the same branch
    # SciPy's kolmogorov() takes; for λ ≥ 0.2 the k=20 tail is < 1e-14
    ne = (F.col("n_ref").cast("double") * F.col("n_cur")
          / (F.col("n_ref") + F.col("n_cur")))
    lam = (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d
    p = F.lit(0.0)
    for kk in range(1, 21):
        sign = 1.0 if kk % 2 == 1 else -1.0
        p = p + F.lit(2.0 * sign) * F.exp(F.lit(-2.0 * kk * kk)
                                          * lam * lam)
    p = F.when(lam < 0.2, F.lit(1.0)) \
        .otherwise(F.least(F.lit(1.0), F.greatest(F.lit(0.0), p)))
    p6 = F.round(p, 6)
    return agg.select(
        *group_cols, "n_ref", "n_cur",
        F.round(d, 6).alias("ks_stat"),
        p6.alias("p_value"),
        (p6 < F.lit(0.05)).alias("drifted"))


__all__.append("ks_drift")


def js_divergence(df: DataFrame, group_col: str, item_col: str,
                  top_k: int = 100) -> DataFrame:
    """Jensen-Shannon divergence of each group's categorical item
    distribution against the POOLED corpus distribution, restricted to
    the top-``top_k`` global items (renormalized within that support) —
    the standard "does this source's token mix look like the corpus"
    audit between crawl snapshots / data sources.  One row per group:
    ``(group, n_in_support, js_divergence, js_distance)`` (nats;
    distance = √JS is the metric form).

    Input is an OCCURRENCE table (one row per item instance, e.g.
    exploded tokens).  Restricting to a fixed global top-K support is
    what makes JS well-defined across groups (full-vocabulary JS is
    dominated by hapax noise) and what bounds the state: the support is
    a top-K aggregate (count desc, item asc tie-break — deterministic),
    broadcast everywhere it is used.

    Scale: two map-combinable counts (global, per-group), a broadcast
    semi-join against the K-item support, and a groups × K skeleton —
    no driver collect, no UDF; group count is unbounded, K is the only
    constant.

    Determinism: p and q are ratios of exact integer counts (identical
    doubles on both engines); only the final sum of ≤ K per-item terms
    is order-dependent (≪ 1e-12 wobble) and is rounded to 6 dp; the
    distance takes √ of the ROUNDED divergence so both engines root the
    same value."""
    items = (df.where(F.col(item_col).isNotNull())
             .select(F.col(group_col).alias("__g__"),
                     F.col(item_col).alias("__i__")))
    gc = items.groupBy("__i__").agg(F.count(F.lit(1)).alias("__gc__"))
    # orderBy().limit() plans as TakeOrderedAndProject — per-partition
    # partial top-K merged on the driver, NOT a single-partition sort of
    # the whole vocabulary (the Window-row_number top-K shape would be);
    # deterministic via the (count desc, item asc) tie-break.  Eager
    # K-row materialization (cf. psi_drift): the support feeds three
    # branches — left lazy, the global count subtree re-derives per
    # branch
    topk = (gc.orderBy(F.col("__gc__").desc(), F.col("__i__").asc())
            .limit(top_k)
            .localCheckpoint())
    gtot = topk.agg(F.sum("__gc__").cast("double").alias("__gt__"))
    per = (items.join(F.broadcast(topk.select("__i__")), "__i__")
           .groupBy("__g__", "__i__")
           .agg(F.count(F.lit(1)).alias("__c__")))
    groups = items.select("__g__").distinct()
    skel = groups.crossJoin(F.broadcast(topk))
    full = (skel.join(per, ["__g__", "__i__"], "left")
            .select("__g__", "__i__", "__gc__",
                    F.coalesce("__c__", F.lit(0)).alias("__c__")))
    pw = Window.partitionBy("__g__")
    full = full.withColumn("__st__",
                           F.sum("__c__").over(pw).cast("double"))
    full = full.crossJoin(F.broadcast(gtot))
    p = F.when(F.col("__st__") > 0,
               F.col("__c__").cast("double") / F.col("__st__")) \
         .otherwise(F.lit(0.0))
    q = F.col("__gc__").cast("double") / F.col("__gt__")
    full = full.withColumn("__p__", p).withColumn("__q__", q)
    m = (F.col("__p__") + F.col("__q__")) / F.lit(2.0)
    term = (F.lit(0.5) * F.when(F.col("__p__") > 0,
                                F.col("__p__")
                                * F.log(F.col("__p__") / m))
             .otherwise(F.lit(0.0))
            + F.lit(0.5) * (F.col("__q__") * F.log(F.col("__q__") / m)))
    agg = (full.withColumn("__term__", term)
           .groupBy("__g__")
           .agg(F.max("__st__").alias("__st__"),
                F.round(F.sum("__term__"), 6).alias("__js__")))
    return agg.select(
        F.col("__g__").alias(group_col),
        F.col("__st__").cast("long").alias("n_in_support"),
        F.col("__js__").alias("js_divergence"),
        F.round(F.sqrt(F.greatest(F.col("__js__"), F.lit(0.0))), 6)
        .alias("js_distance"))


__all__.append("js_divergence")


def page_hinkley(df: DataFrame, time_col: str, value_col: str,
                 series_cols: Sequence[str], delta_sigma: float = 0.5,
                 lambda_sigma: float = 5.0,
                 min_n: int = 30) -> DataFrame:
    """Page-Hinkley mean-shift detector per series (Page 1954, Hinkley
    1971; the sequential drift test of the data-stream literature):
    ``(series..., n_obs, ph_up, ph_down, lambda_thr, alarm,
    alarm_ts)``.

    With running mean ``x̄_t`` and slack ``δ = delta_sigma·σ̂``:
    ``m⁺_T = Σ_{t≤T}(x_t − x̄_t − δ)`` and ``PH⁺_T = m⁺_T −
    min_{s≤T} m⁺_s`` flags mean INCREASES when it exceeds
    ``λ = lambda_sigma·σ̂``; the mirrored ``PH⁻`` (running max minus
    ``m⁻_T = Σ(x_t − x̄_t + δ)``) flags decreases.  Under H0 the
    drift −δ bounds the expected drawup near σ²/(2δ) with an
    exponential tail ≈ exp(−2δλ/σ²), so the defaults (δ = σ/2,
    λ = 5σ) hold the per-series false-alarm rate under 1%;
    δ must stay well below the shift size you care to catch.  ``alarm_ts`` is the
    first time either side exceeded λ.  The CUSUM companion for slow
    drifts: PH's running-mean baseline adapts, so it catches gradual
    shifts CUSUM's fixed reference dilutes.

    Determinism: each term is ONE division of exact BIGINT centi-unit
    prefix sums ``(u_t·t − S_t)/(10^s·t)`` (bit-identical on any
    engine), σ̂ and δ come from exact global moments, and the m
    cumulations are sequential running-frame sums of those
    bit-identical doubles (the cusum precedent).  One ordered window
    pass + one groupBy sharing the series key — one exchange."""
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy("__ts__")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    u = F.round(F.col(value_col).cast("double") * F.lit(100.0)) \
         .cast("bigint")
    b = (df.where(F.col(value_col).isNotNull())
         .select(*series_cols, F.col(time_col).alias("__ts__"),
                 u.alias("__u__")))
    t = F.row_number().over(w).cast("bigint")
    s_run = F.sum("__u__").over(run)
    n_all = F.count(F.lit(1)).over(full).cast("bigint")
    u_all = F.sum("__u__").over(full)
    u2_all = F.sum(F.col("__u__") * F.col("__u__")).over(full)
    # NB: Spark column names are case-insensitive — "__U__" would
    # silently REPLACE "__u__" (observed: every row read the series
    # total instead of its own value), so the frame-level sums get
    # fully distinct names.
    b = (b.withColumn("__t__", t).withColumn("__run__", s_run)
         .withColumn("__n__", n_all).withColumn("__usum__", u_all)
         .withColumn("__u2sum__", u2_all))
    nd = F.col("__n__").cast("double")
    sig = F.sqrt((nd * F.col("__u2sum__").cast("double")
                  - F.col("__usum__").cast("double")
                  * F.col("__usum__").cast("double"))
                 / ((nd * nd) * F.lit(10000.0)))
    term = ((F.col("__u__") * F.col("__t__") - F.col("__run__"))
            .cast("double")
            / (F.lit(100.0) * F.col("__t__").cast("double")))
    delta = F.lit(float(delta_sigma)) * sig
    b = (b.withColumn("__mu__", F.sum(term - delta).over(run))
          .withColumn("__md__", F.sum(term + delta).over(run)))
    ph_up = F.col("__mu__") - F.min("__mu__").over(run)
    ph_dn = F.max("__md__").over(run) - F.col("__md__")
    lam = F.lit(float(lambda_sigma)) * sig
    b = (b.withColumn("__pu__", ph_up).withColumn("__pd__", ph_dn)
          .withColumn("__lam__", lam))
    hit = (F.col("__pu__") > F.col("__lam__")) \
        | (F.col("__pd__") > F.col("__lam__"))
    g = b.groupBy(*series_cols).agg(
        F.max("__n__").alias("__N__"),
        F.max("__pu__").alias("__phu__"),
        F.max("__pd__").alias("__phd__"),
        F.max("__lam__").alias("__l__"),
        F.min(F.when(hit, F.col("__ts__"))).alias("alarm_ts"))
    return (g.where((F.col("__N__") >= F.lit(min_n))
                    & (F.col("__l__") > 0))
            .select(*series_cols, F.col("__N__").alias("n_obs"),
                    F.round(F.col("__phu__"), 6).alias("ph_up"),
                    F.round(F.col("__phd__"), 6).alias("ph_down"),
                    F.round(F.col("__l__"), 6).alias("lambda_thr"),
                    F.col("alarm_ts").isNotNull().alias("alarm"),
                    "alarm_ts"))


__all__.append("page_hinkley")
