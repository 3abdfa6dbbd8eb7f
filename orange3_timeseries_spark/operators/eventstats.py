"""Event-stream shape diagnostics: burstiness and Benford digit QA.

The reference treats a timeseries as an equally-spaced signal once
constructed (``timeseries.py``'s equispaced assumption); production
event streams are not equispaced, and two classic stream-shape
diagnostics decide how to treat them before any resampling /
interpolation step (``operators/interpolate.py``):

- :func:`burstiness` — the Goh & Barabási (2008, EPL 81) burstiness
  coefficient over inter-event times ``τ``:

      ``B = (σ_τ − μ_τ) / (σ_τ + μ_τ)``  ∈ [−1, 1]

  (−1 periodic, 0 Poisson, →1 extremely bursty) plus the
  memory coefficient ``M`` (ibid.) — the lag-1 Pearson correlation of
  consecutive inter-event times — which separates "bursty because
  heavy-tailed" from "bursty because correlated".  Together they tell
  the pipeline whether a per-series resample grid makes sense at all.
- :func:`benford_digits` — first-significant-digit frequency audit
  against Benford's law (Newcomb 1881 / Benford 1938), the standard
  data-forgery / pipeline-corruption screen for multi-scale positive
  measurements: per group, observed digit counts, the χ² statistic
  against ``P(d) = log10(1 + 1/d)``, and an 8-df 5% verdict.

Scale: both are one ``groupBy`` over window/lag-derived columns —
exchanges = 1, pure Catalyst, no Python; a billion series or groups
cost one skinny shuffle each (same shape as ``stattests.adf_test``).

Determinism contract (PLANS.md firewall rules):

- inter-event gaps are exact integer microsecond differences; the
  mean gap is ONE IEEE division of the exact BIGINT microsecond sum
  (never ``round(avg(...), 6)`` of derived values — sums over small
  divisors land exactly on decimal .5 boundaries where Spark's
  shortest-string HALF_UP round and a binary-value round disagree,
  the ``ensemble_forecast`` rule); σ/corr run over the identical
  ``gap_us/1e6`` DOUBLE seconds on both engines and round 6 dp
  before the ratio arithmetic, the ``stattests.hurst_rs`` firewall.
- Benford's first digit is extracted WITHOUT libm: a fixed decade
  CASE-ladder multiplies by exact power-of-ten literals (every
  ``10^k``, |k| ≤ 15, is exactly representable) — single IEEE
  multiplies are bit-identical across engines, unlike ``log10``/
  ``pow`` whose 1-ulp differences can flip ``floor`` at decade
  boundaries.  The Benford probabilities are injected as full-
  precision Python literals into BOTH engines, each χ² term is
  rounded to an integer micro-unit (``round(term·1e6)`` → BIGINT) and
  the terms are summed as integers — order-free and exact.
"""

from __future__ import annotations

from math import log10
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["burstiness", "benford_digits", "BENFORD_P",
           "CHI2_8DF_5PCT", "first_digit"]

#: Benford first-digit probabilities, full double precision (these
#: exact literals are injected into the SQL oracle too, so both
#: engines start from identical constants).
BENFORD_P = {d: log10(1.0 + 1.0 / d) for d in range(1, 10)}

#: χ² critical value, 8 degrees of freedom, α = 0.05
CHI2_8DF_5PCT = 15.507313


def burstiness(df: DataFrame, time_col: str,
               series_cols: Sequence[str],
               min_gaps: int = 8) -> DataFrame:
    """One row per series: ``(series..., n_gaps, mean_gap_s, std_gap_s,
    burstiness, memory_coef, regime)``.

    ``regime`` routes downstream treatment: ``'periodic'`` (B < −0.1)
    → safe to resample on the modal grid, ``'poisson'`` (|B| ≤ 0.1) →
    rate aggregation, ``'bursty'`` (B > 0.1) → sessionize first
    (cf. ``queries.sessionize_events``).  Series with fewer than
    ``min_gaps`` gaps are dropped — a two-point σ is noise.

    Memory coefficient uses the n−1 consecutive gap pairs; when either
    marginal σ is 0 (perfectly regular stream) ``memory_coef`` is NULL
    rather than 0/0.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    gaps = (df.select(*series_cols, F.col(time_col))
            .withColumn("__gus__", (us - F.lag(us, 1).over(w))
                        .cast("bigint"))
            .where(F.col("__gus__").isNotNull())
            .withColumn("__g__", F.col("__gus__") / F.lit(1e6)))
    # lag-1 pair of gaps for the memory coefficient, in the same pass
    paired = gaps.withColumn(
        "__gp__", F.lag(F.col("__g__"), 1).over(
            Window.partitionBy(*series_cols).orderBy(time_col)))
    mem = F.corr("__g__", "__gp__")
    # exact BIGINT microsecond sum, ONE division to seconds — no
    # boundary-sensitive rounded mean
    mean_s = (F.sum("__gus__").cast("double") / F.count(F.lit(1))) \
        / F.lit(1e6)
    agg = paired.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        mean_s.alias("mean_gap_s"),
        F.round(F.stddev_pop("__g__"), 6).alias("std_gap_s"),
        # Spark's corr yields NaN on a zero-variance marginal where SQL
        # engines yield NULL — normalize to NULL for the replay
        F.round(F.when(F.isnan(mem), F.lit(None)).otherwise(mem), 6)
        .alias("memory_coef"))
    b = F.round((F.col("std_gap_s") - F.col("mean_gap_s"))
                / (F.col("std_gap_s") + F.col("mean_gap_s")), 6)
    out = (agg.where(F.col("n_gaps") >= F.lit(min_gaps))
           .withColumn("burstiness", b)
           .withColumn("regime", F.when(F.col("burstiness") < -0.1,
                                        F.lit("periodic"))
                       .when(F.col("burstiness") > 0.1, F.lit("bursty"))
                       .otherwise(F.lit("poisson"))))
    return out.select(*series_cols, "n_gaps", "mean_gap_s", "std_gap_s",
                      "burstiness", "memory_coef", "regime")


def first_digit(col: Column) -> Column:
    """First significant digit (1-9) of ``|col|`` as an INT, NULL when
    the magnitude is outside ``[1e-6, 1e15)`` (or NULL/zero).

    libm-free: a decade CASE-ladder of comparisons against exact
    power-of-ten literals picks the scale, one exact-literal multiply
    brings the value into ``[1, 10)``-after-floor range, and the digit
    is the first character of the BIGINT's decimal rendering — integer
    → string is engine-identical, unlike float formatting."""
    x = F.abs(col.cast("double"))
    # scale so that floor(x * 10^k) has the first digit as its leading
    # decimal digit; the ladder is exact-comparison + exact-literal
    # multiply, so every engine lands on identical bigints.
    scaled = F.when(x >= 1.0, x)
    for k in range(1, 7):
        # decimal-parsed literals (NOT pow()): a parsed "1e-3" is the
        # correctly-rounded double, identical to the SQL literal's
        lo = float(f"1e-{k}")
        mul = float(f"1e{k}")
        scaled = scaled.when(x >= F.lit(lo), x * F.lit(mul))
    digit = F.substring(
        F.floor(scaled).cast("bigint").cast("string"), 1, 1).cast("int")
    ok = col.isNotNull() & (x >= F.lit(1e-6)) & (x < F.lit(1e15))
    return F.when(ok, digit)


def benford_digits(df: DataFrame, value_col: str,
                   group_cols: Sequence[str],
                   min_n: int = 50) -> DataFrame:
    """One row per group: ``(group..., n_values, chi2, benford_ok)``
    plus the per-digit observed shares packed as ``obs_share_1`` …
    ``obs_share_9`` (6 dp).

    χ² = Σ_d (obs_d − n·p_d)² / (n·p_d) with each term rounded to an
    integer micro-unit before the (order-free, integer) sum — the
    engine and the SQL replay add identical BIGINTs.  Groups with
    fewer than ``min_n`` usable values are dropped: Benford needs
    sample mass to mean anything."""
    group_cols = list(group_cols)
    d = first_digit(F.col(value_col))
    rows = df.select(*group_cols, d.alias("__d__")).where(
        F.col("__d__").isNotNull())
    counts = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_values"),
        *[F.sum(F.when(F.col("__d__") == dd, 1).otherwise(0))
          .alias(f"__c{dd}__") for dd in range(1, 10)])
    n = F.col("n_values").cast("double")
    terms = []
    for dd in range(1, 10):
        exp_d = n * F.lit(BENFORD_P[dd])
        diff = F.col(f"__c{dd}__").cast("double") - exp_d
        terms.append(F.round(diff * diff / exp_d * F.lit(1e6), 0)
                     .cast("bigint"))
    chi2_units = terms[0]
    for t in terms[1:]:
        chi2_units = chi2_units + t
    out = (counts.where(F.col("n_values") >= F.lit(min_n))
           .withColumn("chi2", (chi2_units.cast("double") / F.lit(1e6)))
           .withColumn("benford_ok", F.col("chi2") <= F.lit(CHI2_8DF_5PCT)))
    share_cols = [F.round(F.col(f"__c{dd}__") / n, 6)
                  .alias(f"obs_share_{dd}") for dd in range(1, 10)]
    return out.select(*group_cols, "n_values", "chi2", "benford_ok",
                      *share_cols)


def assoc_rules(df: DataFrame, basket_col: str, item_col: str,
                min_both: int = 5) -> DataFrame:
    """Directional association rules over (basket, item) pairs:
    ``(antecedent, consequent, n_both, support, confidence, lift)`` —
    classic market-basket mining (Agrawal-Srikant style counts over a
    bounded item dimension, without the frequent-itemset recursion:
    single items → pairs only, which is what event-type co-occurrence
    dashboards actually read).

    lift > 1 = the consequent is more likely in baskets containing the
    antecedent; the three ratios are single divisions of exact BIGINT
    counts (``support = n_AB/U``, ``confidence = n_AB/n_A``,
    ``lift = n_AB·U/(n_A·n_B)``), so they are bit-identical on any
    engine.

    Scale: one distinct over (basket, item) — the only fact-sized
    shuffle — then a self-join that reuses the basket partitioning and
    a pair rollup bounded by the item-dimension²; the per-item counts
    broadcast back onto the pair table.  The deduped basket table is
    pinned (localCheckpoint, the hll_overlap pattern): it feeds the
    universe count, the item counts, and BOTH self-join sides — without
    the pin the fact-sized distinct re-runs once per consumer."""
    base = (df.select(F.col(basket_col).alias("__b__"),
                      F.col(item_col).alias("__i__")).distinct()
            .localCheckpoint(eager=True))
    u = base.select(F.countDistinct("__b__").alias("__U__"))
    item_n = base.groupBy("__i__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ni__"))
    lhs = base.select(F.col("__b__"), F.col("__i__").alias("antecedent"))
    rhs = base.select(F.col("__b__"), F.col("__i__").alias("consequent"))
    pairs = (lhs.join(rhs, on="__b__")
             .where(F.col("antecedent") != F.col("consequent"))
             .groupBy("antecedent", "consequent")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_both")))
    na = item_n.select(F.col("__i__").alias("antecedent"),
                       F.col("__ni__").alias("__na__"))
    nb = item_n.select(F.col("__i__").alias("consequent"),
                       F.col("__ni__").alias("__nb__"))
    j = (pairs.join(F.broadcast(na), on="antecedent")
         .join(F.broadcast(nb), on="consequent")
         .crossJoin(F.broadcast(u)))
    return (j.where(F.col("n_both") >= F.lit(min_both))
            .select("antecedent", "consequent", "n_both",
                    F.round(F.col("n_both").cast("double")
                            / F.col("__U__").cast("double"), 6)
                    .alias("support"),
                    F.round(F.col("n_both").cast("double")
                            / F.col("__na__").cast("double"), 6)
                    .alias("confidence"),
                    F.round((F.col("n_both") * F.col("__U__"))
                            .cast("double")
                            / (F.col("__na__") * F.col("__nb__"))
                            .cast("double"), 6).alias("lift")))


__all__.append("assoc_rules")


def transition_entropy(df: DataFrame, time_col: str, state_col: str,
                       series_cols: Sequence[str],
                       min_n: int = 20) -> DataFrame:
    """Conditional entropy of the state-transition process per series:
    ``(series..., n_transitions, n_states, h_cond, predictability)`` —
    ``H(next|cur) = −Σ_{a,b} p(a,b)·ln p(b|a)``, the information-
    theoretic "how predictable is this stream's next event given the
    current one?" (0 = deterministic protocol, ln(k) = uniform noise).
    ``predictability = 1 − H/ln(k)`` with k the series' observed state
    count (NULL for single-state series).  The scalar summary of the
    full ``event_transitions`` matrix — the router between replayable
    sessions and noise.

    Counts are exact BIGINTs; each entropy term is
    ``(n_ab/N)·ln(n_ab/n_a)`` over single integer divisions, summed
    over at most k² terms per series (1-ulp summation wobble absorbed
    by the 6-dp round, the acf precedent).  Ordered lag window + two
    same-key groupBys — one exchange."""
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    b = (df.where(F.col(state_col).isNotNull())
         .select(*series_cols, F.col(state_col).alias("__a__"),
                 F.lead(state_col, 1).over(w).alias("__b__"))
         .where(F.col("__b__").isNotNull()))
    pair = b.groupBy(*series_cols, "__a__", "__b__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nab__"))
    aw = Window.partitionBy(*series_cols, "__a__")
    sw = Window.partitionBy(*series_cols)
    pair = (pair.withColumn("__na__", F.sum("__nab__").over(aw))
            .withColumn("__N__", F.sum("__nab__").over(sw)))
    term = ((F.col("__nab__").cast("double")
             / F.col("__N__").cast("double"))
            * F.log(F.col("__nab__").cast("double")
                    / F.col("__na__").cast("double")))
    g = pair.groupBy(*series_cols).agg(
        F.max("__N__").alias("n_transitions"),
        F.size(F.array_distinct(
            F.flatten(F.collect_list(F.array("__a__", "__b__")))))
        .cast("int").alias("n_states"),
        (-F.sum(term)).alias("__h__"))
    h6 = F.round(F.col("__h__"), 6)
    k = F.col("n_states").cast("double")
    pred = F.when(F.col("n_states") > 1,
                  F.round(F.lit(1.0) - F.col("__h__") / F.log(k), 6))
    return (g.where(F.col("n_transitions") >= F.lit(min_n))
            .select(*series_cols, "n_transitions", "n_states",
                    h6.alias("h_cond"), pred.alias("predictability")))


__all__.append("transition_entropy")


def sbc_classification(df: DataFrame, time_col: str, value_col: str,
                       series_cols: Sequence[str],
                       min_demand_days: int = 4) -> DataFrame:
    """Syntetos-Boylan-Croston demand classification per series:
    ``(series..., n_days, n_demand_days, adi, cv2, demand_class)`` —
    the standard router in front of the forecasting tier: ``smooth``
    series go to exponential smoothing / ARIMA, ``intermittent`` to
    Croston (cf. ``croston_by_user``), ``erratic`` to robust methods,
    ``lumpy`` to quantile/bootstrap approaches (Syntetos & Boylan
    2005 cutoffs: ADI 1.32, CV² 0.49).

    On the DAILY demand grid: ``ADI = span_days / demand_days`` (mean
    inter-demand interval) and ``CV² = (n·Σs² − S²)/S²`` over the
    nonzero daily sums — both single divisions of exact BIGINT
    centi-unit moments, so the classification booleans compare
    bit-identical doubles against the literal cutoffs on any engine.
    One day-rollup + one series groupBy — the aggregates share the
    series key."""
    series_cols = list(series_cols)
    day = F.floor(F.unix_micros(F.col(time_col).cast("timestamp"))
                  / F.lit(86400000000)).cast("bigint")
    cents = F.round(F.col(value_col).cast("double") * 100.0) \
             .cast("bigint")
    b = (df.where(F.col(value_col).isNotNull())
         .select(*series_cols, day.alias("__d__"), cents.alias("__c__")))
    daily = b.groupBy(*series_cols, "__d__").agg(
        F.sum("__c__").alias("__s__"))
    nz = daily.where(F.col("__s__") != 0)
    g = nz.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_demand_days"),
        (F.max("__d__") - F.min("__d__") + 1).cast("bigint")
        .alias("n_days"),
        F.sum("__s__").alias("__S__"),
        F.sum(F.col("__s__") * F.col("__s__")).alias("__S2__"))
    nd = F.col("n_demand_days").cast("double")
    adi = F.col("n_days").cast("double") / nd
    sd = F.col("__S__").cast("double")
    cv2 = ((nd * F.col("__S2__").cast("double") - sd * sd) / (sd * sd))
    cls = (F.when((adi < 1.32) & (cv2 < 0.49), "smooth")
           .when((adi >= 1.32) & (cv2 < 0.49), "intermittent")
           .when((adi < 1.32) & (cv2 >= 0.49), "erratic")
           .otherwise("lumpy"))
    return (g.where((F.col("n_demand_days") >= F.lit(min_demand_days))
                    & (F.col("__S__") != 0))
            .select(*series_cols, "n_days", "n_demand_days",
                    F.round(adi, 6).alias("adi"),
                    F.round(cv2, 6).alias("cv2"),
                    cls.alias("demand_class")))


__all__.append("sbc_classification")


def window_funnel(df: DataFrame, time_col: str, type_col: str,
                  series_cols: Sequence[str],
                  steps: Sequence[str] = ("view", "click", "purchase"),
                  window: str = "1 hour") -> DataFrame:
    """ClickHouse-``windowFunnel(strict_increase)``-style
    sliding-window funnel (any number of steps ≥ 2): ``(series...,
    funnel_level, n_events)`` — the deepest step reachable through ANY
    strictly-ordered event chain ``t₁ < t₂ < … < t_k ≤ t₁ + window``.
    The strictness matches ClickHouse's ``strict_increase`` mode and
    is a deliberate, tested part of the contract (default ClickHouse
    lets equal-timestamp events chain; here ties are excluded by time
    VALUE, which is what makes the result tie-order deterministic).  The first-touch
    funnel (``event_funnel``) misses users whose FIRST step-1 event
    went nowhere but whose later session converted; the windowed
    variant is the one conversion dashboards actually mean.

    Pure window algebra, no per-user state or UDF, chained once per
    step: ``a₁ = t`` on step-1 rows; for each later step *i*,
    ``mᵢ₋₁`` = running max of ``aᵢ₋₁`` over STRICTLY EARLIER TIMES
    (a ``RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` frame on
    integer microseconds — rows tied on the timestamp are excluded by
    VALUE, so the result is deterministic under any tie order, unlike
    a ROWS frame) and ``aᵢ = mᵢ₋₁`` on step-*i* rows where
    ``mᵢ₋₁ ≥ t − W``.  The carried anchor is always the ORIGINAL
    step-1 time, so the whole chain lands inside one window of its
    first event (ClickHouse semantics); taking the running MAX anchor
    is optimal — it maximizes the reachable ``t_k``.  All comparisons
    are exact integer microseconds — bit-exact cross-engine.  Each
    ``mᵢ`` reads the previous step's anchor column, so the physical
    plan is k−1 CHAINED Window operators — but they share one window
    spec, so there is still only ONE exchange and ONE sort on the
    series key, plus the groupBy that reuses the same partitioning."""
    series_cols = list(series_cols)
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("window_funnel needs at least 2 steps")
    import re as _re

    m = _re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day|week)s?\s*", window)
    if m is None:
        raise ValueError(
            f"window_funnel: unsupported window spec {window!r} — "
            "expected '<N> second|minute|hour|day|week[s]'")
    mult = {"second": 1_000_000, "minute": 60_000_000,
            "hour": 3_600_000_000, "day": 86_400_000_000,
            "week": 7 * 86_400_000_000}[m.group(2)]
    w_us = int(m.group(1)) * mult
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    b = (df.where(F.col(type_col).isin(steps))
         .select(*series_cols, F.col(type_col).alias("__e__"),
                 us.alias("__t__")))
    # strict past by TIME VALUE: range frame ending 1 microsecond
    # before the current row's timestamp
    strict_past = (Window.partitionBy(*series_cols).orderBy("__t__")
                   .rangeBetween(Window.unboundedPreceding, -1))
    b = b.withColumn(
        "__a1__", F.when(F.col("__e__") == steps[0], F.col("__t__")))
    for i, step in enumerate(steps[1:], start=2):
        best = F.max(f"__a{i - 1}__").over(strict_past)
        b = b.withColumn(
            f"__a{i}__",
            F.when((F.col("__e__") == step)
                   & (best >= F.col("__t__") - F.lit(w_us)), best))
    lvl = F.lit(0)
    for i in range(1, len(steps) + 1):
        lvl = F.when(F.col(f"__a{i}__").isNotNull(), i).otherwise(lvl)
    g = (b.withColumn("__lvl__", lvl)
         .groupBy(*series_cols)
         .agg(F.max("__lvl__").cast("int").alias("funnel_level"),
              F.count(F.lit(1)).cast("bigint").alias("n_events")))
    return g


__all__.append("window_funnel")


def ccf_value_volume(df: DataFrame, time_col: str, value_col: str,
                     series_cols: Sequence[str],
                     lags: Sequence[int] = (-3, -2, -1, 0, 1, 2, 3),
                     min_days: int = 8,
                     value_dp: int = 4) -> DataFrame:
    """Cross-correlation between a series' daily mean VALUE and its
    daily event VOLUME at integer day lags: one row per (series, lag)
    with ``corr(x_d, y_{d+lag})`` — positive lag means value leads
    volume.  The "does the metric follow activity" monitor that ACF
    (value vs itself) cannot answer.

    Determinism: the daily mean is derived from EXACT integer sums —
    values snap to 0.01-grid units (the same input contract as the
    quantized ARIMA path), the per-day unit sum and count aggregate
    exactly in any order, and the ``value_dp``-decimal mean is one
    shared division + round of those two integers (never a float
    ``avg``, whose accumulation order could straddle a rounding tie).
    Both channels are then exact integer units, so all five Pearson
    moment sums are exact int64 — the correlation is one integer-exact
    numerator over two sqrt's, bit-identical on any engine, emitted
    UNROUNDED.  Pairs align on existing calendar days only (epoch-day
    integer equality — gaps simply produce no pair); (series, lag)
    cells with fewer than ``min_days`` aligned pairs or zero variance
    in either channel are dropped.  Magnitude budget (int64, Spark
    wraps silently with ANSI off): ``|value|·10^value_dp · n_days <
    3e9`` keeps ``n·Σx²`` under 2^63 — e.g. |value| < 80k at the
    default dp=4 over a full year.

    Scale: the daily rollup is a map-side-combining aggregate that
    shrinks events by ~the daily frequency; the lag join and moment
    aggregation run on the skinny (series, day) table, partitioned by
    the series key throughout."""
    series_cols = list(series_cols)
    if value_dp < 2:
        raise ValueError("value_dp must be >= 2 (values are snapped to"
                         " the 0.01 grid before the mean)")
    # integer-domain rescale BEFORE the double cast — the same
    # association the oracle uses ((sum·10^dp/100)::DOUBLE / count);
    # a float factor multiplied onto the double-cast sum can round the
    # other way once |sum·factor| exceeds 2^53, straddling the snap
    # boundary this function exists to avoid.  Bound: exact while
    # |Σunits|·10^(dp-2) < 2^53 per (series, day).
    factor = 10 ** value_dp // 100
    day = F.date_trunc("day", F.col(time_col))
    daily = (df.where(F.col(value_col).isNotNull())
             .groupBy(*series_cols, day.alias("__day__"))
             .agg(F.sum(F.round(F.col(value_col).cast("double") * 100)
                        .cast("long")).alias("__su__"),
                  F.count(F.lit(1)).alias("__y__"))
             .select(*series_cols,
                     (F.unix_micros(F.col("__day__"))
                      / F.lit(86400000000)).cast("long").alias("__d__"),
                     F.round((F.col("__su__") * F.lit(factor))
                             .cast("double")
                             / F.col("__y__")).cast("long")
                     .alias("__xu__"),
                     F.col("__y__").cast("long").alias("__yu__")))
    a = daily.select(*series_cols, F.col("__d__").alias("__da__"),
                     F.col("__xu__"))
    b = daily.select(*series_cols, F.col("__d__").alias("__db__"),
                     F.col("__yu__"))
    lag_col = F.explode(F.array(*[F.lit(int(v)) for v in lags]))
    al = a.withColumn("__lag__", lag_col)
    pairs = al.join(b, on=series_cols).where(
        F.col("__db__") == F.col("__da__") + F.col("__lag__"))
    xu, yu = F.col("__xu__"), F.col("__yu__")
    g = pairs.groupBy(*series_cols, "__lag__").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(xu).alias("__sx__"), F.sum(yu).alias("__sy__"),
        F.sum(xu * yu).alias("__sxy__"),
        F.sum(xu * xu).alias("__sxx__"),
        F.sum(yu * yu).alias("__syy__"))
    n = F.col("__n__")
    num = n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    dx = n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    dy = n * F.col("__syy__") - F.col("__sy__") * F.col("__sy__")
    return (g.where((n >= min_days) & (dx > 0) & (dy > 0))
            .select(*series_cols,
                    F.col("__lag__").cast("int").alias("lag"),
                    n.cast("long").alias("n_days"),
                    (num.cast("double")
                     / (F.sqrt(dx.cast("double"))
                        * F.sqrt(dy.cast("double")))).alias("ccf")))


__all__.append("ccf_value_volume")
