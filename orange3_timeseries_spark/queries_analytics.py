"""Driver-contract queries for the pandas-UDF analytics tier.

``acf_by_user`` has a full DuckDB oracle: the biased FFT ACF computed by the
NumPy core is cross-checked against a direct self-join autocovariance in
SQL.  The remaining algorithms (PACF via Levinson-Durbin, spectral peak
picking, classical decomposition, Granger F-tests) are not reasonably
SQL-expressible — they are registered without oracles (driver records a
rows-only check) and are covered by the reference-golden pytest suite
instead (tests/test_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.queries import query, r6
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
  SELECT a.user_id, (b.rn - a.rn) AS lag, sum(a.xd * b.xd) AS sp
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND b.rn - a.rn BETWEEN 0 AND 20
  GROUP BY 1, 2)
SELECT user_id, CAST(lag AS INT) AS lag,
       round(sp / first_value(sp) OVER (PARTITION BY user_id ORDER BY lag), 6)
           AS acf
FROM p
""")
def q_acf_by_user(spark, sf_dir):
    """Per-series biased ACF, lags 0..20 — NumPy FFT core under
    applyInPandas, oracle = direct autocovariance self-join."""
    from orange3_timeseries_spark.spark_analytics import acf_table
    out = acf_table(_events(spark, sf_dir), "value", nlags=20)
    return out.select("user_id", "lag", r6(F.col("acf"), "acf"))


@query("pacf_by_user", None)
def q_pacf_by_user(spark, sf_dir):
    """Per-series PACF (Levinson-Durbin) — rows-only check; golden-tested
    against the reference's airpassengers lags in tests/test_analytics.py."""
    from orange3_timeseries_spark.spark_analytics import pacf_table
    out = pacf_table(_events(spark, sf_dir), "value", nlags=10)
    return out.select("user_id", "lag", r6(F.col("pacf"), "pacf"))


@query("periodogram_by_user", None)
def q_periodogram_by_user(spark, sf_dir):
    """Per-series significant spectral peaks — rows-only check."""
    from orange3_timeseries_spark.spark_analytics import periodogram_table
    out = periodogram_table(_events(spark, sf_dir), "value")
    return out.select("user_id", r6(F.col("period"), "period"),
                      r6(F.col("power"), "power"))


@query("seasonal_decompose_daily", None)
def q_seasonal_decompose_daily(spark, sf_dir):
    """Weekly-period classical decomposition of the global daily-mean
    series — rows-only check (algebraic invariants golden-tested)."""
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


@query("granger_event_types", None)
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


@query("lombscargle_by_user", None)
def q_lombscargle_by_user(spark, sf_dir):
    """Per-series Lomb-Scargle periodogram peaks over the irregular event
    times (``periodogram_nonequispaced``, ``functions.py:109-174``) —
    rows-only check; golden-tested in tests/test_analytics.py."""
    from orange3_timeseries_spark.spark_analytics import periodogram_table
    out = periodogram_table(_events(spark, sf_dir), "value",
                            equispaced=False)
    return out.select("user_id", r6(F.col("period"), "period"),
                      r6(F.col("power"), "power"))


@query("seasonal_decompose_by_user", None)
def q_seasonal_decompose_by_user(spark, sf_dir):
    """PER-SERIES classical decomposition (period 12, multiplicative) over
    each user's event sequence — the grouped grain of the decompose stage
    (one applyInPandas group per series); rows-only check, algebra
    (adjusted x seasonal == observed) golden-tested."""
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
