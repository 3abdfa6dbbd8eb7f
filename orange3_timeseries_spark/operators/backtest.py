"""Rolling-origin forecast backtesting (time-series cross-validation,
Tashman 2000 / Hyndman's tsCV): evaluate baseline forecasters at
several training cutoffs ("origins") per series, scoring each
``horizon``-step-ahead path against the actuals that follow the origin.

The evaluation the reference's one-shot ``model_evaluation``
(owmodelevaluation / functions.py:550-567) generalizes to in
production: one split tells you nothing about stability; rolling
origins are the standard protocol.

Models (all closed-form — the standard baselines every paper reports
against):

- ``naive``  : ŷ_{t+h} = y_t
- ``drift``  : ŷ_{t+h} = y_t + h·(y_t − y_1)/(t − 1)
- ``snaive`` : ŷ_{t+h} = y_{t+h−season}

Scale/determinism design: each series packs ONCE into an ordered array
(one series-key shuffle, the same pack the ARIMA/VAR tier uses); every
(origin, model, step) value is then an exact ``element_at`` lookup —
closed-form arithmetic over identical doubles on any engine, unrolled
per step (horizon is small and fixed).  MAE/sMAPE accumulate in fixed
left-to-right step order and round 6 dp.  Invalid origins (not enough
history for the seasonal lag, or not enough future for the horizon)
are filtered by the same integer conditions on both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["rolling_origin_eval", "ensemble_forecast"]


def _score(arr: Column, t: int, horizon: int, season: int, model: str):
    """(mae, smape) column pair for one origin/model — unrolled exact
    element arithmetic; ``t`` is the 1-based origin index."""
    y1 = F.element_at(arr, 1)
    yt = F.element_at(arr, t)
    abs_errs, smapes = [], []
    for h in range(1, horizon + 1):
        actual = F.element_at(arr, t + h)
        if model == "naive":
            pred = yt
        elif model == "drift":
            pred = yt + F.lit(float(h)) * (yt - y1) / F.lit(float(t - 1))
        elif model == "snaive":
            pred = F.element_at(arr, t + h - season)
        else:
            raise ValueError(f"unknown model {model!r}")
        err = F.abs(pred - actual)
        abs_errs.append(err)
        smapes.append(F.lit(2.0) * err
                      / F.nullif(F.abs(pred) + F.abs(actual), F.lit(0.0)))
    mae = abs_errs[0]
    for e in abs_errs[1:]:
        mae = mae + e          # fixed left-to-right accumulation
    sm = smapes[0]
    for s in smapes[1:]:
        sm = sm + s
    n = F.lit(float(horizon))
    return F.round(mae / n, 6), F.round(sm / n, 6)


def rolling_origin_eval(df: DataFrame, value_col: str, order_col: str,
                        group_cols: Sequence[str],
                        origins: Sequence[int], horizon: int = 4,
                        season: int = 7,
                        models: Sequence[str] = ("naive", "drift",
                                                 "snaive")) -> DataFrame:
    """One row per (series, origin, model) with ``mae`` and ``smape``
    over the ``horizon`` steps following the origin.  ``origins`` are
    1-based training lengths; an origin is emitted only when
    ``t > season`` (seasonal lag exists for every step), ``t >= 2``
    (drift slope defined) and ``t + horizon <= n``."""
    group_cols = list(group_cols)
    origins = [int(t) for t in origins]
    w = (Window.partitionBy(*group_cols)
         .orderBy(F.col(order_col).asc()))
    x = F.col(value_col).cast("double")
    packed = (df.where(F.col(value_col).isNotNull())
              .withColumn("__rn__", F.row_number().over(w))
              .groupBy(*group_cols)
              .agg(F.array_sort(
                       F.collect_list(F.struct("__rn__", x.alias("v"))))
                   .alias("__s__"))
              .select(*group_cols,
                      F.transform("__s__", lambda s: s["v"])
                      .alias("__arr__"),
                      F.size("__s__").alias("__n__")))
    rows = []
    for t in origins:
        if t <= season or t < 2:
            continue
        for m in models:
            mae, sm = _score(F.col("__arr__"), t, horizon, season, m)
            rows.append(F.struct(
                F.lit(t).alias("origin_t"), F.lit(m).alias("model"),
                mae.alias("mae"), sm.alias("smape"),
                (F.col("__n__") >= F.lit(t + horizon)).alias("__ok__")))
    if not rows:
        # every origin failed the validity pre-filter: empty result
        # with the contract schema, not an unresolvable empty explode
        sess = df.sparkSession
        out_schema = T.StructType(
            [packed.schema[g] for g in group_cols]
            + [T.StructField("origin_t", T.IntegerType()),
               T.StructField("model", T.StringType()),
               T.StructField("mae", T.DoubleType()),
               T.StructField("smape", T.DoubleType())])
        return sess.createDataFrame([], out_schema)
    out = (packed.select(*group_cols,
                         F.explode(F.array(*rows)).alias("__e__"))
           .where(F.col("__e__.__ok__")))
    return out.select(*group_cols,
                      F.col("__e__.origin_t").alias("origin_t"),
                      F.col("__e__.model").alias("model"),
                      F.col("__e__.mae").alias("mae"),
                      F.col("__e__.smape").alias("smape"))


def ensemble_forecast(df: DataFrame, value_col: str, order_col: str,
                      group_cols: Sequence[str],
                      origins: Sequence[int], horizon: int = 4,
                      season: int = 7, eps: float = 1e-6) -> DataFrame:
    """Inverse-MAE forecast combination (Bates-Granger 1969 in its
    standard operational form): backtest the closed-form baselines with
    :func:`rolling_origin_eval`, weight each model by ``1/(MAE + eps)``,
    and emit the weighted-average forecast from the end of each series.

    One row per (series, step): ``(series..., step, fc_naive, fc_drift,
    fc_snaive, w_naive, w_drift, w_snaive, fc_ensemble)``.  Series
    without a single valid backtest origin are dropped (no weights —
    no ensemble).  Forecast combination beats every individual baseline
    on average (the M4 lesson) and is the pipeline-scale default when
    per-series model selection is too expensive.

    Determinism: NOTHING rounded crosses the weight path.  Per-origin
    absolute errors accumulate as exact BIGINT micro-units
    (``round(|err|·1e6)``; with the input rounded 6 dp at source the
    naive/snaive errors are near-exact 1e-6 multiples, so the integer
    round never sees a .5), the per-model mean MAE is plain IEEE
    division of that integer sum, and weights divide once more.  A
    rounded mean here would sit EXACTLY on the decimal rounding
    boundary for a structural fraction of series (sums of 6-dp values
    divided by small integers are odd multiples of 5e-7), where
    Spark's shortest-string HALF_UP round and a binary-value round
    systematically disagree — the one divergence class the 6-dp
    firewall cannot absorb; integer units sidestep it entirely.  The
    combination accumulates in fixed model order (naive + drift +
    snaive).
    Scale: one packed-series pass, an origin-exploded unit aggregation
    (one skinny shuffle on the series key), and a same-key join back to
    the packed array.  The per-row expressions stay small (one origin
    each) ON PURPOSE: fully unrolling origins × models × steps into a
    single projection exceeds the JVM 64KB method limit and silently
    drops the whole stage out of codegen."""
    group_cols = list(group_cols)
    origins = [int(t) for t in origins if int(t) > season and int(t) >= 2]
    w = (Window.partitionBy(*group_cols)
         .orderBy(F.col(order_col).asc()))
    x = F.col(value_col).cast("double")
    packed = (df.where(F.col(value_col).isNotNull())
              .withColumn("__rn__", F.row_number().over(w))
              .groupBy(*group_cols)
              .agg(F.array_sort(
                       F.collect_list(F.struct("__rn__", x.alias("v"))))
                   .alias("__s__"))
              .select(*group_cols,
                      F.transform("__s__", lambda s: s["v"])
                      .alias("__arr__"),
                      F.size("__s__").alias("__n__")))
    arr, n = F.col("__arr__"), F.col("__n__")
    y1, yn = F.element_at(arr, 1), F.element_at(arr, n)
    t = F.col("__t__")

    def pred(model, h):
        yt = F.element_at(arr, t)
        if model == "naive":
            return yt
        if model == "drift":
            return yt + F.lit(float(h)) * (yt - y1) \
                / (t - 1).cast("double")
        return F.element_at(arr, t + F.lit(h - season))

    def origin_units(model):
        """Σ over steps of round(|err|·1e6) BIGINTs for ONE origin —
        exact integer accumulation."""
        total = None
        for h in range(1, horizon + 1):
            u = F.round(F.abs(pred(model, h)
                              - F.element_at(arr, t + h))
                        * F.lit(1e6), 0).cast("bigint")
            total = u if total is None else total + u
        return total

    models = ("naive", "drift", "snaive")
    per_origin = (packed
                  .select(*group_cols, "__arr__", "__n__",
                          F.explode(F.array(
                              *[F.lit(o) for o in origins])).alias("__t__"))
                  .where(n >= t + F.lit(horizon))
                  .select(*group_cols,
                          *[origin_units(m).alias(f"__u_{m}__")
                            for m in models]))
    sc = per_origin.groupBy(*group_cols).agg(
        *[F.sum(f"__u_{m}__").alias(f"__su_{m}__") for m in models],
        F.count(F.lit(1)).alias("__cnt__"))
    joined = packed.join(sc, group_cols)
    wts = {}
    for m in models:
        mavg = (F.col(f"__su_{m}__").cast("double")
                / (F.lit(float(horizon))
                   * F.col("__cnt__").cast("double"))) / F.lit(1e6)
        wts[m] = F.lit(1.0) / (mavg + F.lit(eps))
    rows = []
    for h in range(1, horizon + 1):
        fc = {"naive": yn,
              "drift": yn + F.lit(float(h)) * (yn - y1)
              / (n - 1).cast("double"),
              "snaive": F.element_at(arr, n + (h - season))}
        num = (wts["naive"] * fc["naive"] + wts["drift"] * fc["drift"]
               + wts["snaive"] * fc["snaive"])
        den = wts["naive"] + wts["drift"] + wts["snaive"]
        # emitted UNROUNDED: forecasts/weights derive from the 6dp-grid
        # series and exact integer error units through one shared IEEE
        # association, so both engines hold bit-identical doubles — and
        # a final round(.,6) WOULD diverge (a 6dp grid value times
        # h/(n-1) lands exactly on 6dp half-boundaries; seen at sf0.1
        # on fc_drift, where decimal HALF_UP and binary rounding split)
        rows.append(F.struct(
            F.lit(h).alias("step"),
            fc["naive"].alias("fc_naive"),
            fc["drift"].alias("fc_drift"),
            fc["snaive"].alias("fc_snaive"),
            wts["naive"].alias("w_naive"),
            wts["drift"].alias("w_drift"),
            wts["snaive"].alias("w_snaive"),
            (num / den).alias("fc_ensemble")))
    out = joined.select(*group_cols,
                        F.explode(F.array(*rows)).alias("__e__"))
    return out.select(*group_cols, "__e__.step", "__e__.fc_naive",
                      "__e__.fc_drift", "__e__.fc_snaive",
                      "__e__.w_naive", "__e__.w_drift",
                      "__e__.w_snaive", "__e__.fc_ensemble")


def naive_mase(df: DataFrame, time_col: str, key_col: str,
               value_col: str, *, test_len: int = 5, min_obs: int = 10,
               value_dp: int = 2) -> DataFrame:
    """MASE (Hyndman & Koehler 2006) of the naive forecaster over each
    series' daily rollup: hold out the last ``test_len`` observed days,
    forecast them all with the last train value, and scale the test MAE
    by the train one-step naive MAE — the scale-free error metric the
    reference's metric set (rmse/mae/mape/pocid; functions.py:495-582)
    lacks, and the one that stays comparable across series of different
    magnitude, which is what a fleet-wide forecast scorecard needs.

    Exactness: daily totals are BIGINT units (``round(value·10^dp)``
    sums), both absolute-error sums stay BIGINT, and
    ``mase = (Σ|e_test| · (m−1)) / (test_len · Σ|Δ_train|)`` is an
    integer-domain product with ONE float division — order-free, so
    any engine computes the identical double.  NULL when the train
    diffs are all zero (flat series has no naive scale).  int64
    budget: ``Σ|e_test| · (m−1) < 2^63`` — test_len·max-daily-units ×
    series-days, ~1e13 at 1e7-unit days and 30-year series.

    Returns one row per series with >= ``min_obs`` observed days:
    ``(key, n_days, mae, naive_scale, mase)``; ``mae`` and
    ``naive_scale`` are exact unit sums over single divisions.

    Plan: one corpus-sized map-side-combining rollup, then two window
    passes and one aggregate over daily rows, all partitioned by the
    series key — no joins, no second corpus scan.
    """
    from pyspark.sql import Window

    if min_obs < test_len + 2:
        raise ValueError(
            f"min_obs ({min_obs}) must be >= test_len + 2 "
            f"({test_len + 2}): a qualifying series needs an anchor "
            "row AND at least one train diff, else the metrics are "
            "silently NULL")
    scale = 10 ** value_dp
    day = F.date_trunc("day", F.col(time_col))
    daily = (df.where(F.col(value_col).isNotNull())
             .groupBy(F.col(key_col), day.alias("__day__"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * scale).cast("long")).alias("__u__")))
    w = Window.partitionBy(key_col).orderBy("__day__")
    wp = Window.partitionBy(key_col)
    rows = (daily
            .withColumn("__rn__", F.row_number().over(w))
            .withColumn("__n__", F.count(F.lit(1)).over(wp))
            .withColumn("__lag__", F.lag("__u__").over(w)))
    rows = rows.withColumn(
        "__anchor__",
        F.max(F.when(F.col("__rn__") == F.col("__n__") - test_len,
                     F.col("__u__"))).over(wp))
    is_test = F.col("__rn__") > F.col("__n__") - test_len
    is_train_diff = (F.col("__rn__") >= 2) & ~is_test
    g = (rows.where(F.col("__n__") >= min_obs)
         .groupBy(key_col)
         .agg(F.max("__n__").alias("n_days"),
              F.sum(F.when(is_test,
                           F.abs(F.col("__u__") - F.col("__anchor__"))))
              .cast("long").alias("__se__"),
              F.sum(F.when(is_train_diff,
                           F.abs(F.col("__u__") - F.col("__lag__"))))
              .cast("long").alias("__sd__"),
              F.sum(is_train_diff.cast("long")).cast("long")
              .alias("__md__")))
    return g.select(
        key_col, "n_days",
        (F.col("__se__").cast("double") / F.lit(float(test_len))
         / F.lit(float(scale))).alias("mae"),
        F.round(F.col("__sd__").cast("double")
                / F.nullif(F.col("__md__"), F.lit(0)).cast("double")
                / F.lit(float(scale)), 6).alias("naive_scale"),
        F.round((F.col("__se__") * F.col("__md__")).cast("double")
                / F.nullif(F.lit(test_len) * F.col("__sd__"),
                           F.lit(0)).cast("double"), 6).alias("mase"))
