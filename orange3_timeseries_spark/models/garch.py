"""GARCH(1,1) conditional-volatility grid fit per series.

The reference's modeling tier stops at conditional MEANS (ARIMA/VAR,
``owarimamodel.py``); volatility clustering — the defining stylized
fact of financial and load series — needs the conditional VARIANCE.
GARCH(1,1) (Bollerslev 1986) is the workhorse:

    σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1}

Full MLE is an iterative optimizer (not a plan); the pipeline-scale
version here is the standard practitioner shortcut — VARIANCE
TARGETING (ω = σ̄²(1−α−β), Engle & Mezrich 1996) over a small (α, β)
grid, emitting the Gaussian log-likelihood for EVERY grid point so the
reader (or a later query) picks a winner without this operator ever
running a float argmax that a 1-ulp wobble could flip.

Spark-first shape: per series the returns pack into one ordered array
and the σ²/log-likelihood recursion runs as a single Catalyst
``aggregate`` fold with a (σ², ll) struct accumulator — a runtime
loop, so codegen is independent of series length, there is no Python,
and the grid fan-out is a literal inline explode (9 structs).  One
exchange (the pack); the 9 folds are map-only.

Determinism: returns quantize to integer units at source; σ̄² is a
fixed-order combination of exact BIGINT moments; each recursion step
is the identical expression tree on both engines (the oracle replays
it step-by-step through a recursive CTE, the streaming_cusum
pattern), so the only cross-engine slack is libm's ln ulp per step —
absorbed by the 6-dp output round.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["garch_grid", "DEFAULT_GARCH_GRID"]

#: (alpha, beta) variance-targeting grid — all persistences < 1
DEFAULT_GARCH_GRID: Tuple[Tuple[float, float], ...] = (
    (0.05, 0.90), (0.05, 0.80), (0.05, 0.70),
    (0.10, 0.85), (0.10, 0.80), (0.10, 0.70),
    (0.15, 0.80), (0.20, 0.75), (0.20, 0.70),
)


def garch_grid(df: DataFrame, time_col: str, value_col: str,
               series_cols: Sequence[str],
               grid: Sequence[Tuple[float, float]] = DEFAULT_GARCH_GRID,
               quantize_scale: int = 2, min_n: int = 40) -> DataFrame:
    """One row per series × grid point: ``(series..., alpha, beta,
    n_obs, omega, loglik, sigma2_next)``.

    ``loglik = −Σ_t (ln σ²_t + r²_t/σ²_t)`` (Gaussian, constants
    dropped) over first differences, σ²₁ = σ̄² (the targeted
    unconditional variance); ``sigma2_next`` is the one-step-ahead
    variance forecast — the serving value a risk monitor reads."""
    series_cols = list(series_cols)
    scale2 = float((10 ** quantize_scale) ** 2)
    w = Window.partitionBy(*series_cols).orderBy("__t__")
    u = F.round(F.col(value_col).cast("double")
                * F.lit(float(10 ** quantize_scale))).cast("bigint")
    b = (df.where(F.col(value_col).isNotNull())
         .select(*series_cols, F.col(time_col).alias("__t__"),
                 u.alias("__u__")))
    ru = F.col("__u__") - F.lag("__u__", 1).over(w)
    l = b.select(*series_cols, F.col("__t__"), ru.alias("__r__")) \
         .where(F.col("__r__").isNotNull())
    g = l.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__"),
        F.sum("__r__").alias("__D__"),
        F.sum(F.col("__r__") * F.col("__r__")).alias("__S2__"),
        F.transform(F.array_sort(F.collect_list(
            F.struct("__t__", "__r__"))), lambda s: s["__r__"])
        .alias("__arr__"))
    nd = F.col("__n__").cast("double")
    dd = F.col("__D__").cast("double")
    vbar = ((nd * F.col("__S2__").cast("double") - dd * dd)
            / ((nd * nd) * F.lit(scale2)))
    g = (g.where(F.col("__n__") >= F.lit(min_n))
         .withColumn("__vbar__", vbar)
         .where(F.col("__vbar__") > 0))
    combos = F.explode(F.array(*[
        F.struct(F.lit(float(a)).alias("alpha"),
                 F.lit(float(b_)).alias("beta"))
        for a, b_ in grid])).alias("__g__")
    g = g.select(*series_cols, "__n__", "__vbar__", "__arr__", combos)
    alpha = F.col("__g__.alpha")
    beta = F.col("__g__.beta")
    omega = (F.lit(1.0) - alpha - beta) * F.col("__vbar__")

    def step(acc, x):
        r2 = (x * x).cast("double") / F.lit(scale2)
        ll = acc["ll"] - (F.log(acc["s2"]) + r2 / acc["s2"])
        s2 = omega + alpha * r2 + beta * acc["s2"]
        return F.struct(s2.alias("s2"), ll.alias("ll"))

    state0 = F.struct(F.col("__vbar__").alias("s2"),
                      F.lit(0.0).alias("ll"))
    fin = F.aggregate(F.col("__arr__"), state0, step)
    return g.select(*series_cols, alpha.alias("alpha"),
                    beta.alias("beta"),
                    F.col("__n__").alias("n_obs"),
                    F.round(omega, 6).alias("omega"),
                    F.round(fin["ll"], 6).alias("loglik"),
                    F.round(fin["s2"], 6).alias("sigma2_next"))
