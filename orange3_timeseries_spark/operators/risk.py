"""Financial risk metrics per series: log-return volatility, Sharpe
ratio, maximum drawdown.

The reference is finance-first (its flagship connector pulls Yahoo
adjusted closes — ``sources/finance.py``, reference ``finance.py``),
but stops at modeling the price path; the metrics a portfolio/risk
user actually derives from that path are the classic trio:

- **volatility** — std of log returns ``r_t = ln(v_t / v_{t−1})``
  (population, matching the engine's other dispersion stats),
- **sharpe** — ``mean(r) / std(r)`` per period (the rate-free Sharpe
  ratio; multiply by √periods-per-year off-engine to annualize),
- **max drawdown** — ``max_t (1 − v_t / runmax_t)``, the worst
  peak-to-trough loss fraction.

Scale: one ordered-window pass (lag + running max) and one groupBy —
exchanges = 1 on the series key, pure Catalyst, no UDF; a million
tickers cost one skinny shuffle (the ``stattests.adf_test`` shape).

Determinism contract: rows with non-positive values are excluded
(log undefined — and a zero price is a data error, not a return);
log returns round to exact BIGINT micro-units at SOURCE (``ln`` is
the one libm call — rounding immediately after it firewalls the
1-ulp engine differences) and per-row drawdowns round 6 dp, so the
running max / max-drawdown selection is an exact comparison of
identical doubles.  ``mean_return`` is a plain IEEE division of the
exact integer micro-unit sum (never ``round(avg(6dp values), 6)`` —
sums of 6-dp values over small divisors land exactly on decimal .5
boundaries where Spark's shortest-string HALF_UP round and a
binary-value round systematically disagree; the ``ensemble_forecast``
rule), and σ rounds 6 dp before the Sharpe division (the
``hurst_rs`` firewall)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["risk_metrics"]


def risk_metrics(df: DataFrame, time_col: str, value_col: str,
                 series_cols: Sequence[str],
                 min_returns: int = 8) -> DataFrame:
    """One row per series: ``(series..., n_returns, mean_return,
    volatility, sharpe, max_drawdown)``.

    ``sharpe`` is NULL when volatility is 0 (constant series);
    series with fewer than ``min_returns`` returns are dropped."""
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    v = F.col(value_col).cast("double")
    base = (df.where(v.isNotNull() & (v > 0))
            .select(*series_cols, F.col(time_col), v.alias("__v__")))
    # exact BIGINT micro-units of the 6-dp log return: summed exactly,
    # divided ONCE for the mean (identical IEEE ops on any engine)
    ru = F.round(F.log(F.col("__v__") / F.lag("__v__", 1).over(w))
                 * F.lit(1e6)).cast("bigint")
    runmax = F.max("__v__").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dd = F.round(F.lit(1.0) - F.col("__v__") / runmax, 6)
    rows = (base
            .withColumn("__ru__", ru)
            .withColumn("__dd__", dd))
    mean = (F.sum("__ru__").cast("double") / F.count("__ru__")) / F.lit(1e6)
    agg = rows.groupBy(*series_cols).agg(
        F.count("__ru__").alias("n_returns"),
        mean.alias("mean_return"),
        F.round(F.stddev_pop(F.col("__ru__").cast("double")
                             / F.lit(1e6)), 6).alias("volatility"),
        F.max("__dd__").alias("max_drawdown"))
    sharpe = F.when(F.col("volatility") > 0,
                    F.round(F.col("mean_return") / F.col("volatility"), 6))
    return (agg.where(F.col("n_returns") >= F.lit(min_returns))
            .select(*series_cols, "n_returns", "mean_return",
                    "volatility", sharpe.alias("sharpe"),
                    "max_drawdown"))
