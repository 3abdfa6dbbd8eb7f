"""Monitoring / anomaly-detection operators over ordered series.

Three classic production monitors, each expressed as pure Catalyst
window expressions (no UDFs, no recursion, no driver state):

- :func:`rolling_mad_flags` — robust outlier flags via the modified
  z-score (Iglewicz & Hoaglin 1993): rolling MEDIAN + MAD instead of
  mean + std, so the outliers being hunted cannot poison the baseline
  (the weakness of a plain rolling z-score).  Medians are exact ELEMENT
  selections (lower median) from a sorted window array — no float
  combination at all, so engine and SQL replay agree bit-for-bit.
- :func:`cusum` — Page's CUSUM drift detector.  The textbook recursion
  ``s_t = max(0, s_{t-1} + z_t - k)`` is not a window aggregate, but it
  has a closed prefix form: with ``P_t = Σ_{i≤t} (z_i - k)``,

      ``s_t = P_t - min(0, min_{j≤t} P_j)``

  — a running sum plus a running min, both plain ordered-window
  aggregates that accumulate sequentially in frame order on any SQL
  engine.  This is what makes CUSUM distributable without
  ``applyInPandas``: one shuffle on the series key, then narrow window
  passes.
- :func:`ewma_control` — EWMA control chart (Roberts 1959; Lucas &
  Saccucci 1990 limits).  The recursion ``e_t = λx_t + (1-λ)e_{t-1}``
  unrolls to the closed geometric form
  ``e_t = (1-λ)^t μ + λ Σ_{i≤t} (1-λ)^{t-i} x_i`` (chart centered on the
  series mean μ), computed as one running sum of ``x_i (1-λ)^{-i}``
  scaled by ``(1-λ)^t`` — the same exact-geometric-sum trick the Holt /
  theta forecast oracles use.  Control limits carry the standard
  ``σ √(λ/(2-λ)·(1-(1-λ)^{2t}))`` start-up tightening.

Scale: every operator is (optional groupBy-key shuffle) + ordered
window passes — series parallelize across the cluster, no per-series
collect, no Python in the hot path.  100 TB behavior is governed purely
by the series-key partitioning, same as every other windowed operator
in this engine.

Determinism contract for the SQL oracles: median/MAD are element
selections (exact); CUSUM standardizes to a 6-dp-rounded z at SOURCE
(the round-derived-inputs rule) before the prefix sums; EWMA rounds at
the output only (pow noise is ~1 ulp, far below the 6-dp firewall).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_mad_flags", "cusum", "ewma_control"]


def _lower_median(arr_col):
    """Exact lower median of a sorted array column: element at position
    ``(n+1)//2`` (1-based) — pure element selection, no interpolation,
    so there is no float arithmetic for engines to disagree on."""
    n = F.size(arr_col)
    return F.element_at(arr_col, ((n + 1) / 2).cast("int"))


def rolling_mad_flags(df: DataFrame, value_col: str, order_col: str,
                      group_cols: Sequence[str], window: int = 25,
                      thresh: float = 3.5,
                      tie_cols: Sequence[str] = ()) -> DataFrame:
    """Robust rolling outlier flags via the modified z-score
    ``0.6745·(x − med)/MAD`` over a trailing window of ``window`` rows
    (the current row included).  Emits only rows with a FULL window, so
    the flag's meaning never varies with warm-up length.

    Output adds ``med``, ``mad`` (rounded 6 dp for display), ``mod_z``
    (UNROUNDED; NULL when MAD = 0) and ``is_outlier`` (``MAD > 0 AND
    |mod_z| > thresh``; a zero-MAD window — over half the values
    identical — flags nothing, the documented Iglewicz-Hoaglin
    degenerate case).  ``mod_z`` carries no final rounding because its
    inputs (x, an element-selected median, an element-selected MAD) are
    bit-identical on every engine and the single expression replays the
    same IEEE association — while a round(.,6) WOULD diverge: a ratio
    of 2-decimal data values times 0.6745 lands exactly on 6dp
    half-boundaries, where decimal HALF_UP and binary rounding disagree.
    """
    group_cols = list(group_cols)
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tie_cols]
    w = (Window.partitionBy(*group_cols).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    x = F.col(value_col).cast("double")
    # NULL handling differs between engines' list aggregates — drop
    # up front so the window is "last `window` observations"
    df = df.where(F.col(value_col).isNotNull())
    arr = F.sort_array(F.collect_list(x).over(w))
    out = df.withColumn("__arr__", arr)
    med = _lower_median(F.col("__arr__"))
    out = out.withColumn("__med__", med)
    devs = F.array_sort(F.transform(
        F.col("__arr__"), lambda y: F.abs(y - F.col("__med__"))))
    mad = _lower_median(devs)
    out = out.withColumn("__mad__", mad)
    mz = F.lit(0.6745) * (x - F.col("__med__")) / F.col("__mad__")
    return (out.where(F.size("__arr__") == window)
            .select(*group_cols, order_col, *tie_cols,
                    F.round(x, 6).alias("x"),
                    F.round("__med__", 6).alias("med"),
                    F.round("__mad__", 6).alias("mad"),
                    F.when(F.col("__mad__") > 0, mz).alias("mod_z"),
                    # mz is bit-identical across engines (exact-element
                    # inputs, one shared association), so the flag can
                    # compare it directly — no rounding needed or wanted
                    ((F.col("__mad__") > 0)
                     & (F.abs(mz) > F.lit(float(thresh))))
                    .alias("is_outlier")))


def cusum(df: DataFrame, value_col: str, order_col: str,
          group_cols: Sequence[str], k: float = 0.5, h: float = 4.0,
          tie_cols: Sequence[str] = ()) -> DataFrame:
    """Two-sided standardized CUSUM per series: upper statistic
    ``s⁺_t = max(0, s⁺_{t-1} + z_t − k)`` and lower
    ``s⁻_t = max(0, s⁻_{t-1} − z_t − k)`` with alarms at ``> h`` (``k``,
    ``h`` in σ units — the usual 0.5σ slack / 4σ decision interval).

    ``z`` standardizes against the SERIES' own mean and population std
    (rounded 6 dp at source — the engine/oracle determinism firewall);
    zero-variance series are dropped (no meaningful σ units).  The
    recursion is computed via the closed prefix form (module docstring),
    so the whole operator is three ordered-window passes."""
    group_cols = list(group_cols)
    pw = Window.partitionBy(*group_cols)
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tie_cols]
    ow = (pw.orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    x = F.col(value_col).cast("double")
    df = df.where(F.col(value_col).isNotNull())
    z = F.round((x - F.avg(x).over(pw)) / F.stddev_pop(x).over(pw), 6)
    base = (df.withColumn("__sd__", F.stddev_pop(x).over(pw))
            .where(F.col("__sd__") > 0)
            .withColumn("__z__", z))
    up_p = F.sum(F.col("__z__") - F.lit(float(k))).over(ow)
    dn_p = F.sum(-F.col("__z__") - F.lit(float(k))).over(ow)
    base = (base.withColumn("__pu__", up_p).withColumn("__pd__", dn_p)
            .withColumn("__mu__",
                        F.least(F.lit(0.0), F.min("__pu__").over(ow)))
            .withColumn("__md__",
                        F.least(F.lit(0.0), F.min("__pd__").over(ow))))
    s_up = F.round(F.col("__pu__") - F.col("__mu__"), 6)
    s_dn = F.round(F.col("__pd__") - F.col("__md__"), 6)
    # alarms compare the ROUNDED statistic (flag-flip firewall)
    return base.select(
        *group_cols, order_col, *tie_cols,
        F.col("__z__").alias("z"),
        s_up.alias("s_up"),
        s_dn.alias("s_dn"),
        (s_up > F.lit(float(h))).alias("alarm_up"),
        (s_dn > F.lit(float(h))).alias("alarm_dn"))


#: trailing rows the EWMA fold keeps: beta^200 < 1e-19 for any lam
#: >= 0.2, so older observations contribute nothing at double precision
_EWMA_WINDOW = 200


def ewma_control(df: DataFrame, value_col: str, order_col: str,
                 group_cols: Sequence[str], lam: float = 0.2,
                 L: float = 3.0) -> DataFrame:
    """EWMA control chart per series: the textbook recursion
    ``e_t = λx_t + (1−λ)e_{t−1}`` (chart centered on the series mean μ,
    ``e_0 = μ``) evaluated as an array FOLD over the trailing
    ``_EWMA_WINDOW`` observations, with start-up-tightened limits
    ``μ ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t}))`` and a violation flag.

    Why a fold and not the ``β^{−i}`` geometric running sum: the
    rescaled form overflows double around t ≈ 3200 (``0.8^{-t}`` >
    DBL_MAX), silently NaN-ing every later row of a long series.  The
    fold is exact for ``t ≤ _EWMA_WINDOW`` and within ``β^200 ≈ 1e-20``
    beyond (the older terms are sub-ulp), runs in frame order on every
    engine, and is bounded per row.  ``1-lam`` is evaluated once in
    Python and injected as a literal so both engines smooth with the
    exact same double.  Zero-variance series are dropped."""
    group_cols = list(group_cols)
    beta = 1.0 - float(lam)  # exact same double on both engines
    pw = Window.partitionBy(*group_cols)
    ow = (pw.orderBy(F.col(order_col).asc())
          .rowsBetween(-(_EWMA_WINDOW - 1), 0))
    x = F.col(value_col).cast("double")
    df = df.where(F.col(value_col).isNotNull())
    base = (df.withColumn("__mu__", F.avg(x).over(pw))
            .withColumn("__sd__", F.stddev_pop(x).over(pw))
            .where(F.col("__sd__") > 0)
            .withColumn("__t__", F.row_number().over(
                pw.orderBy(F.col(order_col).asc()))))
    # the literal recursion, folded oldest -> newest over the frame;
    # init = mu while the frame still reaches back to t=0, else the
    # (sub-ulp) pre-window contribution is dropped
    arr = F.collect_list(x).over(ow)
    init = F.when(F.col("__t__") <= _EWMA_WINDOW, F.col("__mu__")) \
        .otherwise(F.lit(0.0))
    e = F.aggregate(
        arr, init.cast("double"),
        lambda acc, y: acc * F.lit(beta) + F.lit(float(lam)) * y)
    width = (F.lit(float(L)) * F.col("__sd__")
             * F.sqrt(F.lit(float(lam) / (2.0 - float(lam)))
                      * (F.lit(1.0)
                         - F.pow(F.lit(beta), 2 * F.col("__t__")))))
    ucl = F.round(F.col("__mu__") + width, 6)
    lcl = F.round(F.col("__mu__") - width, 6)
    e6 = F.round(e, 6)
    # violation compares the ROUNDED chart values (flag-flip firewall)
    return base.select(
        *group_cols, order_col, F.col("__t__").alias("t"),
        F.round(x, 6).alias("x"),
        e6.alias("ewma"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((e6 > ucl) | (e6 < lcl)).alias("violation"))
