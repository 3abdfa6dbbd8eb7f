"""The aggregation-kernel registry, re-expressed as Catalyst expressions.

Mirrors the reference's ``AggOptions`` registry of 18 windowed/block kernels
(``aggregate.py:125-183``) and ``PeriodOptions`` calendar keys
(``aggregate.py:186-223``), with each kernel's NaN semantics encoded
explicitly (missing values are **nulls** in the engine; every kernel states
its rule, cf. SURVEY §7.3):

==============  =========================================================
kernel          null rule (reference NaN rule)
==============  =========================================================
mean/min/max/   skip nulls (``np.nanmean`` etc.)
median/span
sum             skip; empty/all-null -> 0       (``np.nansum``)
product         skip; empty/all-null -> 1       (``np.nanprod``)
mode            omit nulls; tie -> smallest     (scipy ``stats.mode``)
std/var         population ddof=0, skip nulls   (``np.nanstd/nanvar``)
lin./exp. MA    positional weights renormalized over non-null
                (``aggregate.py:50-83``); all-null -> null
harmonic        any null or negative -> null; zero -> 0 (scipy ``hmean``)
geometric       any null -> null; negative -> null; zero -> 0 (``gmean``)
non-zero        count of finite non-zero        (``aggregate.py:23-24``)
defined         count of finite                 (``aggregate.py:27-28``)
cumsum          running sum, null adds 0        (``np.nancumsum``)
cumprod         running product, null mult 1    (``np.nancumprod``)
==============  =========================================================

Every kernel is a *builder* ``(c, ov, ctx) -> Column`` where ``ov`` applies
the evaluation context to each aggregate node: ``.over(frame)`` for sliding
windows, ``.over(partition)`` for tumbling blocks, or identity for
``groupBy().agg``.  One definition therefore serves all three windowing
modes of the reference (``owmovingtransform.py:375-377``).

Sliding evaluation uses ``Window.rowsBetween(-(width-1), 0)`` gated on
``row_number() >= width`` (complete windows only — the reference emits
``n-width+1`` values, ``aggregate.py:31-38``).  Strided evaluation
(``shift > 1``) filters ``(rn - width) % shift == 0`` afterwards — stride is
not a Spark frame concept (SURVEY §4).  All expressions stay JVM-side
(whole-stage codegen); only ``collect_list``-based kernels (mode / median /
exp. MA) carry O(width) per-row state.
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


# --------------------------------------------------------------------- helpers
def null_norm(c: Column) -> Column:
    """Normalize missing to null: NaN (from float data) and null both become
    null, so Spark's null-skipping aggregates implement the nan-skipping
    kernels."""
    d = c.cast("double")
    return F.when(d.isNull() | F.isnan(d), F.lit(None).cast("double")).otherwise(d)


def ident(x: Column) -> Column:
    """The ``ov`` applicator for plain ``groupBy().agg`` contexts."""
    return x


class Ctx:
    """Evaluation context: window ``w``idth and the materialized row-number
    column ``rn`` (required by the positional-weight kernels)."""

    def __init__(self, w: Optional[int] = None, rn: Optional[Column] = None):
        self.w = w
        self.rn = rn


def _array_median(arr: Column) -> Column:
    """Exact median of a sorted null-free array, matching ``np.nanmedian``."""
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return F.when(n > 0, (lo + hi) / 2)


def _array_mode(arr: Column) -> Column:
    """Mode of a sorted ascending array with smallest-value tie-break,
    matching scipy ``stats.mode`` (``aggregate.py:94-103``: ties resolve to
    the smallest modal value).  One ``aggregate`` higher-order function over
    adjacent runs of the sorted array."""
    acc0 = F.struct(
        F.lit(None).cast("double").alias("bv"), F.lit(0).cast("long").alias("bc"),
        F.lit(None).cast("double").alias("cv"), F.lit(0).cast("long").alias("cc"),
    )

    def merge(acc, x):
        new_run = acc["cv"].isNull() | (acc["cv"] != x)
        better = acc["cc"] > acc["bc"]
        return F.struct(
            F.when(new_run & better, acc["cv"]).otherwise(acc["bv"]).alias("bv"),
            F.when(new_run & better, acc["cc"]).otherwise(acc["bc"]).alias("bc"),
            F.when(new_run, x).otherwise(acc["cv"]).alias("cv"),
            F.when(new_run, F.lit(1).cast("long")).otherwise(acc["cc"] + 1).alias("cc"),
        )

    def finish(acc):
        return F.when(acc["cc"] > acc["bc"], acc["cv"]).otherwise(acc["bv"])

    return F.aggregate(arr, acc0, merge, finish)


# ------------------------------------------------------------------- builders
def _mean(c, ov, ctx):
    return ov(F.avg(c))


def _sum(c, ov, ctx):
    return F.coalesce(ov(F.sum(c)), F.lit(0.0))


def _product(c, ov, ctx):
    """Exact product via sign/zero bookkeeping + log-sum-exp; empty or
    all-null -> 1 (``np.nanprod``)."""
    zeros = ov(F.sum(F.when(c == 0, 1).otherwise(0)))
    negs = ov(F.sum(F.when(c < 0, 1).otherwise(0)))
    logs = ov(F.sum(F.when(c != 0, F.log(F.abs(c)))))
    sign = F.when(negs % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(zeros > 0, F.lit(0.0)) \
            .otherwise(F.coalesce(F.exp(logs) * sign, F.lit(1.0)))


def _min(c, ov, ctx):
    return ov(F.min(c))


def _max(c, ov, ctx):
    return ov(F.max(c))


def _span(c, ov, ctx):
    return ov(F.max(c)) - ov(F.min(c))


def _median(c, ov, ctx):
    return _array_median(F.sort_array(ov(F.collect_list(c))))


def _mode(c, ov, ctx):
    return _array_mode(F.sort_array(ov(F.collect_list(c))))


def _std(c, ov, ctx):
    return ov(F.stddev_pop(c))


def _var(c, ov, ctx):
    return ov(F.var_pop(c))


def _linma(c, ov, ctx):
    """Linear MA, weights 1..w oldest->newest, renormalized over non-null
    positions (``aggregate.py:50-76``).  Expressed with plain window sums:
    within the frame ending at row ``rn``, weight_i = rn_i - rn + w, so
    num = sum(x*rn_i) + (w - rn)*sum(x); den analogous over non-null rows —
    O(1) state per row, no array materialization."""
    rn, w = ctx.rn, ctx.w
    num = ov(F.sum(c * rn)) + (F.lit(w) - rn) * ov(F.sum(c))
    den = ov(F.sum(F.when(c.isNotNull(), rn))) \
        + (F.lit(w) - rn) * ov(F.count(c))
    return num / den


def _expma(c, ov, ctx):
    """Exponential MA, alpha=2/(w+1), weights alpha*(1-alpha)^age
    renormalized over non-null (``aggregate.py:79-83``).  Positional weights
    need each element's row number, so the frame is collected as
    (rn, value) structs and folded with one higher-order aggregate; the
    normalization constant cancels in the ratio."""
    rn, w = ctx.rn, ctx.w
    alpha = 2.0 / (w + 1.0)
    arr = ov(F.collect_list(F.struct(rn.alias("i"), c.alias("v"))))

    def wt(e):
        return F.pow(F.lit(1.0 - alpha), (rn - e["i"]).cast("double"))

    num = F.aggregate(arr, F.lit(0.0),
                      lambda a, e: a + F.coalesce(wt(e) * e["v"], F.lit(0.0)))
    den = F.aggregate(arr, F.lit(0.0),
                      lambda a, e: a + F.when(e["v"].isNotNull(), wt(e))
                                        .otherwise(F.lit(0.0)))
    return F.when(den > 0, num / den)


def _harmonic(c, ov, ctx):
    # scipy hmean semantics (``aggregate.py:106-117``, goldens
    # ``test_aggregate.py:225-229``): any NaN -> NaN, any negative -> NaN
    # (ValueError path), any zero -> 0, else n / sum(1/x).
    total = ov(F.count(F.lit(1)))
    defined = ov(F.count(c))
    mn = ov(F.min(c))
    return F.when((defined == total) & (mn >= 0),
                  F.when(mn == 0, F.lit(0.0))
                   .otherwise(defined.cast("double") / ov(F.sum(F.lit(1.0) / c))))


def _geometric(c, ov, ctx):
    total = ov(F.count(F.lit(1)))
    defined = ov(F.count(c))
    mn = ov(F.min(c))
    return F.when((defined == total) & (mn >= 0),
                  F.when(mn == 0, F.lit(0.0))
                   .otherwise(F.exp(ov(F.avg(F.log(c))))))


def _nonzero(c, ov, ctx):
    return ov(F.sum(F.when((c != 0) & c.isNotNull(), 1).otherwise(0))) \
        .cast("double")


def _defined(c, ov, ctx):
    return ov(F.count(c)).cast("double")


# ------------------------------------------------------------------- registry
@dataclass
class AggDesc:
    """One registry entry, mirroring the reference ``AggDesc``
    (``aggregate.py:125-148``): the builder, whether a block variant exists
    (False => sliding-only, rejected by block/period modes like the widget's
    inapplicable warning, ``owmovingtransform.py:461-463``), an optional
    cumulative builder (full-prefix variant, ``owmovingtransform.py:413-414``),
    and the capability flags."""

    key: str
    builder: Callable[[Column, Callable, Ctx], Column]
    has_block: bool = True
    cumulative: Optional[Callable] = None
    supports_discrete: bool = False
    count_aggregate: bool = False
    same_scale: bool = False


AGG_OPTIONS: Dict[str, AggDesc] = {}


def _reg(*args, **kwargs):
    d = AggDesc(*args, **kwargs)
    AGG_OPTIONS[d.key] = d
    return d


def register_aggregation(key: str, builder, *, has_block: bool = True,
                         cumulative=None, supports_discrete: bool = False,
                         count_aggregate: bool = False,
                         same_scale: bool = False) -> "AggDesc":
    """Public extension point mirroring the reference's data-driven
    ``AggOptions`` registry (``aggregate.py:125-183``): register a custom
    aggregation once and every windowing mode — sliding, strided, blocks,
    calendar periods, spiralogram cells, streaming windows — picks it up.

    ``builder(col, over, ctx) -> Column`` receives the null-normalized
    column, an ``over`` callable that wraps an aggregate expression in the
    mode's window (identity for grouped modes), and a :class:`Ctx` with
    the window width when sliding.
    """
    if key in AGG_OPTIONS:
        raise ValueError(f"aggregation {key!r} already registered")
    return _reg(key, builder, has_block=has_block, cumulative=cumulative,
                supports_discrete=supports_discrete,
                count_aggregate=count_aggregate, same_scale=same_scale)


_reg("mean", _mean, same_scale=True)
_reg("sum", _sum)
_reg("product", _product)
_reg("min", _min, same_scale=True)
_reg("max", _max, same_scale=True)
_reg("span", _span)
_reg("median", _median, same_scale=True)
_reg("mode", _mode, supports_discrete=True, same_scale=True)
_reg("std", _std, same_scale=True)
_reg("var", _var)
_reg("lin. MA", _linma, has_block=False, same_scale=True)
_reg("exp. MA", _expma, has_block=False, same_scale=True)
_reg("harmonic", _harmonic, same_scale=True)
_reg("geometric", _geometric, same_scale=True)
_reg("non-zero", _nonzero, supports_discrete=True, count_aggregate=True)
_reg("defined", _defined, supports_discrete=True, count_aggregate=True)
_reg("cumsum", _sum, has_block=False, cumulative=_sum)
_reg("cumprod", _product, has_block=False, cumulative=_product)


# ------------------------------------------------------- calendar period keys
@dataclass
class PeriodDesc:
    """Calendar grouping key (cf. ``PeriodOptions``, ``aggregate.py:186-223``).
    ``expr(t)`` produces the grouping value; truncation keys emit timestamps,
    periodic keys emit integers (or label strings when ``names`` is set and
    requested).  All keys follow the session timezone, pinned to UTC for
    parity with ``utc_from_timestamp`` decoding (``aggregate.py:230``)."""

    name: str
    expr: Callable[[Column], Column]
    attr_name: str
    periodic: bool = False
    names: Optional[tuple] = None


PERIOD_OPTIONS: Dict[str, PeriodDesc] = {}


def _preg(name, expr, attr_name, periodic=False, names=None):
    PERIOD_OPTIONS[name] = PeriodDesc(name, expr, attr_name, periodic, names)


_preg("Years", lambda t: F.date_trunc("year", t), "Time")
_preg("Months", lambda t: F.date_trunc("month", t), "Time")
_preg("Days", lambda t: F.date_trunc("day", t), "Time")
_preg("Hours", lambda t: F.date_trunc("hour", t), "Time")
_preg("Minutes", lambda t: F.date_trunc("minute", t), "Time")
_preg("Seconds", lambda t: F.date_trunc("second", t), "Time")
_preg("Month of year", F.month, "Month", periodic=True,
      names=tuple(calendar.month_name[1:]))
_preg("Week of year", F.weekofyear, "Week", periodic=True)
_preg("Day of year", F.dayofyear, "Day", periodic=True)
_preg("Day of month", F.dayofmonth, "Day", periodic=True)
# Monday=0 like datetime.weekday() (``aggregate.py:236-237``); Spark Sun=1.
_preg("Day of week", lambda t: (F.dayofweek(t) + 5) % 7, "Day", periodic=True,
      names=tuple(calendar.day_name))
_preg("Hour of day", F.hour, "Hour", periodic=True)


def period_key_expr(period: str, t: Column, use_names: bool = False) -> Column:
    """The grouping expression for a named period; with ``use_names`` the
    keys with name tables emit label strings (``aggregate.py:242-246``)."""
    desc = PERIOD_OPTIONS[period]
    e = desc.expr(t)
    if use_names and desc.names:
        offset = 0 if desc.name == "Day of week" else -1
        return F.element_at(F.lit(list(desc.names)), e.cast("int") + 1 + offset)
    return e
