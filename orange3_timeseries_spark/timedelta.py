"""Calendar-aware time-spacing inference and stepping.

Re-expresses the reference's ``TimeDelta`` (``timeseries.py:17-91``) and
``util.add_time`` (``util.py:20-48``) semantics:

- gaps between consecutive *distinct* sorted timestamps are classified;
  any gap of 28/29/30/31 days is the symbolic delta ``(1, 'month')`` and any
  gap of 365/366 days is ``(1, 'year')``;
- zero gaps (duplicate timestamps) are discarded;
- ``gcd`` is the greatest common divisor of numeric gaps, the minimum delta
  when all are symbolic, or gcd(numerics + one day) for a mix;
- stepping adds seconds for numeric deltas and does proper month arithmetic
  with day-of-month clamping for symbolic ones.

The inference itself is one tiny Spark aggregation job: the engine never
collects the series, only the distinct-gap set (bounded by the number of
distinct spacings, which is small for any real series — at 100 TB this is a
single shuffle-light pass over one column with the distinct set reduced
map-side).
"""

from __future__ import annotations

import calendar
import datetime as _dt
from dataclasses import dataclass, field
from math import gcd as _gcd
from numbers import Number
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.timeutil import ts_seconds

Delta = Union[float, tuple]  # seconds, or (n, 'month'|'year')

_SPAN_DAY = {86400}
_SPAN_MONTH = {2678400, 2592000, 2419200, 2505600}  # 31/30/28/29 days
_SPAN_YEAR = {31536000, 31622400}  # normal / leap year


@dataclass
class TimeDelta:
    """Classified spacing of a time column (cf. ``timeseries.py:17-72``)."""

    deltas: list = field(default_factory=list)
    is_equispaced: bool = False
    time_interval: Optional[float] = None
    min: Optional[Delta] = None
    gcd: Optional[Delta] = None
    backwards_compatible_delta: Optional[Delta] = None

    @classmethod
    def from_gaps(cls, raw_gaps: Sequence[float]) -> "TimeDelta":
        """Classify a sequence of unique, sorted, positive gap values
        (seconds).  Mirrors ``timeseries.py:26-72``."""
        self = cls()
        gaps = sorted(set(float(g) for g in raw_gaps if g > 0))
        if not gaps:
            return self
        if len(gaps) == 1:
            self.is_equispaced = True
            self.time_interval = gaps[0]
        deltas: list = []
        for g in gaps:
            if g in _SPAN_MONTH:
                d: Delta = (1, "month")
            elif g in _SPAN_YEAR:
                d = (1, "year")
            else:
                d = g
            if d not in deltas:
                deltas.append(d)
        self.deltas = deltas
        self.min = deltas[0]
        numerics = [d for d in deltas if isinstance(d, Number)]
        if len(numerics) == len(deltas):
            self.gcd = float(_gcd(*[int(d) for d in numerics])) \
                if len(numerics) > 1 else float(numerics[0])
        elif not numerics:
            self.gcd = self.min
        else:
            vals = [int(d) for d in numerics] + [86400]
            g = vals[0]
            for v in vals[1:]:
                g = _gcd(g, v)
            self.gcd = float(g)
        self.backwards_compatible_delta = self._backwards_compatible(gaps)
        return self

    @staticmethod
    def _backwards_compatible(gaps: Sequence[float]) -> Optional[Delta]:
        """Old single-delta classification (``timeseries.py:74-91``) —
        operates on the unique raw gap set (zero gaps already removed by
        our distinct-timestamp diff, matching the common case)."""
        uniq = sorted(set(gaps))
        if len(uniq) <= len(_SPAN_MONTH):
            s = set(int(g) if float(g).is_integer() else g for g in uniq)
            if s and not (s - _SPAN_YEAR):
                return (1, "year")
            if s and not (s - _SPAN_MONTH):
                return (1, "month")
            if s and not (s - _SPAN_DAY):
                return (1, "day")
        return uniq[0] if len(uniq) == 1 else None


def infer_delta(df: DataFrame, time_col: str,
                series_cols: Sequence[str] = ()) -> TimeDelta:
    """Infer the :class:`TimeDelta` of ``time_col`` with one Spark job.

    Distinct timestamps are diffed in sorted order (equivalent to the
    reference's ``np.unique(np.diff(np.sort(t)))`` with zero-gap removal,
    ``timeseries.py:37-43``).  When ``series_cols`` are given the window is
    per-series and the union of per-series gap sets is classified.
    """
    t = F.col(time_col)
    num = ts_seconds(df, time_col)
    distinct = (df.where(t.isNotNull())
                  .select(*series_cols, num.alias("__t"))
                  .distinct())
    w = Window.partitionBy(*series_cols).orderBy("__t") if series_cols \
        else Window.orderBy("__t")
    gaps = (distinct
            .select((F.col("__t") - F.lag("__t").over(w)).alias("g"))
            .where(F.col("g").isNotNull() & (F.col("g") > 0))
            .distinct()
            .collect())
    return TimeDelta.from_gaps([r["g"] for r in gaps])


def add_time(start: _dt.datetime, delta: Delta, quantity: int) -> _dt.datetime:
    """Step a datetime by ``quantity`` deltas with calendar awareness
    (month arithmetic clamps the day-of-month to the target month's length;
    cf. ``util.py:20-48``)."""
    if isinstance(delta, Number):
        return start + _dt.timedelta(seconds=float(delta) * quantity)
    if not delta:
        return start
    n = delta[0] * quantity
    if delta[1] == "month":
        years, months = divmod(n, 12)
        month = start.month + months
        if month < 1:
            years -= 1
            month += 12
        elif month > 12:
            years += 1
            month -= 12
        year = start.year + years
        last_day = calendar.monthrange(year, month)[1]
        return start.replace(day=min(start.day, last_day),
                             month=month, year=year)
    return start.replace(year=start.year + n)


def delta_step_expr(time_col, delta: Delta, quantity_col):
    """Column expression stepping ``time_col`` by ``quantity_col`` deltas —
    the distributed analog of :func:`add_time` (``add_months`` already clamps
    the day of month, matching ``util.py:29-41``)."""
    if isinstance(delta, Number):
        return F.timestamp_add("SECOND",
                               (quantity_col * F.lit(float(delta))).cast("long"),
                               time_col)
    months = delta[0] if delta[1] == "month" else delta[0] * 12
    # add_months returns a DATE (drops time-of-day); the reference's month
    # stepping keeps h:m:s (``util.py:29-41`` replaces the month on the
    # datetime) — re-attach the intra-day offset in microseconds
    stepped_day = F.add_months(time_col, quantity_col * F.lit(months)) \
        .cast("timestamp")
    tod_us = F.unix_micros(time_col) - \
        F.unix_micros(F.date_trunc("DAY", time_col))
    return F.timestamp_add("MICROSECOND", tod_us, stepped_day)
