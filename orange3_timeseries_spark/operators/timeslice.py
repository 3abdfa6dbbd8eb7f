"""Time Slice — half-open time-range selection and playback stepping.

``owtimeslice.py:313-319``: the selected subset is
``minTime <= t < maxTime`` (note the half-open interval).  Playback
(``:343-378``) steps the window by its own width or by a calendar delta
(``util.py:20-48``); :func:`slices` reproduces that stepping as a driver-side
generator of filter bounds — each yielded slice is an independent pushed-down
predicate over the (partition-pruned, at scale) time column.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Tuple

from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.timedelta import Delta, add_time
from orange3_timeseries_spark.timeutil import time_literal


def time_slice(tsf: TimeSeriesFrame, lo, hi) -> TimeSeriesFrame:
    """Rows with ``lo <= t < hi`` (``owtimeslice.py:313-319``)."""
    if tsf.time_col is None:
        raise ValueError("time_slice requires a time column")
    t = F.col(tsf.time_col)
    dtype = dict(tsf.df.dtypes).get(tsf.time_col, "")
    return tsf.filter((t >= time_literal(lo, dtype))
                      & (t < time_literal(hi, dtype)))


def slices(start: _dt.datetime, end: _dt.datetime, width_delta: Delta,
           step_delta: Delta = None, step_quantity: int = 1,
           ) -> Iterator[Tuple[_dt.datetime, _dt.datetime]]:
    """Generate successive ``[lo, hi)`` playback windows from ``start`` until
    ``end`` with calendar-aware stepping (``owtimeslice.py:343-378`` +
    ``util.py:20-48``).  Defaults to stepping by the window width."""
    step_delta = step_delta if step_delta is not None else width_delta
    lo = start
    while lo < end:
        hi = add_time(lo, width_delta, 1)
        yield lo, hi
        lo = add_time(lo, step_delta, step_quantity)
