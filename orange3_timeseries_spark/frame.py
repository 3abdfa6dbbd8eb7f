"""TimeSeriesFrame — the engine's typed series frame over a Spark DataFrame.

Plays the role of the reference's ``Timeseries`` table subclass
(``timeseries.py:94-299``) with the semantics generalized for scale:

- the frame wraps an immutable ``DataFrame`` plus *metadata*: the designated
  time column (``timeseries.py:249-268``), per-column roles
  (attribute / target / meta — Orange's ``Domain`` role split), and optional
  ``series_cols`` partitioning keys.  The reference is single-series by
  construction; every operator here accepts per-series partitioning so the
  same code runs over millions of independent series on a cluster
  (SURVEY §7.3 "single-series hotspots").
- row order is *explicit*: window operators order by the time column when
  designated, else by a synthesized ``__row_idx__`` (the reference equally
  falls back to ``np.arange(len(self))`` — ``timeseries.py:241-247``).
- construction from a continuous/time column drops NaN-time rows; sorting is
  carried by window specs rather than physical order
  (``timeseries.py:219-239``).
- interpolation policy travels on the frame (``timeseries.py:100-104,270-299``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from orange3_timeseries_spark.timedelta import TimeDelta, infer_delta

ROW_IDX = "__row_idx__"

#: role constants mirroring Orange's Domain split
ATTRIBUTE, TARGET, META = "attribute", "target", "meta"

_TEMPORAL_PREFIXES = ("timestamp", "date")
_NUMERIC_TYPES = {"double", "float", "int", "bigint", "smallint", "tinyint",
                  "decimal", "long"}


class TimeSeriesFrame:
    """A Spark DataFrame with time-series semantics attached."""

    def __init__(self, df: DataFrame,
                 time_col: Optional[str] = None,
                 roles: Optional[Dict[str, str]] = None,
                 series_cols: Sequence[str] = (),
                 interp_method: str = "linear",
                 interp_multivariate: bool = False,
                 _delta: Optional[TimeDelta] = None):
        if time_col is not None and time_col not in df.columns:
            raise ValueError(f"{time_col!r} is not a column of the frame")
        self.df = df
        self.time_col = time_col
        self.series_cols = list(series_cols)
        self.roles = dict(roles or {})
        self.interp_method = interp_method
        self.interp_multivariate = interp_multivariate
        self._delta = _delta

    # ------------------------------------------------------------------ build
    @classmethod
    def from_data_table(cls, df: DataFrame, time_col: Optional[str] = None,
                        series_cols: Sequence[str] = (),
                        roles: Optional[Dict[str, str]] = None,
                        ) -> "TimeSeriesFrame":
        """Designate (or auto-detect) the time column; rows with a null time
        are dropped, mirroring ``make_timeseries_from_continuous_var``
        (``timeseries.py:219-239``; auto-detection order per
        ``from_data_table``, ``timeseries.py:134-137``)."""
        if time_col is None:
            for name, dtype in df.dtypes:
                if dtype.startswith(_TEMPORAL_PREFIXES):
                    time_col = name
                    break
        if time_col is None:
            return cls(df, None, roles, series_cols)
        df = df.where(F.col(time_col).isNotNull())
        return cls(df, time_col, roles, series_cols)

    @classmethod
    def from_sequence(cls, df: DataFrame, delta, start=None, name: str = "T",
                      order_col: Optional[str] = None,
                      series_cols: Sequence[str] = ()) -> "TimeSeriesFrame":
        """Synthesize an equispaced time column ``start + i*delta`` over the
        row sequence (cf. ``make_timeseries_from_sequence``,
        ``timeseries.py:193-217``); ``delta`` is seconds or
        ``(n,'month'|'year')``."""
        import datetime as _dt

        from orange3_timeseries_spark.timedelta import delta_step_expr

        if start is None:
            start = _dt.datetime(1970, 1, 1)
        w = (Window.partitionBy(*series_cols).orderBy(order_col)
             if order_col else
             Window.partitionBy(*series_cols).orderBy(F.monotonically_increasing_id()))
        idx = (F.row_number().over(w) - 1)
        out = df.withColumn(
            name, delta_step_expr(F.lit(start).cast("timestamp"), delta, idx))
        return cls(out, name, series_cols=series_cols)

    # ------------------------------------------------------------- properties
    @property
    def spark(self):
        return self.df.sparkSession

    @property
    def columns(self):
        return self.df.columns

    @property
    def value_cols(self) -> list:
        """Numeric, non-time, non-series columns — the operand set of the
        windowed operators (the reference analogously iterates continuous
        non-time variables, e.g. ``owdifference.py:124-126``)."""
        skip = set(self.series_cols) | {self.time_col, ROW_IDX}
        out = []
        for name, dtype in self.df.dtypes:
            base = dtype.split("(")[0]
            if name not in skip and base in _NUMERIC_TYPES \
                    and self.roles.get(name) != META:
                out.append(name)
        return out

    @property
    def time_delta(self) -> Optional[TimeDelta]:
        """Inferred spacing; lazily computed, cached (one small Spark job —
        cf. ``timeseries.py:268``)."""
        if self.time_col is None:
            return None
        if self._delta is None:
            self._delta = infer_delta(self.df, self.time_col, self.series_cols)
        return self._delta

    # ------------------------------------------------------------- windowing
    def order_expr(self):
        """The explicit ordering expression every window op keys on."""
        if self.time_col is not None:
            return F.col(self.time_col)
        if ROW_IDX in self.df.columns:
            return F.col(ROW_IDX)
        raise ValueError(
            "Frame has no time column and no __row_idx__; call "
            "with_row_index() first to establish an explicit row order")

    def with_row_index(self, order_cols: Sequence[str] = ()) -> "TimeSeriesFrame":
        """Materialize a deterministic 1-based row index per series.

        When neither a time column nor ``order_cols`` exist, falls back to
        the current partition layout order (deterministic only for freshly
        read data — same caveat as the reference's reliance on input row
        order, ``timeseries.py:241-247``)."""
        if ROW_IDX in self.df.columns:
            return self
        if self.time_col is not None:
            order = [F.col(self.time_col)] + [F.col(c) for c in order_cols]
        elif order_cols:
            order = [F.col(c) for c in order_cols]
        else:
            order = [F.monotonically_increasing_id()]
        w = Window.partitionBy(*self.series_cols).orderBy(*order)
        return self._with_df(self.df.withColumn(ROW_IDX, F.row_number().over(w)))

    def ordered_window(self) -> WindowSpec:
        return Window.partitionBy(*self.series_cols).orderBy(self.order_expr())

    # ------------------------------------------------------------------ misc
    def set_interpolation(self, method: str = "linear",
                          multivariate: bool = False) -> "TimeSeriesFrame":
        out = self._with_df(self.df)
        out.interp_method = method
        out.interp_multivariate = multivariate
        return out

    def interp(self, cols: Optional[Sequence[str]] = None) -> "TimeSeriesFrame":
        """Interpolate missing values by the frame's policy
        (cf. ``timeseries.py:274-299``)."""
        from orange3_timeseries_spark.operators.interpolate import (
            interpolate_timeseries,
        )
        return interpolate_timeseries(self, self.interp_method,
                                      self.interp_multivariate, cols=cols)

    def select(self, *cols) -> "TimeSeriesFrame":
        """Domain projection; drops the time designation if projected out
        (cf. ``timeseries.py:116-120``)."""
        out = self.df.select(*cols)
        time_col = self.time_col if self.time_col in out.columns else None
        return TimeSeriesFrame(out, time_col,
                               {k: v for k, v in self.roles.items()
                                if k in out.columns},
                               [c for c in self.series_cols if c in out.columns],
                               self.interp_method, self.interp_multivariate,
                               _delta=self._delta if time_col else None)

    def filter(self, cond) -> "TimeSeriesFrame":
        return self._with_df(self.df.filter(cond))

    def _with_df(self, df: DataFrame) -> "TimeSeriesFrame":
        return TimeSeriesFrame(df, self.time_col, self.roles,
                               self.series_cols, self.interp_method,
                               self.interp_multivariate, _delta=self._delta)

    def __repr__(self):
        return (f"TimeSeriesFrame(time_col={self.time_col!r}, "
                f"series_cols={self.series_cols}, cols={self.df.columns})")
