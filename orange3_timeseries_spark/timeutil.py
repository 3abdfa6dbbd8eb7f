"""Timestamp-type normalization helpers.

The reference decodes every timestamp in UTC
(``orangecontrib/timeseries/aggregate.py:230``,
``Orange.util.utc_from_timestamp``); this engine pins the session timezone
to UTC (:mod:`.session`) so TIMESTAMP (LTZ) wall values equal the UTC
instants the reference would see.

Spark 4, however, reads tz-naive parquet ``timestamp[us]`` columns as
``TIMESTAMP_NTZ`` — and forbids both ``cast(timestamp_ntz AS double)``
and NTZ event-time watermarks.  Two rules keep every operator working on
either type:

1. ingestion (``sources.readers``) casts ``timestamp_ntz`` columns to
   ``timestamp``: under the pinned UTC session timezone the wall values
   are identical, numeric casts become legal, and streaming watermarks
   accept the column;
2. expression sites that need "time as epoch seconds" go through
   :func:`ts_seconds` / :func:`ts_seconds_expr` instead of a bare
   ``cast("double")``, so frames a library user built themselves (NTZ,
   date, or numeric axis) also work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ts_seconds", "ts_seconds_expr", "ntz_to_session_ts",
           "time_literal"]


def ts_seconds_expr(col: Column, dtype: str) -> Column:
    """Epoch-seconds double for a time-like column of known ``dtype``
    (a ``df.dtypes`` simpleString).  ``timestamp_ntz`` / ``date`` first
    cast to session-zone ``timestamp`` (UTC here — a pure metadata
    reinterpretation, no arithmetic), because Spark 4 rejects their
    direct numeric cast; numeric axes pass through unchanged."""
    if dtype in ("timestamp_ntz", "date"):
        col = col.cast("timestamp")
    return col.cast("double")


def ts_seconds(df: DataFrame, col: str) -> Column:
    """Epoch-seconds double for ``df[col]``, whatever its time type."""
    return ts_seconds_expr(F.col(col), dict(df.dtypes).get(col, ""))


def ntz_to_session_ts(df: DataFrame) -> DataFrame:
    """Cast every ``TIMESTAMP_NTZ`` column to ``TIMESTAMP`` (LTZ).  Under
    the UTC session timezone this is value-preserving, and it restores
    the full operator surface (numeric casts, watermarks, interval
    arithmetic).  Applied once at ingestion — a projection, no shuffle."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def time_literal(value, dtype: str) -> Column:
    """A literal comparable against a time column of ``dtype`` without an
    implicit cast on the COLUMN side (which would defeat parquet filter
    pushdown): naive-datetime literals arrive as session-zone TIMESTAMP,
    so against an NTZ column the literal is re-cast instead; against a
    DATE column a date (or midnight-datetime) literal is cast to date for
    the same reason (otherwise Spark upcasts the column side to timestamp
    and the scan filter is lost).  A datetime with a real time-of-day is
    NOT truncated — comparing it as a timestamp is the only semantics
    that keeps a half-open bound exact; that one case trades pushdown for
    correctness."""
    import datetime as _dt

    lit = F.lit(value)
    if dtype == "timestamp_ntz":
        lit = lit.cast("timestamp_ntz")
    elif dtype == "date":
        if isinstance(value, _dt.datetime):
            if (value.hour, value.minute, value.second,
                    value.microsecond) == (0, 0, 0, 0):
                lit = lit.cast("date")
        elif isinstance(value, _dt.date):
            lit = lit.cast("date")
    return lit
