"""Readers (cf. reference ``timeseries.py:183-191`` ``from_file/from_url``
and the Orange 3-row-header CSV dialect described in FIXTURES.md).

``read_parquet`` additionally handles nanosecond-precision parquet
timestamps: Spark has no TIMESTAMP(NANOS) type, so the session reads them as
long (``spark.sql.legacy.parquet.nanosAsLong``) and this reader restores
TimestampType by inspecting the parquet footer with pyarrow — a metadata-only
driver-side read, no data pass, valid at any scale.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nano_timestamp_cols(path: str) -> list:
    """Column names stored as TIMESTAMP(NANOS) in the parquet footer."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return []
    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        target = parts[0]
    try:
        schema = pq.read_schema(target)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(spark: SparkSession, path: str,
                 time_col: Optional[str] = None) -> DataFrame:
    """Read parquet, restoring nanosecond timestamp columns to
    ``TimestampType`` (microsecond precision, truncating)."""
    df = spark.read.parquet(path)
    for col in _nano_timestamp_cols(path):
        if col in df.columns and dict(df.dtypes).get(col) == "bigint":
            # integer division: int64 nanos exceed double precision (2^53),
            # and truncation (not rounding) matches TIMESTAMP_NS readers
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one named table from a testdata scale-factor directory."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


#: Orange header type codes -> Spark cast (FIXTURES.md; reference delegates
#: to Orange readers at ``timeseries.py:183-186``)
_TYPE_CAST = {"t": "timestamp", "time": "timestamp",
              "c": "double", "continuous": "double",
              "d": "string", "discrete": "string",
              "s": "string", "string": "string"}


def read_orange_csv(spark: SparkSession, path: str, sep: str = ","):
    """Read a CSV in Orange's 3-row-header dialect (row 1 names, row 2 type
    codes ``t/c/d/s``, row 3 roles ``class``/``meta``/blank) into a
    DataFrame + role mapping.  The 3-row header is parsed driver-side from
    the file head; the data itself loads through ``spark.read.csv``.

    Returns ``(df, roles, time_col)``.
    """
    with open(path, "r", encoding="utf-8") as f:
        names = next(f).rstrip("\n").split(sep)
        types = next(f).rstrip("\n").split(sep)
        roles_row = next(f).rstrip("\n").split(sep)

    df = (spark.read.option("header", "false").option("sep", sep)
          .csv(path).toDF(*names))
    # drop the three header rows by excluding rows equal to them
    first_col = names[0]
    df = df.where(~F.col(first_col).isin(first_col, types[0], roles_row[0])
                  | F.col(first_col).isNull())

    time_col = None
    for name, tcode in zip(names, types):
        cast = _TYPE_CAST.get(tcode.strip().lower())
        if cast == "timestamp":
            df = df.withColumn(name, F.to_timestamp(name))
            if time_col is None:
                time_col = name
        elif cast == "double":
            df = df.withColumn(name, F.col(name).cast("double"))

    roles = {}
    for name, role in zip(names, roles_row):
        role = role.strip().lower()
        if role == "class":
            roles[name] = "target"
        elif role == "meta":
            roles[name] = "meta"
        else:
            roles[name] = "attribute"
    return df, roles, time_col
