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

from ..timeutil import ntz_to_session_ts, time_literal


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


def _utc_nanos(d) -> int:
    """Exact int64 nanos since epoch for a (naive = UTC) datetime —
    integer arithmetic; float seconds lose precision above 2^53."""
    import datetime as _dt

    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    delta = d - _dt.datetime(1970, 1, 1)
    return ((delta.days * 86400 + delta.seconds) * 10 ** 9
            + delta.microseconds * 1000)


def read_parquet(spark: SparkSession, path: str,
                 time_col: Optional[str] = None,
                 time_range: Optional[tuple] = None) -> DataFrame:
    """Read parquet, restoring nanosecond timestamp columns to
    ``TimestampType`` (microsecond precision, truncating).

    ``time_range=(lo, hi)`` (datetimes; half-open ``[lo, hi)``) applies the
    time predicate **on the raw int64 nanos column before the conversion
    projection**, so it reaches the scan as ``PushedFilters`` and prunes
    parquet row groups by min/max stats.  A filter on the *converted*
    column cannot push (parquet pushdown works on attribute references
    only, not expressions) — at 100 TB that is the difference between
    reading one day and reading the whole table.

    Tz-naive parquet timestamps (Spark 4 reads them as ``TIMESTAMP_NTZ``)
    are normalized to session-zone ``TIMESTAMP`` — the reference decodes
    all timestamps in UTC (``aggregate.py:230``) and the session timezone
    is pinned to UTC, so wall values are preserved while numeric casts
    and event-time watermarks become legal again.  The ``time_range``
    filter runs before that projection, with the LITERAL cast to NTZ, so
    pushdown still sees a bare attribute comparison.
    """
    df = spark.read.parquet(path)
    nanos = [c for c in _nano_timestamp_cols(path)
             if c in df.columns and dict(df.dtypes).get(c) == "bigint"]
    if time_range is not None:
        lo, hi = time_range
        tcol = time_col or (nanos[0] if nanos else None)
        if tcol is None:
            raise ValueError("time_range needs time_col for this schema")
        if tcol in nanos:
            df = df.where((F.col(tcol) >= F.lit(_utc_nanos(lo)))
                          & (F.col(tcol) < F.lit(_utc_nanos(hi))))
        else:
            dtype = dict(df.dtypes).get(tcol, "")
            df = df.where((F.col(tcol) >= time_literal(lo, dtype))
                          & (F.col(tcol) < time_literal(hi, dtype)))
    for col in nanos:
        # integer division: int64 nanos exceed double precision (2^53),
        # and truncation (not rounding) matches TIMESTAMP_NS readers
        df = df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return ntz_to_session_ts(df)


def read_table(spark: SparkSession, sf_dir: str, name: str,
               time_col: Optional[str] = None,
               time_range: Optional[tuple] = None) -> DataFrame:
    """Read one named table from a testdata scale-factor directory."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"),
                        time_col=time_col, time_range=time_range)


def read_parquet_stream(spark: SparkSession, path: str,
                        glob_filter: Optional[str] = None) -> DataFrame:
    """Streaming twin of :func:`read_parquet`: a parquet file-source
    stream with the same TIMESTAMP(NANOS) restoration.

    Streaming sources need an explicit schema; it is taken from a
    driver-side static read of the same path (footer metadata only).
    ``path`` must be a directory for the file source — ``glob_filter``
    narrows it to one table's files.  At scale this is the standard
    "new files land in a partitioned directory" ingestion pattern;
    maxFilesPerTrigger bounds each micro-batch."""
    target = path
    if glob_filter and os.path.isdir(path):
        matches = sorted(glob.glob(os.path.join(path, glob_filter)))
        if matches:
            target = matches[0]
    static = spark.read.parquet(target)
    reader = spark.readStream.schema(static.schema)
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    sdf = reader.parquet(path)
    nanos = [c for c in _nano_timestamp_cols(target)
             if c in sdf.columns and dict(sdf.dtypes).get(c) == "bigint"]
    for col in nanos:
        sdf = sdf.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return ntz_to_session_ts(sdf)


def read_table_stream(spark: SparkSession, sf_dir: str,
                      name: str) -> DataFrame:
    """Stream one named table from a testdata scale-factor directory."""
    return read_parquet_stream(spark, sf_dir,
                               glob_filter=f"{name}.parquet")


def read_orange_csv_url(spark: SparkSession, url: str, sep: str = ","):
    """``Timeseries.from_url`` analog (``timeseries.py:188-191``):
    driver-side download to a temp file, then :func:`read_orange_csv`.
    Appropriate for the small hand-authored datasets the reference loads
    this way — bulk data belongs in parquet on shared storage."""
    import tempfile
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller's URL)
        data = resp.read()
    tmp = tempfile.NamedTemporaryFile(suffix=".csv", delete=False)
    tmp.write(data)
    tmp.close()
    return read_orange_csv(spark, tmp.name, sep=sep)


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
    # drop the three header rows: exclude any row whose FULL tuple matches
    # one of them (empty header cells arrive as null)
    def _row_match(vals):
        cond = F.lit(True)
        for name, val in zip(names, vals):
            c = F.col(name)
            cond = cond & (c.isNull() if val == "" else (c == F.lit(val)))
        return cond

    df = df.where(~(_row_match(names) | _row_match(types)
                    | _row_match(roles_row)))
    return _apply_orange_header(df, names, types, roles_row)


def _apply_orange_header(df, names, types, roles_row):
    """Apply the Orange 3-row header's type codes and roles to a
    string-typed DataFrame: cast ``t``/``c`` columns, map ``class``/
    ``meta``/``ignore`` roles.  Returns ``(df, roles, time_col)``."""
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
    dropped = []
    for name, role in zip(names, roles_row):
        role = role.strip().lower()
        if role == "class":
            roles[name] = "target"
        elif role == "meta":
            roles[name] = "meta"
        elif role in ("i", "ignore"):
            dropped.append(name)  # Orange's ignored-column flag
        else:
            roles[name] = "attribute"
    if dropped:
        df = df.drop(*dropped)
        if time_col in dropped:
            time_col = None
    return df, roles, time_col


def read_orange_tab(spark: SparkSession, path: str):
    """Orange ``.tab`` dialect: identical 3-row header, tab-separated
    (the reference's primary fixture format, ``timeseries.py:183-186``)."""
    return read_orange_csv(spark, path, sep="\t")


def _xlsx_rows(path: str):
    """Minimal ``.xlsx`` cell grid reader — stdlib only (an xlsx file is a
    zip of XML parts), covering the cell types Orange sheets use: shared
    strings (``t="s"``), inline strings (``t="str"``/``t="inlineStr"``),
    and numbers.  Returns a list of string lists, rows padded to equal
    width.  No style/date-serial decoding: timestamp columns should hold
    ISO text (the 3-row-header type row drives the cast downstream,
    exactly as for CSV)."""
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or ""
                                      for t in si.iter(
                                          "{%s}t" % ns["m"])))
        sheet = next(n for n in z.namelist()
                     if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))
        root = ET.fromstring(z.read(sheet))

    def col_idx(ref):
        i = 0
        for ch in ref:
            if ch.isdigit():
                break
            i = i * 26 + (ord(ch) - 64)
        return i - 1

    rows = []
    for row in root.iter("{%s}row" % ns["m"]):
        vals = {}
        for c in row.findall("m:c", ns):
            idx = col_idx(c.get("r", ""))
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                text = "".join(t.text or "" for t in c.iter(
                    "{%s}t" % ns["m"]))
            else:
                v = c.find("m:v", ns)
                text = v.text if v is not None and v.text else ""
                if ctype == "s" and text:
                    text = shared[int(text)]
            vals[idx] = text
        width = max(vals) + 1 if vals else 0
        rows.append([vals.get(i, "") for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def read_orange_xlsx(spark: SparkSession, path: str):
    """Orange ``.xlsx`` dialect: the same 3-row header (names / type codes
    / roles) in the first worksheet.  The grid is parsed driver-side
    (Orange sheets are small, hand-authored files — the reference also
    loads them fully in memory via its FileFormat readers); type casting
    and role mapping reuse the CSV logic by round-tripping through a
    temporary in-memory DataFrame."""
    rows = _xlsx_rows(path)
    if len(rows) < 3:
        raise ValueError(f"{path}: expected the Orange 3-row header")
    names, types, roles_row = rows[0], rows[1], rows[2]
    df = spark.createDataFrame(
        [tuple(r) for r in rows[3:]] or [tuple([""] * len(names))],
        schema=", ".join(f"`{n}` string" for n in names))
    if not rows[3:]:
        df = df.limit(0)
    return _apply_orange_header(df, names, types, roles_row)


def read_orange_file(spark: SparkSession, path: str):
    """``Timeseries.from_file`` analog: dispatch Orange's file dialects
    by extension (the reference delegates to Orange's FileFormat readers,
    ``timeseries.py:183-186``)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".tab", ".tsv"):
        return read_orange_tab(spark, path)
    if ext == ".csv":
        return read_orange_csv(spark, path)
    if ext == ".xlsx":
        return read_orange_xlsx(spark, path)
    raise ValueError(f"unsupported Orange file extension: {ext!r}")
