"""Driver-rows → JVM LocalRelation DataFrames.

``spark.createDataFrame(rows, ...)`` in classic PySpark parallelizes the
rows into a PYTHON-RDD-backed DataFrame: every job that scans it (a
write, a join build side, a count) re-runs N Python worker tasks that
unpickle the rows — measured ~0.7-1.0 s per job for a 16-row centroid
table on local[32], paid again on EVERY action (guide §4: the Python
boundary includes plan execution of driver-constructed tables).

:func:`local_df` instead renders the rows as ONE parsed SQL ``VALUES``
expression — a true JVM LocalRelation: scans cost no tasks at all,
broadcast builds read driver-local bytes, and a parquet write of the
same 16 rows drops ~0.7 s to ~0.3 s.  Literals are bit-exact
(``repr()`` emits the shortest exact round-trip decimal and the ``D``
suffix parses to the identical DOUBLE literal — the proven
``_dbl_array_lit`` technique), and the result is ``.to(schema)``-cast
so the schema (names, types, nullability) is byte-identical to the
``createDataFrame`` it replaces.  Anything the literal renderer cannot
express (exotic types, empty input) falls back to plain
``createDataFrame`` — same rows, just the slower execution shape.
"""

from __future__ import annotations

import math
from typing import List

__all__ = ["local_df"]


def _split_ddl(schema: str) -> List[str]:
    """Split a DDL field list on TOP-LEVEL commas (array<…> commas
    don't split)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _lit(v, t: str) -> str:
    t = t.strip().lower()
    if v is None:
        return f"CAST(NULL AS {t})"
    if t in ("int", "integer"):
        return f"CAST({int(v)} AS INT)"
    if t in ("bigint", "long"):
        return f"CAST({int(v)} AS BIGINT)"
    if t == "double":
        f = float(v)
        if math.isnan(f):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(f):
            return ("CAST('Infinity' AS DOUBLE)" if f > 0
                    else "CAST('-Infinity' AS DOUBLE)")
        # shortest exact round-trip decimal; 'D' parses to the
        # bit-identical DOUBLE literal (incl. subnormals)
        return repr(f) + "D"
    if t == "boolean":
        return "true" if v else "false"
    if t == "string":
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if t.startswith("array<") and t.endswith(">"):
        et = t[6:-1]
        return "array(" + ",".join(_lit(x, et) for x in v) + ")"
    raise ValueError(f"local_df: no literal renderer for type {t!r}")


def local_df(spark, rows, schema: str):
    """``rows`` (sequences, positional) + DDL ``schema`` as a JVM
    LocalRelation DataFrame — same rows, names, types and nullability
    as ``spark.createDataFrame(rows, schema)``, without the
    Python-RDD execution tax.  Falls back to ``createDataFrame`` for
    empty input or types outside the literal set."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        fields = [f.strip().rsplit(None, 1) for f in _split_ddl(schema)]
        names = [n for n, _t in fields]
        vals = ",".join(
            "(" + ",".join(_lit(r[i], t)
                           for i, (_n, t) in enumerate(fields)) + ")"
            for r in rows)
        # nullif(col, NULL) evaluates to col but relaxes the inferred
        # non-null to nullable, so the schema (names, types,
        # nullability) is byte-identical to createDataFrame's and
        # downstream schema checks / parquet footers keep their shape;
        # the optimizer folds it back into a LocalRelation
        # array literals additionally infer containsNull=false; the
        # identity CAST to the DDL type restores element nullability
        cols = ",".join(
            (f"nullif(CAST(col{i + 1} AS {t}), NULL) AS `{n}`"
             if t.strip().lower().startswith("array<")
             else f"nullif(col{i + 1}, NULL) AS `{n}`")
            for i, (n, t) in enumerate(fields))
        df = spark.sql(f"SELECT {cols} FROM VALUES {vals}")
        assert len(df.columns) == len(names)
        return df
    except Exception:
        return spark.createDataFrame(rows, schema)
