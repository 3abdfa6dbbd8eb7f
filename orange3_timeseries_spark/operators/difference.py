"""Lag / difference operators (``owdifference.py:153-201``).

Four operations per selected numeric column, appended to the source frame
with the reference's naming contract ``"Δx"``, ``"ΔΔx"``, ``"qx"``, ``"%x"``
(+ ``":k"`` suffix for shift != 1, ``owdifference.py:157-158,192-194``):

- ``diff``  — first-order difference at shift k: ``x - lag(x, k)``; the
  leading k rows are null, or the original values with
  ``assume_zero_before`` (``:169-172``).
- ``diff2`` — second-order difference (shift is always 1, ``:102``):
  ``x - 2*lag(x,1) + lag(x,2)``; zero-before head: row2 = x - 2*lag(x,1),
  row1 = x (``:173-177``).
- ``quot``  — change quotient ``x / lag(x, k)``; division by zero -> null
  (``:179-186``).
- ``perc``  — percent change ``(quot - 1) * 100`` (``:184-187``).

``invert_direction`` computes against the *following* rows (the reference
reverses the array, applies, reverses back, ``:164-165,188-189`` — on an
explicitly ordered frame that is exactly ``lead`` instead of ``lag``).
``assume_zero_before`` is only honored without inversion, matching the GUI
gate (``owdifference.py:104-107``).

All four are single window expressions — one shuffle on ``series_cols``
(zero when pre-partitioned), fully codegen'd, no UDFs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import ROW_IDX, TimeSeriesFrame

DIFF, DIFF2, QUOT, PERC = "diff", "diff2", "quot", "perc"

_PREFIX = {DIFF: "Δ", DIFF2: "ΔΔ", QUOT: "q", PERC: "%"}


def diff_name(col: str, op: str = DIFF, shift: int = 1) -> str:
    """The reference's output naming (``owdifference.py:157-158,192-194``)."""
    suffix = f":{shift}" if shift != 1 and op != DIFF2 else ""
    return f"{_PREFIX[op]}{col}{suffix}"


def difference(tsf: TimeSeriesFrame, cols: Sequence[str],
               op: str = DIFF, shift: int = 1,
               invert_direction: bool = False,
               assume_zero_before: bool = False,
               names: Optional[dict] = None) -> TimeSeriesFrame:
    """Append difference columns for ``cols`` to the frame."""
    if op not in _PREFIX:
        raise ValueError(f"unknown difference op {op!r}")
    if op == DIFF2:
        shift = 1
    names = names or {}
    had_idx = ROW_IDX in tsf.df.columns
    tsf = tsf.with_row_index()
    w = tsf.ordered_window()
    rn = F.col(ROW_IDX)

    def shifted(c, k):
        return F.lead(c, k).over(w) if invert_direction else F.lag(c, k).over(w)

    out_cols = []
    for col in cols:
        c = F.col(col).cast("double")
        c = F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)
        azb = assume_zero_before and not invert_direction
        if op == DIFF:
            base = c - shifted(c, shift)
            if azb:
                expr = F.when(rn <= shift, c).otherwise(base)
            else:
                # head rows (no full lag/lead available) stay null: lag
                # returns null there and null arithmetic propagates.
                expr = base
        elif op == DIFF2:
            base = c - 2 * shifted(c, 1) + shifted(c, 2)
            if azb:
                expr = (F.when(rn == 1, c)
                         .when(rn == 2, c - 2 * shifted(c, 1))
                         .otherwise(base))
            else:
                expr = base
        else:
            prev = shifted(c, shift)
            quot = F.when(prev != 0, c / prev)  # /0 and null -> null
            expr = quot if op == QUOT else (quot - 1) * 100
        out_name = names.get(col, diff_name(col, op, shift))
        out_cols.append(expr.alias(out_name))

    df = tsf.df.select("*", *out_cols)
    if not had_idx:
        df = df.drop(ROW_IDX)
    return tsf._with_df(df)
