"""Difference-operator goldens ported from the reference's
``widgets/tests/test_owdifference.py:69-369`` — same 4-row input, all four
ops, shifts 1..3 and beyond-length, invert direction, assume-zero-before."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.operators.difference import (
    DIFF,
    DIFF2,
    PERC,
    QUOT,
    difference,
    diff_name,
)

from conftest import approx_rows

NAN = float("nan")

# input table (``test_owdifference.py:14-30``): a, b, c continuous
A = [4, 1, 3, 7]
B = [5, -2, NAN, NAN]
C = [8, 0, 2, 1]


@pytest.fixture()
def tsf(spark):
    rows = [(i + 1, float(a), None if b != b else float(b), float(c))
            for i, (a, b, c) in enumerate(zip(A, B, C))]
    df = spark.createDataFrame(rows, "idx int, a double, b double, c double")
    return TimeSeriesFrame(df.withColumn("__row_idx__", F.col("idx")))


def run(tsf, op, shift=1, invert=False, azb=False):
    out = difference(tsf, ["a", "b", "c"], op=op, shift=shift,
                     invert_direction=invert, assume_zero_before=azb)
    rows = out.df.orderBy("idx").collect()
    return [[r[diff_name(c, op, shift)] for c in "abc"] for r in rows]


def check(got, exp):
    for g, e in zip(got, exp):
        approx_rows(g, e, tol=1e-9)


def test_diff_shift1(tsf):
    check(run(tsf, DIFF, 1),
          [[NAN, NAN, NAN], [-3, -7, -8], [2, NAN, 2], [4, NAN, -1]])
    check(run(tsf, DIFF, 1, azb=True),
          [[4, 5, 8], [-3, -7, -8], [2, NAN, 2], [4, NAN, -1]])
    check(run(tsf, DIFF, 1, invert=True),
          [[3, 7, 8], [-2, NAN, -2], [-4, NAN, 1], [NAN, NAN, NAN]])
    # assume_zero_before must be ignored with inversion
    check(run(tsf, DIFF, 1, invert=True, azb=True),
          [[3, 7, 8], [-2, NAN, -2], [-4, NAN, 1], [NAN, NAN, NAN]])


def test_diff_shift2_3(tsf):
    check(run(tsf, DIFF, 2),
          [[NAN] * 3, [NAN] * 3, [-1, NAN, -6], [6, NAN, 1]])
    check(run(tsf, DIFF, 2, azb=True),
          [[4, 5, 8], [1, -2, 0], [-1, NAN, -6], [6, NAN, 1]])
    check(run(tsf, DIFF, 2, invert=True),
          [[1, NAN, 6], [-6, NAN, -1], [NAN] * 3, [NAN] * 3])
    check(run(tsf, DIFF, 3),
          [[NAN] * 3, [NAN] * 3, [NAN] * 3, [3, NAN, -7]])
    check(run(tsf, DIFF, 3, azb=True),
          [[4, 5, 8], [1, -2, 0], [3, NAN, 2], [3, NAN, -7]])
    check(run(tsf, DIFF, 3, invert=True),
          [[-3, NAN, 7], [NAN] * 3, [NAN] * 3, [NAN] * 3])


def test_diff_shift_beyond_length(tsf):
    # ``test_owdifference.py:179-190``: shift >= n -> all NaN, except with
    # assume-zero-before (and no inversion) the original columns come back.
    for shift in (4, 5, 10):
        check(run(tsf, DIFF, shift),
              [[NAN] * 3] * 4)
        check(run(tsf, DIFF, shift, invert=True, azb=True),
              [[NAN] * 3] * 4)
        check(run(tsf, DIFF, shift, azb=True),
              [[4, 5, 8], [1, -2, 0], [3, NAN, 2], [7, NAN, 1]])


def test_diff2(tsf):
    check(run(tsf, DIFF2),
          [[NAN] * 3, [NAN] * 3, [5, NAN, 10], [2, NAN, -3]])
    check(run(tsf, DIFF2, azb=True),
          [[4, 5, 8], [-7, -12, -16], [5, NAN, 10], [2, NAN, -3]])
    check(run(tsf, DIFF2, invert=True),
          [[5, NAN, 10], [2, NAN, -3], [NAN] * 3, [NAN] * 3])
    check(run(tsf, DIFF2, invert=True, azb=True),
          [[5, NAN, 10], [2, NAN, -3], [NAN] * 3, [NAN] * 3])


def test_quotient(tsf):
    check(run(tsf, QUOT, 1),
          [[NAN] * 3, [1 / 4, -2 / 5, 0.0], [3, NAN, NAN], [7 / 3, NAN, 0.5]])
    check(run(tsf, QUOT, 1, invert=True),
          [[4, -5 / 2, NAN], [1 / 3, NAN, 0.0], [3 / 7, NAN, 2], [NAN] * 3])
    check(run(tsf, QUOT, 2),
          [[NAN] * 3, [NAN] * 3, [3 / 4, NAN, 1 / 4], [7, NAN, NAN]])
    check(run(tsf, QUOT, 3, invert=True),
          [[4 / 7, NAN, 8], [NAN] * 3, [NAN] * 3, [NAN] * 3])


def test_percent(tsf):
    check(run(tsf, PERC, 1),
          [[NAN] * 3, [-75, -140, -100], [200, NAN, NAN],
           [400 / 3, NAN, -50]])
    check(run(tsf, PERC, 2, invert=True),
          [[100 / 3, NAN, 300], [-600 / 7, NAN, -100], [NAN] * 3, [NAN] * 3])


def test_output_names(tsf):
    out = difference(tsf, ["a"], op=DIFF, shift=2)
    assert "Δa:2" in out.df.columns
    out = difference(tsf, ["a"], op=PERC, shift=1)
    assert "%a" in out.df.columns
    out = difference(tsf, ["a"], op=DIFF2)
    assert "ΔΔa" in out.df.columns
