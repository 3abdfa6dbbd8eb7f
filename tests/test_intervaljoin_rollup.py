"""Bucketed interval join and grouping-sets calendar rollup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.operators.intervaljoin import interval_join
from orange3_timeseries_spark.operators.rollup import calendar_rollup


def _ts(s):
    return dt.datetime(2024, 3, 1, 0, 0, 0) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("a", _ts(0), 10), ("a", _ts(100), 11), ("a", _ts(301), 12),
         ("b", _ts(50), 13)],
        "u string, ts timestamp, lid int")
    right = spark.createDataFrame(
        [("a", _ts(90), 1.0), ("a", _ts(400), 2.0), ("b", _ts(500), 3.0)],
        "u string, ts timestamp, v double")
    return left, right


def test_interval_join_matches_naive(sides, spark):
    left, right = sides
    out = interval_join(left, right, "ts", ["u"], 120.0)
    got = {(r["lid"], r["r_v"]) for r in out.collect()}
    # naive reference: |dt| <= 120
    naive = set()
    for lr in left.collect():
        for rr in right.collect():
            if lr["u"] == rr["u"] and \
               abs((lr["ts"] - rr["ts"]).total_seconds()) <= 120.0:
                naive.add((lr["lid"], rr["v"]))
    assert got == naive


def test_interval_join_boundary_inclusive(spark):
    left = spark.createDataFrame([("k", _ts(0), 1)],
                                 "u string, ts timestamp, lid int")
    right = spark.createDataFrame([("k", _ts(120), 5.0),
                                   ("k", _ts(121), 6.0)],
                                  "u string, ts timestamp, v double")
    got = {r["r_v"] for r in
           interval_join(left, right, "ts", ["u"], 120.0).collect()}
    assert got == {5.0}  # exactly-at-window matches; one past doesn't


def test_interval_join_dt_sign(sides):
    left, right = sides
    out = interval_join(left, right, "ts", ["u"], 120.0)
    for r in out.collect():
        assert r["dt_seconds"] == pytest.approx(
            (r["ts"] - r["r_ts"]).total_seconds())


def test_calendar_rollup_levels(spark):
    rows = [(dt.datetime(2024, 3, 1, h, m, 0), float(h * 60 + m))
            for h in (0, 1) for m in (0, 30)]
    rows.append((dt.datetime(2024, 4, 2, 5, 0, 0), 999.0))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    tsf = TimeSeriesFrame(df, time_col="ts")
    out = calendar_rollup(tsf, [("v", "sum"), ("v", "mean")],
                          levels=("hour", "day", "month"))
    got = {(r["level"], r["bucket"]): (r["n"], r["v_sum"])
           for r in out.collect()}
    assert got[("hour", dt.datetime(2024, 3, 1, 0))] == (2, 30.0)
    assert got[("hour", dt.datetime(2024, 3, 1, 1))] == (2, 150.0)
    assert got[("day", dt.datetime(2024, 3, 1))] == (4, 180.0)
    assert got[("month", dt.datetime(2024, 3, 1))] == (4, 180.0)
    assert got[("month", dt.datetime(2024, 4, 1))] == (1, 999.0)
    assert got[("hour", dt.datetime(2024, 4, 2, 5))] == (1, 999.0)
    # exactly levels x buckets rows, no (null, null) grand-total row
    assert all(lvl in ("hour", "day", "month") for lvl, _ in got)
    assert len(got) == 3 + 2 + 2


def test_calendar_rollup_per_series(spark):
    rows = [("a", dt.datetime(2024, 3, 1, 0, 5), 1.0),
            ("a", dt.datetime(2024, 3, 1, 0, 6), 2.0),
            ("b", dt.datetime(2024, 3, 1, 0, 7), 10.0)]
    df = spark.createDataFrame(rows, "u string, ts timestamp, v double")
    tsf = TimeSeriesFrame(df, time_col="ts", series_cols=["u"])
    out = calendar_rollup(tsf, [("v", "sum")], levels=("hour", "day"))
    got = {(r["u"], r["level"]): r["v_sum"] for r in out.collect()}
    assert got[("a", "hour")] == 3.0
    assert got[("b", "hour")] == 10.0
    assert got[("a", "day")] == 3.0
