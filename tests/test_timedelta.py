"""TimeDelta inference + calendar stepping tests (fixtures mirror the
reference's edge-case CSVs, FIXTURES.md F5, and ``tests/test_timeseries.py``)."""

import datetime as dt

from orange3_timeseries_spark.timedelta import TimeDelta, add_time, infer_delta


def test_monthly_delta_symbolic():
    # monthly gaps of 28..31 days classify as (1,'month') (timeseries.py:18-24)
    gaps = [28 * 86400, 30 * 86400, 31 * 86400]
    d = TimeDelta.from_gaps(gaps)
    assert d.deltas == [(1, "month")]
    assert d.min == (1, "month")
    assert d.gcd == (1, "month")
    assert d.backwards_compatible_delta == (1, "month")
    assert not d.is_equispaced


def test_yearly_delta_symbolic():
    d = TimeDelta.from_gaps([365 * 86400, 366 * 86400])
    assert d.deltas == [(1, "year")]
    assert d.backwards_compatible_delta == (1, "year")


def test_daily_delta_numeric():
    d = TimeDelta.from_gaps([86400.0])
    assert d.is_equispaced and d.time_interval == 86400
    assert d.deltas == [86400.0]
    assert d.gcd == 86400.0
    assert d.backwards_compatible_delta == (1, "day")


def test_second_delta():
    d = TimeDelta.from_gaps([1.0])
    assert d.is_equispaced and d.time_interval == 1.0
    assert d.backwards_compatible_delta == 1.0


def test_zero_gaps_removed():
    # duplicate timestamps produce a zero gap, discarded (timeseries.py:39-43)
    d = TimeDelta.from_gaps([0.0, 3600.0])
    assert d.is_equispaced and d.time_interval == 3600.0


def test_no_usable_delta():
    # all rows on the same timestamp -> deltas == [] (owtimeslice.py:413-414)
    d = TimeDelta.from_gaps([0.0])
    assert d.deltas == [] and d.min is None


def test_mixed_gcd_uses_day():
    # mix of numeric + symbolic -> gcd of numerics and one day
    # (timeseries.py:69-72)
    d = TimeDelta.from_gaps([86400.0 * 2, 30 * 86400.0])
    assert (1, "month") in d.deltas and 172800.0 in d.deltas
    assert d.gcd == 86400.0


def test_numeric_gcd():
    d = TimeDelta.from_gaps([7200.0, 10800.0])
    assert d.gcd == 3600.0


def test_add_time_numeric():
    t0 = dt.datetime(2000, 1, 1)
    assert add_time(t0, 3600.0, 2) == dt.datetime(2000, 1, 1, 2)


def test_add_time_month_clamps():
    # month stepping clamps day to target month length (util.py:29-41)
    t0 = dt.datetime(2000, 1, 31)
    assert add_time(t0, (1, "month"), 1) == dt.datetime(2000, 2, 29)
    assert add_time(t0, (1, "month"), 13) == dt.datetime(2001, 2, 28)
    assert add_time(dt.datetime(2000, 3, 15), (1, "month"), -1) == \
        dt.datetime(2000, 2, 15)


def test_add_time_year():
    assert add_time(dt.datetime(2000, 5, 5), (1, "year"), 3) == \
        dt.datetime(2003, 5, 5)


def test_infer_delta_spark(spark):
    rows = [(dt.datetime(1949, 1, 1) + dt.timedelta(days=i),) for i in range(10)]
    df = spark.createDataFrame(rows, "t timestamp")
    d = infer_delta(df, "t")
    assert d.is_equispaced and d.time_interval == 86400.0
    assert d.backwards_compatible_delta == (1, "day")


def test_infer_delta_monthly_spark(spark):
    rows = []
    for y in (1949, 1950):
        for m in range(1, 13):
            rows.append((dt.datetime(y, m, 1),))
    df = spark.createDataFrame(rows, "t timestamp")
    d = infer_delta(df, "t")
    assert d.deltas == [(1, "month")]


def test_infer_delta_unsorted_and_duplicates(spark):
    # unsorted input with one duplicated month (F5 unsortedts/multipleonsamedt)
    months = [dt.datetime(1949, m, 1) for m in (3, 1, 2, 2, 5, 4)]
    df = spark.createDataFrame([(m,) for m in months], "t timestamp")
    d = infer_delta(df, "t")
    assert d.deltas == [(1, "month")]
