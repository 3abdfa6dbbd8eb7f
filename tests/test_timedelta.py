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


# --------------------------------------------------- pre-1970 (negative epoch)
# Verbatim ports of the reference's negative-epoch construction cases
# (tests/test_timeseries.py:39-103): 1890 predates the epoch AND 1900
# was not a leap year while 2000 was, so these pin both the epoch sign
# handling and the Julian/Gregorian leap logic on either side of 1970.

def test_reference_epoch_goldens_python():
    # reference test_timestamp_windows hardcoded UTC truth values
    years = [1890, 1991, 2004]
    expected = [-2514083978.999995, 673125621.000005, 1083439221.000005]
    for y, want in zip(years, expected):
        d = dt.datetime(y, 5, 1, 19, 20, 21, 5, tzinfo=dt.timezone.utc)
        assert d.timestamp() == want


def test_reference_fromtimestamp_golden():
    # reference test_fromtimestamp: -1234567890 s -> 1930-11-18 00:28:30Z
    got = dt.datetime.fromtimestamp(-1234567890, tz=dt.timezone.utc)
    assert got == dt.datetime(1930, 11, 18, 0, 28, 30,
                              tzinfo=dt.timezone.utc)


def test_reference_epoch_goldens_spark(spark):
    """The same three instants through Spark: a pre-1970 timestamp must
    round-trip to the identical negative epoch micros (UTC session)."""
    from pyspark.sql import functions as F

    rows = [(dt.datetime(y, 5, 1, 19, 20, 21, 5),)
            for y in (1890, 1991, 2004)]
    df = spark.createDataFrame(rows, "t timestamp")
    got = [r[0] for r in
           df.select(F.unix_micros("t")).orderBy("unix_micros(t)").collect()]
    assert got == [-2514083978999995, 673125621000005, 1083439221000005]


def test_add_time_pre1970_month_clamp():
    # month stepping across a pre-1970 leap boundary: 1896 IS a leap
    # year (divisible by 4), 1900 is NOT (century rule)
    assert add_time(dt.datetime(1896, 1, 31), (1, "month"), 1) \
        == dt.datetime(1896, 2, 29)
    assert add_time(dt.datetime(1900, 1, 31), (1, "month"), 1) \
        == dt.datetime(1900, 2, 28)
    # stepping BACKWARD over the epoch boundary
    assert add_time(dt.datetime(1970, 1, 15), (1, "month"), -1) \
        == dt.datetime(1969, 12, 15)
    assert add_time(dt.datetime(1930, 11, 18, 0, 28, 30), (1, "year"), -40) \
        == dt.datetime(1890, 11, 18, 0, 28, 30)


def test_infer_delta_pre1970_monthly(spark):
    """Monthly inference on an 1890s series — symbolic month
    classification must not depend on the epoch sign."""
    rows = [(dt.datetime(1890 + (m // 12), (m % 12) + 1, 1),)
            for m in range(24)]
    df = spark.createDataFrame(rows, "t timestamp")
    d = infer_delta(df, "t")
    assert d.backwards_compatible_delta == (1, "month")


def test_from_sequence_pre1970_start(spark):
    """from_sequence with an 1890 start synthesizes correct pre-1970
    calendar months (reference make_timeseries_from_sequence semantics
    at any epoch sign)."""
    from pyspark.sql import functions as F

    from orange3_timeseries_spark.frame import TimeSeriesFrame

    base = spark.range(4).select(F.col("id").alias("v"))
    tsf = TimeSeriesFrame.from_sequence(
        base, (1, "month"), start=dt.datetime(1890, 1, 31),
        order_col="v")
    got = [r["T"] for r in tsf.df.orderBy("v").collect()]
    assert got == [dt.datetime(1890, 1, 31), dt.datetime(1890, 2, 28),
                   dt.datetime(1890, 3, 31), dt.datetime(1890, 4, 30)]
