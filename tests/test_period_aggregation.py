"""Calendar period-key goldens ported from the reference's 11-case table
(``widgets/tests/test_owmovingtransform.py:535-640``): same 10-row series
forming groups of 4/2/3/1, same expected counts [4,2,3,1] and means
[4.5, 1.5, 14, NaN], per period key."""

import datetime as dt

import pytest

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.operators.moving_transform import (
    period_aggregation,
)

from conftest import approx_rows

NAN = float("nan")
X = [3, 4, 5, 6, 1, 2, NAN, 13, 15, NAN]


def _parse(s: str) -> dt.datetime:
    # time-only strings default to 1970-01-01 (Orange TimeVariable semantics)
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M",
                "%Y-%m-%d", "%H:%M:%S.%f", "%H:%M:%S", "%H:%M"):
        try:
            d = dt.datetime.strptime(s, fmt)
            if fmt.startswith("%H"):
                d = d.replace(year=1970, month=1, day=1)
            return d
        except ValueError:
            continue
    raise ValueError(s)


CASES = [
    ("Years",
     ["1971-01-01", "1971-01-26", "1971-06-05", "1971-12-31T23:59:59",
      "1972-01-01", "1972-12-31", "1974-05-02", "1974-02-04", "1974-07-03",
      "1989-07-31"],
     [_parse(p) for p in ["1971-01-01", "1972-01-01", "1974-01-01",
                          "1989-01-01"]]),
    ("Months",
     ["1998-01-01", "1998-01-26", "1998-01-27", "1998-01-28",
      "1998-08-01", "1998-08-31", "1999-05-02", "1999-05-04", "1999-05-10",
      "2000-07-31"],
     [_parse(p) for p in ["1998-01-01", "1998-08-01", "1999-05-01",
                          "2000-07-01"]]),
    ("Days",
     ["1998-01-01T06:18:00", "1998-01-01T09:12:13", "1998-01-01T09:44:12",
      "1998-01-01T23:59:59", "1998-01-02T00:00:00", "1998-01-02T15:12:11",
      "1999-05-02T12:15:17", "1999-05-02T12:12:12", "1999-05-02T06:01:02",
      "2000-07-31T00:00:00"],
     [_parse(p) for p in ["1998-01-01", "1998-01-02", "1999-05-02",
                          "2000-07-31"]]),
    ("Hours",
     ["1998-01-01T06:18:00", "1998-01-01T06:12:13", "1998-01-01T06:44:12",
      "1998-01-01T06:59:59", "1998-01-01T07:00:00", "1998-01-01T07:12:11",
      "1999-05-02T07:15:17", "1999-05-02T07:12:12", "1999-05-02T07:01:02",
      "2000-07-31T00:00:00"],
     [_parse(p) for p in ["1998-01-01T06:00:00", "1998-01-01T07:00:00",
                          "1999-05-02T07:00:00", "2000-07-31T00:00:00"]]),
    ("Minutes",
     ["1998-01-01T06:18:00", "1998-01-01T06:18:13", "1998-01-01T06:18:12",
      "1998-01-01T06:18:59", "1998-01-01T06:19:00", "1998-01-01T06:19:11",
      "1999-05-02T07:21:17", "1999-05-02T07:21:12", "1999-05-02T07:21:02",
      "2000-07-31T00:00:00"],
     [_parse(p) for p in ["1998-01-01T06:18:00", "1998-01-01T06:19:00",
                          "1999-05-02T07:21:00", "2000-07-31T00:00:00"]]),
    ("Seconds",
     ["06:18:58.12", "06:18:58.14", "06:18:58.23", "06:18:58.99",
      "06:18:59", "06:18:59.02", "06:19:00", "06:19:00.4", "06:19:00.4",
      "09:00:00"],
     [_parse(p) for p in ["06:18:58", "06:18:59", "06:19:00", "09:00:00"]]),
    ("Month of year",
     ["1972-04-02", "1989-04-11", "1972-04-02", "1972-04-30",
      "1972-05-01", "1921-05-02", "1931-09-01", "1931-09-30", "1938-09-12",
      "2000-12-31"],
     [4, 5, 9, 12]),
    ("Day of year",
     ["1970-01-05", "1989-01-05", "1970-01-05", "1901-01-05",
      "1972-01-06", "1973-01-06", "1931-03-02", "1932-03-01", "1938-03-02",
      "2000-05-01"],
     [5, 6, 61, 122]),
    ("Day of month",
     ["1970-01-05", "1989-03-05", "1970-06-05", "1901-12-05",
      "1972-01-06", "1973-10-06", "1931-03-12", "1932-03-12", "1938-04-12",
      "2000-05-31"],
     [5, 6, 12, 31]),
    ("Day of week",
     ["2022-06-07", "2022-05-24", "2018-02-20", "2022-06-07",
      "2018-09-06", "2016-02-11", "2016-02-12", "2016-02-19", "2022-06-10",
      "2000-06-11"],
     [1, 3, 4, 6]),
    ("Hour of day",
     ["2022-06-07T03:12:14", "03:16", "03:50", "03:59",
      "2018-09-06T05:12:12", "2016-02-11T05:11:00", "2016-02-12T12:15:17",
      "2016-02-19T12:34:12", "2022-06-10T12:00:00", "2000-06-11T18:22:12"],
     [3, 5, 12, 18]),
]


def _frame(spark, dates):
    rows = [(_parse(d), None if x != x else float(x)) for d, x in zip(dates, X)]
    df = spark.createDataFrame(rows, "t timestamp, x double")
    return TimeSeriesFrame(df, time_col="t")


@pytest.mark.parametrize("period,dates,keys", CASES, ids=[c[0] for c in CASES])
def test_period_goldens(spark, period, dates, keys):
    tsf = _frame(spark, dates)
    out = period_aggregation(tsf, period, [("x", "mean")]).df.collect()
    got_keys = [r[0] for r in out]
    assert got_keys == keys
    approx_rows([r["Instance count"] for r in out], [4, 2, 3, 1])
    approx_rows([r["x (mean)"] for r in out], [4.5, 1.5, 14, NAN])


def test_period_names(spark):
    period, dates, _ = CASES[6]  # Month of year
    tsf = _frame(spark, dates)
    out = period_aggregation(tsf, period, [("x", "mean")],
                             use_names=True).df.collect()
    got = {r[0]: r["Instance count"] for r in out}
    assert got == {"April": 4.0, "May": 2.0, "September": 3.0,
                   "December": 1.0}

    period, dates, _ = CASES[9]  # Day of week
    tsf = _frame(spark, dates)
    out = period_aggregation(tsf, period, [("x", "mean")],
                             use_names=True).df.collect()
    # ordered by the (string) key — check as a set + count pairing instead
    got = {r[0]: r["Instance count"] for r in out}
    assert got == {"Tuesday": 4.0, "Thursday": 2.0, "Friday": 3.0,
                   "Sunday": 1.0}


def test_inapplicable_agg_rejected(spark):
    tsf = _frame(spark, CASES[0][1])
    with pytest.raises(ValueError, match="not applicable"):
        period_aggregation(tsf, "Years", [("x", "cumsum")])
