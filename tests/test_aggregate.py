"""Golden-vector tests for every registry kernel, ported from the
reference's ``test_aggregate.py:258-305`` (AggFuncsTest.test_sliding) and
the individual kernel tests — same inputs, same expected values, evaluated
through the engine's sliding/strided/block modes."""

import math

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.frame import TimeSeriesFrame
from orange3_timeseries_spark.operators.moving_transform import (
    DISCARD,
    KEEP_ALL,
    KEEP_COMPLETE,
    sequential_blocks,
    sliding_window,
)

from conftest import approx_rows

NAN = float("nan")

# the canonical golden input (``test_aggregate.py:259``)
X = [5, 2, 7, 8, 6, 4, 2, 3, NAN, -1, 0]

# expected sliding width-4 outputs (``test_aggregate.py:260-287``)
GOLDEN = {
    "mean": [22 / 4, 23 / 4, 25 / 4, 20 / 4, 15 / 4, 9 / 3, 4 / 3, 2 / 3],
    "sum": [22, 23, 25, 20, 15, 9, 4, 2],
    "product": [560, 672, 1344, 384, 144, 24, -6, 0],
    "min": [2, 2, 4, 2, 2, 2, -1, -1],
    "max": [8, 8, 8, 8, 6, 4, 3, 3],
    "span": [6, 6, 4, 6, 4, 2, 4, 4],
    "median": [6, 6.5, 6.5, 5, 3.5, 3, 2, 0],
    "std": [2.2912878, 2.2776084, 1.4790199, 2.236068, 1.4790199,
            0.8164966, 1.6996732, 1.6996732],
    "var": [5.25, 5.1875, 2.1875, 5, 2.1875, 0.6666667, 2.8888889, 2.8888889],
    "lin. MA": [(4 * 8 + 3 * 7 + 2 * 2 + 1 * 5) / 10,
                (4 * 6 + 3 * 8 + 2 * 7 + 1 * 2) / 10,
                5.7, 4, 3.2,
                (3 * 3 + 2 * 2 + 1 * 4) / 6,
                (4 * -1 + 2 * 3 + 1 * 2) / 7,
                (3 * -1 + 1 * 3) / 4],
    "exp. MA": [6.4338235, 6.3198529, 5.5110294, 3.8088235, 3.1875,
                2.877551, 0.3248731, 0.0264317],
    "harmonic": [4.1328413, 4.2802548, 5.8434783, 3.84, 3.2, NAN, NAN, NAN],
    "geometric": [4.8645986, 5.0914598, 6.0548002, 4.4267277, 3.4641016,
                  NAN, NAN, NAN],
    "non-zero": [4, 4, 4, 4, 4, 3, 3, 2],
    "defined": [4, 4, 4, 4, 4, 3, 3, 3],
    "cumsum": [22, 28, 32, 34, 37, 37, 36, 36],
    "cumprod": [560, 3360, 13440, 26880, 80640, 80640, -80640, 0],
}


def make_frame(spark, xs):
    df = spark.createDataFrame(
        [(i + 1, None if (isinstance(v, float) and math.isnan(v)) else float(v))
         for i, v in enumerate(xs)],
        "idx int, x double")
    return TimeSeriesFrame(df.withColumn("__row_idx__", F.col("idx")))


def sliding_vals(spark, xs, agg, width, keep=DISCARD, shift=1):
    tsf = make_frame(spark, xs)
    out = sliding_window(tsf, [("x", agg)], width, keep=keep, shift=shift)
    name = f"x ({agg})"
    if keep == DISCARD:
        return [r[name] for r in out.df.collect()]
    return [r[name] for r in out.df.orderBy("idx").collect()]


@pytest.mark.parametrize("agg", sorted(GOLDEN))
def test_sliding_golden(spark, agg):
    approx_rows(sliding_vals(spark, X, agg, 4, keep=KEEP_COMPLETE),
                GOLDEN[agg], tol=1e-6)


@pytest.mark.parametrize("agg", [a for a in sorted(GOLDEN)
                                 if not a.endswith(" MA")])
def test_strided_golden(spark, agg):
    # shift=2 and shift=4 keep every 2nd/4th complete window
    # (``test_aggregate.py:293-295``)
    approx_rows(sliding_vals(spark, X, agg, 4, keep=KEEP_COMPLETE, shift=2),
                GOLDEN[agg][::2], tol=1e-6)
    approx_rows(sliding_vals(spark, X, agg, 4, keep=KEEP_COMPLETE, shift=4),
                GOLDEN[agg][::4], tol=1e-6)


@pytest.mark.parametrize("agg", [a for a in sorted(GOLDEN)
                                 if a not in ("lin. MA", "exp. MA",
                                              "cumsum", "cumprod")])
def test_block_consistency(spark, agg):
    # tumbling blocks of 4 == strided sliding at shift=width
    # (``test_aggregate.py:296-300``); trailing partial block dropped.
    tsf = make_frame(spark, X)
    out = sequential_blocks(tsf, [("x", agg)], 4, keep=DISCARD)
    vals = [r[f"x ({agg})"] for r in out.df.collect()]
    approx_rows(vals, GOLDEN[agg][::4], tol=1e-6)


def test_keep_all_padding(spark):
    # KeepAll pads the first width-1 aggregates with NaN
    # (``owmovingtransform.py:402-404``)
    vals = sliding_vals(spark, X, "mean", 4, keep=KEEP_ALL)
    approx_rows(vals[:3], [NAN, NAN, NAN])
    approx_rows(vals[3:], GOLDEN["mean"], tol=1e-6)


def test_keep_all_cumulative_unpadded(spark):
    # cumulative kernels switch to full-prefix variant under KeepAll
    # (``owmovingtransform.py:413-414``)
    vals = sliding_vals(spark, X, "cumsum", 4, keep=KEEP_ALL)
    approx_rows(vals, [5, 7, 14, 22, 28, 32, 34, 37, 37, 36, 36], tol=1e-9)


def test_moving_sum_goldens(spark):
    # ``test_aggregate.py:14-38``
    a = [3, 8, 6, 4, 2, 4, 6, 8, 1, 2, 4]
    approx_rows(sliding_vals(spark, a, "sum", 3, KEEP_COMPLETE),
                [17, 18, 12, 10, 12, 18, 15, 11, 7])
    approx_rows(sliding_vals(spark, a, "sum", 7, KEEP_COMPLETE),
                [33, 38, 31, 27, 27])
    approx_rows(sliding_vals(spark, a, "sum", 7, KEEP_COMPLETE, shift=2),
                [33, 31, 27])
    approx_rows(sliding_vals(spark, a, "sum", 3, KEEP_COMPLETE, shift=3),
                [17, 10, 15])
    approx_rows(sliding_vals(spark, a, "sum", 10, KEEP_COMPLETE, shift=5),
                [44])
    approx_rows(sliding_vals(spark, a, "sum", 15, KEEP_COMPLETE), [])
    approx_rows(sliding_vals(spark, [1, 2, NAN, 4], "sum", 3, KEEP_COMPLETE),
                [3, 6])


def test_mode_goldens(spark):
    # ``test_aggregate.py:218-224`` incl. all-NaN window -> NaN
    approx_rows(sliding_vals(spark, [3, 3, 2, 2], "mode", 3, KEEP_COMPLETE),
                [3, 2])
    approx_rows(
        sliding_vals(spark, [3, 3, 2, 2, NAN, 2, NAN, NAN, NAN],
                     "mode", 3, KEEP_COMPLETE),
        [3, 2, 2, 2, 2, 2, NAN])
    # mode golden from AggFuncsTest (``test_aggregate.py:289-305``)
    x = [2, 2, 1, 2, 0, 1, 1, 1, 0, 2, 0, 0]
    approx_rows(sliding_vals(spark, x, "mode", 4, KEEP_COMPLETE),
                [2, 2, 1, 1, 1, 1, 1, 0, 0])


def test_harmonic_zero_golden(spark):
    # zeros -> 0, trailing NaNs poison (``test_aggregate.py:225-229``)
    a = [3, 3, 2, 2, 2, 0, 0, 0, 1, 2, 3, NAN, NAN, NAN]
    approx_rows(
        sliding_vals(spark, a, "harmonic", 3, KEEP_COMPLETE),
        [2.5714286, 2.25, 2, 0, 0, 0, 0, 0, 1.63636363, NAN, NAN, NAN],
        tol=1e-6)


def test_span_nan_golden(spark):
    # ``test_aggregate.py:149-160``
    a = [3, 8, NAN, 4, 2, NAN, 6, 8]
    approx_rows(sliding_vals(spark, a, "span", 3, KEEP_COMPLETE),
                [5, 4, 2, 2, 4, 2])


def test_linear_ma_nan_goldens(spark):
    # ``test_aggregate.py:231-251``
    approx_rows(sliding_vals(spark, [1, 2, 3, NAN, 5], "lin. MA", 3,
                             KEEP_COMPLETE),
                [(3 * 3 + 2 * 2 + 1 * 1) / 6, (3 * 2 + 2 * 1) / 3,
                 (5 * 3 + 3 * 1) / 4], tol=1e-6)
    approx_rows(sliding_vals(spark, [1, NAN, NAN, NAN, 5, 6], "lin. MA", 3,
                             KEEP_COMPLETE),
                [1, NAN, 5, (6 * 3 + 5 * 2) / 5], tol=1e-6)


def test_exp_ma_golden(spark):
    # ``test_aggregate.py:253-256``
    approx_rows(sliding_vals(spark, [1, 2, 3, 4, 5], "exp. MA", 3,
                             KEEP_COMPLETE),
                [2.4285714, 3.4285714, 4.4285714], tol=1e-6)


def test_block_representatives(spark):
    # keep first/middle/last of each block (``owmovingtransform.py:474-478``)
    tsf = make_frame(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    for keep, idxs in (("first", [1, 4, 7]), ("middle", [2, 5, 8]),
                       ("last", [3, 6, 9])):
        out = sequential_blocks(tsf, [("x", "mean")], 3, keep=keep)
        rows = out.df.orderBy("idx").collect()
        assert [r["idx"] for r in rows] == idxs
        approx_rows([r["x (mean)"] for r in rows], [2.0, 5.0, 8.0])


class TestRegistryExtension:
    def test_register_custom_aggregation(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.frame import TimeSeriesFrame
        from orange3_timeseries_spark.operators.aggregate import (
            AGG_OPTIONS,
            register_aggregation,
        )
        from orange3_timeseries_spark.operators.moving_transform import (
            KEEP_COMPLETE,
            period_aggregation,
            sliding_window,
        )

        key = "rms (test)"
        if key not in AGG_OPTIONS:
            register_aggregation(
                key, lambda c, ov, ctx: F.sqrt(ov(F.avg(c * c))))
        try:
            df = spark.createDataFrame(
                [(i, float(i % 4)) for i in range(8)], "t long, x double")
            tsf = TimeSeriesFrame(df, time_col=None).with_row_index(["t"])
            out = sliding_window(tsf, [("x", key)], 4, keep=KEEP_COMPLETE)
            vals = [r[f"x ({key})"] for r in
                    out.df.orderBy("t").collect()]
            import math
            exp = math.sqrt((0 + 1 + 4 + 9) / 4)
            assert vals[0] == pytest.approx(exp)
            # duplicate registration is rejected
            with pytest.raises(ValueError, match="already registered"):
                register_aggregation(key, lambda c, ov, ctx: ov(F.avg(c)))
        finally:
            AGG_OPTIONS.pop(key, None)
