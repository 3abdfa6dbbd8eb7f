"""Mergeable incremental rollup state tables."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.incremental import (
    merge_states,
    rollup_state,
    serve_rollup,
)

SCHEMA = "sid string, ts timestamp, v double"


def _df(spark, rows):
    base = dt.datetime(2024, 3, 1)
    return spark.createDataFrame(
        [(s, base + dt.timedelta(hours=h), float(v))
         for s, h, v in rows], SCHEMA)


def _served(df):
    return {(r["sid"], r["day"]):
            (r["n_events"], r["total"], r["vmin"], r["vmax"], r["mean"])
            for r in df.collect()}


class TestIncrementalRollup:
    def test_split_merge_equals_full(self, spark):
        rows = [("a", h, 1.5 * h + 1) for h in range(96)] \
            + [("b", h * 7, 10.0 + h) for h in range(20)]
        full = _df(spark, rows)
        left = full.where(F.col("ts") < "2024-03-02")
        right = full.where(F.col("ts") >= "2024-03-02")
        merged = serve_rollup(merge_states(
            rollup_state(left, "ts", "v", ["sid"]),
            rollup_state(right, "ts", "v", ["sid"])))
        direct = serve_rollup(rollup_state(full, "ts", "v", ["sid"]))
        assert _served(merged) == _served(direct)

    def test_three_way_merge_any_order(self, spark):
        rows = [("a", h, (h % 13) + 0.25) for h in range(120)]
        full = _df(spark, rows)
        parts = [full.where((F.col("ts") >= f"2024-03-0{i+1}")
                            & (F.col("ts") < f"2024-03-0{i+2}"))
                 for i in range(3)]
        states = [rollup_state(p, "ts", "v", ["sid"]) for p in parts]
        a = serve_rollup(merge_states(states[0], states[1], states[2]))
        b = serve_rollup(merge_states(states[2], states[0], states[1]))
        assert _served(a) == _served(b)

    def test_values_correct(self, spark):
        rows = [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 4.0),
                ("a", 25, 10.0)]
        out = _served(serve_rollup(rollup_state(
            _df(spark, rows), "ts", "v", ["sid"])))
        d0 = (dt.datetime(2024, 3, 1) - dt.datetime(1970, 1, 1)).days
        assert out[("a", d0)] == (3, 7.0, 1.0, 4.0,
                                  pytest.approx(7.0 / 3))
        assert out[("a", d0 + 1)] == (1, 10.0, 10.0, 10.0, 10.0)

    def test_parquet_roundtrip_state(self, spark, tmp_path):
        rows = [("a", h, h * 0.5) for h in range(48)]
        st = rollup_state(_df(spark, rows), "ts", "v", ["sid"])
        p = str(tmp_path / "state")
        st.write.partitionBy("day").parquet(p)
        back = spark.read.parquet(p).select(*st.columns)
        assert _served(serve_rollup(back)) == _served(serve_rollup(st))
