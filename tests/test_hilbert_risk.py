"""Hilbert curve key and per-series risk metrics."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.partitioning import (
    hilbert_key,
    zorder_key,
)
from orange3_timeseries_spark.operators.risk import risk_metrics


def _ref_xy2d(order, x, y):
    """Textbook iterative xy2d (Wikipedia form) as the independent
    reference."""
    rx = ry = 0
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbertKey:
    def test_matches_reference_and_bijective(self, spark):
        pts = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {(r["x"], r["y"]): r["d"] for r in df.select(
            "x", "y", hilbert_key("x", "y", 3).alias("d")).collect()}
        assert len(set(got.values())) == 64
        for (x, y), d in got.items():
            assert d == _ref_xy2d(3, x, y), (x, y)

    def test_consecutive_keys_are_grid_neighbors(self, spark):
        pts = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select("x", "y",
                         hilbert_key("x", "y", 4).alias("d")) \
            .orderBy("d").collect()
        for a, b in zip(rows, rows[1:]):
            assert abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) == 1

    def test_locality_beats_zorder(self, spark):
        # mean Manhattan jump along the curve: Hilbert is always 1;
        # Morton takes diagonal leaps
        pts = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(pts, "x long, y long")
        h = df.select("x", "y", hilbert_key("x", "y", 5).alias("d")) \
            .orderBy("d").collect()
        z = df.select("x", "y", zorder_key("x", "y", 5).alias("d")) \
            .orderBy("d").collect()

        def mean_jump(rows):
            return float(np.mean([abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
                                  for a, b in zip(rows, rows[1:])]))
        assert mean_jump(h) == 1.0
        assert mean_jump(z) > 1.5

    def test_masks_wide_inputs(self, spark):
        df = spark.createDataFrame([(65536 + 3, 2)], "x long, y long")
        wide = df.select(hilbert_key("x", "y", 16).alias("d")).collect()[0]
        df2 = spark.createDataFrame([(3, 2)], "x long, y long")
        narrow = df2.select(hilbert_key("x", "y", 16).alias("d")) \
            .collect()[0]
        assert wide["d"] == narrow["d"]


class TestRiskMetrics:
    def _df(self, spark, values, sid="a"):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(sid, t0 + dt.timedelta(days=i), float(v))
                for i, v in enumerate(values)]
        return spark.createDataFrame(rows, ["user_id", "ts", "value"])

    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(8)
        prices = 100 * np.exp(np.cumsum(rng.normal(0, 0.02, 50)))
        row = risk_metrics(self._df(spark, prices), "ts", "value",
                           ["user_id"]).collect()[0]
        # micro-unit contract: exact BIGINT sum of round(ln·1e6),
        # ONE division for the mean (never a rounded mean of rounded
        # values — the decimal .5 boundary divergence class)
        ru = np.round(np.log(prices[1:] / prices[:-1]) * 1e6)
        r = ru / 1e6
        assert row["n_returns"] == 49
        assert row["mean_return"] == pytest.approx(
            (ru.sum() / 49) / 1e6, abs=1e-12)
        assert row["volatility"] == pytest.approx(round(r.std(), 6),
                                                  abs=1e-9)
        assert row["sharpe"] == pytest.approx(
            round(((ru.sum() / 49) / 1e6) / round(r.std(), 6), 6),
            abs=1e-9)
        runmax = np.maximum.accumulate(prices)
        mdd = np.round(1.0 - prices / runmax, 6).max()
        assert row["max_drawdown"] == pytest.approx(mdd, abs=1e-9)

    def test_known_drawdown(self, spark):
        # peak 200 -> trough 100: mdd = 0.5
        prices = [100, 150, 200, 120, 100, 180]
        row = risk_metrics(self._df(spark, prices), "ts", "value",
                           ["user_id"], min_returns=3).collect()[0]
        assert row["max_drawdown"] == pytest.approx(0.5)

    def test_constant_series_null_sharpe(self, spark):
        row = risk_metrics(self._df(spark, [5.0] * 20), "ts", "value",
                           ["user_id"]).collect()[0]
        assert row["volatility"] == 0.0
        assert row["sharpe"] is None
        assert row["max_drawdown"] == 0.0

    def test_nonpositive_rows_excluded(self, spark):
        prices = [100, -5, 110, 0, 121, 133, 146, 161, 177, 195]
        row = risk_metrics(self._df(spark, prices), "ts", "value",
                           ["user_id"], min_returns=3).collect()[0]
        # 8 positive rows -> 7 returns
        assert row["n_returns"] == 7
