"""Rank-based ROC-AUC and calibration-bin evaluation operators."""

import numpy as np
import pytest

from orange3_timeseries_spark.operators.classifier import (
    calibration_bins,
    rank_auc,
)


def _df(spark, units, labels, g="a"):
    rows = [(g, int(u), bool(y)) for u, y in zip(units, labels)]
    return spark.createDataFrame(rows, ["g", "su", "y"])


class TestRankAuc:
    def test_perfect_separation(self, spark):
        row = rank_auc(_df(spark, [1, 2, 3, 10, 11, 12],
                           [0, 0, 0, 1, 1, 1]), "su", "y",
                       ["g"]).collect()[0]
        assert row["auc"] == 1.0
        assert (row["n_pos"], row["n_neg"]) == (3, 3)

    def test_perfectly_wrong(self, spark):
        row = rank_auc(_df(spark, [10, 11, 12, 1, 2, 3],
                           [0, 0, 0, 1, 1, 1]), "su", "y",
                       ["g"]).collect()[0]
        assert row["auc"] == 0.0

    def test_constant_score_half(self, spark):
        row = rank_auc(_df(spark, [5] * 10, [1] * 4 + [0] * 6), "su",
                       "y", ["g"]).collect()[0]
        assert row["auc"] == 0.5

    def test_single_class_dropped(self, spark):
        out = rank_auc(_df(spark, [1, 2, 3], [1, 1, 1]), "su", "y",
                       ["g"])
        assert out.count() == 0

    def test_matches_pairwise_definition(self, spark):
        rng = np.random.RandomState(0)
        y = rng.rand(80) < 0.4
        su = (rng.randint(0, 20, size=80)
              + (y * rng.randint(0, 10, size=80)))  # ties + signal
        row = rank_auc(_df(spark, su, y), "su", "y", ["g"]).collect()[0]
        pos, neg = su[y], su[~y]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        ref = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert row["auc"] == pytest.approx(round(ref, 6))


class TestCalibrationBins:
    def test_perfectly_calibrated(self, spark):
        rows = []
        rng = np.random.RandomState(1)
        for b in range(10):
            p = b / 10 + 0.05
            for _ in range(400):
                rows.append(("a", int(p * 1_000_000),
                             bool(rng.rand() < p)))
        df = spark.createDataFrame(rows, ["g", "su", "y"])
        out = {r["bin"]: r for r in
               calibration_bins(df, "su", "y").collect()}
        assert set(out) == set(range(10))
        for b, r in out.items():
            assert r["mean_pred"] == pytest.approx(b / 10 + 0.05)
            assert abs(r["gap"]) < 0.1   # binomial noise at n=400
            assert r["obs_rate"] == pytest.approx(
                r["mean_pred"] + r["gap"], abs=1e-12)

    def test_bin_edges_on_units(self, spark):
        # su=100000 is exactly a bin edge -> bin 1; su=99999 -> bin 0;
        # su=1000000 clamps into bin 9
        df = spark.createDataFrame(
            [("a", 99999, True), ("a", 100000, False),
             ("a", 1000000, True)], ["g", "su", "y"])
        out = {r["bin"]: r["n_rows"] for r in
               calibration_bins(df, "su", "y").collect()}
        assert out == {0: 1, 1: 1, 9: 1}
