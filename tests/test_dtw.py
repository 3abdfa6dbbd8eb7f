"""Pure-Catalyst DTW over integer profile arrays."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.dtw import dtw_units_expr


def ref_dtw(a, b):
    K = len(a)
    dp = np.zeros((K, K), dtype=np.int64)
    for i in range(K):
        for j in range(K):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i, j] = c
            elif i == 0:
                dp[i, j] = c + dp[i, j - 1]
            elif j == 0:
                dp[i, j] = c + dp[i - 1, j]
            else:
                dp[i, j] = c + min(dp[i - 1, j], dp[i - 1, j - 1],
                                   dp[i, j - 1])
    return int(dp[-1, -1])


def _run(spark, pairs, k):
    df = spark.createDataFrame(
        [(i, [int(x) for x in a], [int(x) for x in b])
         for i, (a, b) in enumerate(pairs)],
        "id long, a array<bigint>, b array<bigint>")
    out = df.select("id", dtw_units_expr(F.col("a"), F.col("b"), k)
                    .alias("dtw"))
    return {r["id"]: r["dtw"] for r in out.collect()}


class TestDtw:
    def test_identical_zero(self, spark):
        a = [3, 1, 4, 1, 5, 9, 2]
        assert _run(spark, [(a, a)], 7)[0] == 0

    def test_phase_shift_cheaper_than_euclidean(self, spark):
        # same sawtooth shifted by one step: DTW warps it almost free
        a = [0, 100, 200, 300, 200, 100, 0]
        b = [100, 200, 300, 200, 100, 0, 0]
        got = _run(spark, [(a, b)], 7)[0]
        eucl = sum(abs(x - y) for x, y in zip(a, b))
        assert got < eucl
        assert got == ref_dtw(a, b)

    def test_matches_reference_randomized(self, spark):
        rng = np.random.RandomState(7)
        pairs = [(rng.randint(0, 10**6, 7), rng.randint(0, 10**6, 7))
                 for _ in range(40)]
        got = _run(spark, pairs, 7)
        for i, (a, b) in enumerate(pairs):
            assert got[i] == ref_dtw(a, b)

    def test_longer_profiles(self, spark):
        rng = np.random.RandomState(8)
        pairs = [(rng.randint(0, 1000, 24), rng.randint(0, 1000, 24))
                 for _ in range(10)]
        got = _run(spark, pairs, 24)
        for i, (a, b) in enumerate(pairs):
            assert got[i] == ref_dtw(a, b)

    def test_symmetry(self, spark):
        rng = np.random.RandomState(9)
        a, b = rng.randint(0, 500, 7), rng.randint(0, 500, 7)
        got = _run(spark, [(a, b), (b, a)], 7)
        assert got[0] == got[1]
