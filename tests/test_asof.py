"""As-of join unit tests: hand-computed semantics on tiny inputs (the
driver oracle covers the corpus path against DuckDB's native ASOF JOIN)."""


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "d")],
        "k int, t long, tag string")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (1, 25, 250.0), (3, 1, 999.0)],
        "k int, t long, v double")
    return left, right


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        from orange3_timeseries_spark.operators.asof import asof_join

        left, right = _mk(spark)
        got = {r["tag"]: (r["asof_t"], r["asof_v"])
               for r in asof_join(left, right, "t", by=["k"],
                                  value_cols=["v"]).collect()}
        assert got["a"] == (5, 100.0)     # strictly before
        assert got["b"] == (20, 200.0)    # equal timestamp matches
        assert got["c"] == (25, 250.0)    # latest at-or-before wins
        assert got["d"] == (None, None)   # no right rows for key 2

    def test_forward(self, spark):
        from orange3_timeseries_spark.operators.asof import asof_join

        left, right = _mk(spark)
        got = {r["tag"]: (r["asof_t"], r["asof_v"])
               for r in asof_join(left, right, "t", by=["k"],
                                  value_cols=["v"],
                                  direction="forward").collect()}
        assert got["a"] == (20, 200.0)    # earliest at-or-after
        assert got["b"] == (20, 200.0)    # equal timestamp matches
        assert got["c"] == (None, None)   # nothing after t=30
        assert got["d"] == (None, None)

    def test_tolerance(self, spark):
        from orange3_timeseries_spark.operators.asof import asof_join

        left, right = _mk(spark)
        got = {r["tag"]: (r["asof_t"], r["asof_v"])
               for r in asof_join(left, right, "t", by=["k"],
                                  value_cols=["v"],
                                  tolerance_seconds=5).collect()}
        assert got["a"] == (5, 100.0)     # gap 5 <= 5 kept
        assert got["b"] == (20, 200.0)    # gap 0
        assert got["c"] == (25, 250.0)    # gap 5 kept
        assert got["d"] == (None, None)

    def test_single_shuffle_plan(self, spark):
        """The plan must contain exactly one Exchange (the by-key window
        partitioning) and NO join node — the whole point vs a range join."""
        from orange3_timeseries_spark.operators.asof import asof_join

        left, right = _mk(spark)
        plan = asof_join(left, right, "t", by=["k"], value_cols=["v"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
