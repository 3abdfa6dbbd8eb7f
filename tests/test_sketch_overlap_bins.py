"""HLL pairwise overlap, quantile binning, event transition matrix."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.sketch import hll_overlap
from orange3_timeseries_spark import queries_analytics  # noqa: F401 (registers)


class TestHllOverlap:
    def test_planted_overlap_within_error(self, spark):
        # A = 0..1999, B = 1000..2999: |A|=|B|=2000, overlap 1000,
        # union 3000.  p=10 -> ~3.3% base error; allow 3x on overlap.
        rows = ([("A", f"k{i}") for i in range(2000)]
                + [("B", f"k{i}") for i in range(1000, 3000)])
        df = spark.createDataFrame(rows, ["g", "k"])
        r = hll_overlap(df, "k", "g", p=10).collect()[0]
        assert r["group_a"] == "A" and r["group_b"] == "B"
        assert r["est_a"] == pytest.approx(2000, rel=0.12)
        assert r["est_union"] == pytest.approx(3000, rel=0.12)
        assert r["overlap_est"] == pytest.approx(1000, rel=0.35)
        assert r["jaccard_est"] == pytest.approx(1000 / 3000, rel=0.4)

    def test_disjoint_groups_near_zero(self, spark):
        rows = ([("A", f"a{i}") for i in range(1500)]
                + [("B", f"b{i}") for i in range(1500)])
        df = spark.createDataFrame(rows, ["g", "k"])
        r = hll_overlap(df, "k", "g", p=10).collect()[0]
        # inclusion-exclusion noise, but far below the group size
        assert r["overlap_est"] < 0.25 * r["est_a"]

    def test_identical_groups_full_overlap(self, spark):
        rows = [(g, f"k{i}") for g in ("A", "B") for i in range(1000)]
        df = spark.createDataFrame(rows, ["g", "k"])
        r = hll_overlap(df, "k", "g", p=10).collect()[0]
        # est_union == est_a == est_b -> overlap == est, jaccard ~1
        assert r["est_union"] == r["est_a"] == r["est_b"]
        assert r["jaccard_est"] == pytest.approx(1.0, abs=1e-6)

    def test_pair_count(self, spark):
        rows = [(f"g{j}", f"k{i}") for j in range(4) for i in range(300)]
        df = spark.createDataFrame(rows, ["g", "k"])
        assert hll_overlap(df, "k", "g", p=8).count() == 6


class TestQuantileBinsAndTransitions:
    def test_ntile_equal_frequency(self, spark):
        from orange3_timeseries_spark.queries import QUERIES
        out = QUERIES["quantile_bins_events"](spark,
                                              "/root/testdata/sf0.001")
        sizes = (out.groupBy("event_type", "decile").count()
                 .groupBy("event_type")
                 .agg((F.max("count") - F.min("count")).alias("spread"))
                 .collect())
        assert all(r["spread"] <= 1 for r in sizes)
        assert out.select(F.min("decile"), F.max("decile")) \
            .collect()[0] == (1, 10)

    def test_transitions_probs_sum_to_one(self, spark):
        from orange3_timeseries_spark.queries import QUERIES
        out = QUERIES["event_transitions"](spark,
                                           "/root/testdata/sf0.001")
        sums = (out.groupBy("cur_type")
                .agg(F.sum("prob").alias("s")).collect())
        for r in sums:
            assert r["s"] == pytest.approx(1.0, abs=1e-4)

    def test_transitions_direct_small(self, spark):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        seq = ["a", "b", "a", "b", "c"]
        rows = [(1, t0 + dt.timedelta(minutes=i), i, s)
                for i, s in enumerate(seq)]
        df = spark.createDataFrame(rows,
                                   ["user_id", "ts", "event_id",
                                    "event_type"])
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        o = df.select("event_type",
                      F.lead("event_type").over(w).alias("nx"))
        got = {(r["event_type"], r["nx"]): 1
               for r in o.where(F.col("nx").isNotNull()).collect()}
        # transitions: a->b (x2), b->a, b->c
        assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}
