"""Deterministic shard assignment (operators/sharding.py)."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.sharding import (
    _global_row_number,
    balanced_shards,
    hash_shards,
    shard_manifest,
)


@pytest.fixture(scope="module")
def docs(spark):
    # weights 1..200 — deterministic, skewed enough to punish bad packing
    return spark.createDataFrame(
        [(i, (i * 37) % 200 + 1) for i in range(200)], ["id", "w"])


def test_hash_shards_deterministic_and_dense(docs):
    a = {(r.id): (r.shard, r.pos)
         for r in hash_shards(docs, "id", 8).collect()}
    b = {(r.id): (r.shard, r.pos)
         for r in hash_shards(docs, "id", 8).collect()}
    assert a == b  # reproducible across runs
    by_shard = {}
    for sid, pos in a.values():
        by_shard.setdefault(sid, []).append(pos)
    for sid, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense 1..n


def test_global_row_number_matches_naive(docs):
    out = _global_row_number(
        docs, [F.col("w").desc(), F.col("id").asc()]).collect()
    got = {r.id: r["__rn__"] for r in out}
    naive = {row_id: rn + 1 for rn, (row_id, _) in enumerate(
        sorted(((r.id, r.w) for r in docs.collect()),
               key=lambda t: (-t[1], t[0])))}
    assert got == naive


def test_balanced_shards_tight_spread(docs):
    assigned = balanced_shards(docs, "id", "w", 8)
    man = shard_manifest(assigned, "shard", "w").collect()
    assert sorted(r.shard for r in man) == list(range(8))
    weights = [r.total_weight for r in man]
    # snake placement: spread bounded by one max-weight document
    assert max(weights) - min(weights) <= 200
    counts = [r.n_docs for r in man]
    assert max(counts) - min(counts) <= 1


class TestSaltedJoin:
    def test_matches_plain_join_on_skewed_keys(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        # 90% of left rows share one hot key
        left = spark.range(0, 2000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
             .otherwise(F.col("id") % 50).alias("k"),
            F.col("id").alias("v"))
        right = spark.createDataFrame(
            [(k, f"dim{k}") for k in range(50)], "k long, name string")
        got = salted_join(left, right, "k")
        want = left.join(right, "k")
        assert got.count() == want.count() == 2000
        a = {(r.k, r.v, r.name) for r in got.collect()}
        b = {(r.k, r.v, r.name) for r in want.collect()}
        assert a == b
        # outer join: unmatched left rows survive with null dim
        left2 = left.union(spark.createDataFrame([(999, -1)],
                                                 "k long, v long"))
        lo = salted_join(left2, right, "k", how="left")
        assert lo.where("name IS NULL").count() == 1

    def test_salt_spreads_the_hot_key(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        left = spark.range(0, 4000).select(F.lit(1).alias("k"),
                                           F.col("id").alias("v"))
        right = spark.createDataFrame([(1, "x")], "k long, name string")
        out = salted_join(left, right, "k", n_salts=8)
        # recompute the salt the operator uses: the single hot key's
        # rows land in (nearly) all 8 salt groups
        salts = left.select(F.pmod(F.xxhash64("k", "v"), F.lit(8))
                            .alias("s")).distinct().count()
        assert salts >= 7
        assert out.count() == 4000

    def test_auto_fanout_from_key_stats(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            skew_salt_count,
        )
        # uniform keys: hottest ~ average -> 1 (no salting)
        uniform = spark.range(0, 4000).select(
            (F.col("id") % 100).alias("k"))
        assert skew_salt_count(uniform, "k") == 1
        # half the table on one key, local[4]: hot share 2000 vs
        # avg-task 1000 -> 2 salts
        skewed = spark.range(0, 4000).select(
            F.when(F.col("id") < 2000, F.lit(7))
             .otherwise(F.col("id")).alias("k"))
        assert skew_salt_count(skewed, "k") == 2
        # everything on one key: spread over every core —
        # ceil(mx / (tot/par)) == par when mx == tot
        hot = spark.range(0, 100000).select(F.lit(1).alias("k"))
        par = spark.sparkContext.defaultParallelism
        assert skew_salt_count(hot, "k") == min(64, par)

    def test_uniform_keys_take_the_plain_join_path(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        left = spark.range(0, 1000).select((F.col("id") % 50).alias("k"),
                                           F.col("id").alias("v"))
        right = spark.createDataFrame(
            [(k, f"d{k}") for k in range(50)], "k long, name string")
        out = salted_join(left, right, "k")  # auto -> 1 -> plain join
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt__" not in plan  # no salt column, no explode
        assert "Generate" not in plan  # no right-side replication
        assert out.count() == 1000

    def test_unique_col_spreads_duplicate_rows(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        # byte-identical duplicate rows of one hot key: full-row hashing
        # gives them all ONE salt (the documented limitation); a unique
        # id column must spread them
        left = (spark.range(0, 4096)
                .select(F.lit(1).alias("k"), F.lit("same").alias("v"),
                        F.col("id").alias("row_id")))
        right = spark.createDataFrame([(1, "x")], "k long, name string")
        out = salted_join(left, right, "k", n_salts=8,
                          unique_col="row_id")
        assert out.count() == 4096
        # replay the operator's salt: all 8 buckets used
        used = left.select(
            F.pmod(F.xxhash64("row_id"), F.lit(8)).alias("s")) \
            .distinct().count()
        assert used == 8
        # contrast: identical (k, v) rows WITHOUT row_id hash to 1 salt
        dup_only = left.select("k", "v")
        one = dup_only.select(
            F.pmod(F.xxhash64("k", "v"), F.lit(8)).alias("s")) \
            .distinct().count()
        assert one == 1

    def test_salted_plan_does_not_double_salt_under_aqe(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        left = spark.range(0, 4000).select(F.lit(1).alias("k"),
                                           F.col("id").alias("v"))
        right = spark.createDataFrame(
            [(k, f"d{k}") for k in range(8)], "k long, name string")
        out = salted_join(left, right, "k", n_salts=8, unique_col="v")
        out.count()  # materialize so AQE finalizes the physical plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        # AQE marks its own skew-split joins "skew=true"; the salted
        # plan must not ALSO carry that (exactly one mechanism applies)
        assert "skew=true" not in plan

    def test_map_typed_columns_are_hashable(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            salted_join,
        )
        # xxhash64 rejects map columns — the full-row salt must skip
        # them instead of failing analysis
        left = spark.range(0, 100).select(
            F.lit(1).alias("k"), F.col("id").alias("v"),
            F.create_map(F.lit("a"), F.col("id")).alias("m"))
        right = spark.createDataFrame([(1, "x")], "k long, name string")
        out = salted_join(left, right, "k", n_salts=4)
        assert out.count() == 100


class TestSkewProfile:
    def test_profile_values(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            skew_profile,
        )
        # 700 rows of key A, 200 of B, 100 of C
        df = spark.range(0, 1000).select(
            F.when(F.col("id") < 700, "A")
             .when(F.col("id") < 900, "B").otherwise("C").alias("k"))
        out = {r.k: r for r in
               skew_profile(df, "k", top_n=2, parallelism=4).collect()}
        assert set(out) == {"A", "B"}  # top-2 only
        assert out["A"].cnt == 700 and out["A"].rank == 1
        assert out["A"].share == pytest.approx(0.7)
        assert out["A"].n_keys == 3
        # skew ratio: 700 / (1000/3)
        assert out["A"].skew_ratio == pytest.approx(700 / (1000 / 3))
        # salts: ceil(700 / floor(1000/4)) = ceil(700/250) = 3
        assert out["A"].salts_recommended == 3
        assert out["B"].rank == 2

    def test_uniform_keys_recommend_no_salting(self, spark):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.operators.partitioning import (
            skew_profile,
        )
        df = spark.range(0, 1000).select((F.col("id") % 10).alias("k"))
        out = skew_profile(df, "k", top_n=1, parallelism=4).collect()
        assert out[0].salts_recommended == 1
