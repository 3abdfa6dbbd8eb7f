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
