"""Bloom-filter cross-corpus membership (operators/bloom.py)."""

import pytest

from orange3_timeseries_spark.operators.bloom import (
    LANE_BITS,
    bloom_build,
    bloom_membership,
    bloom_params,
)


def test_bloom_params_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook optimum: ~9.585 bits/key, ~7 hashes at 1 % fp
    assert 9400 <= m <= 9700 and m % LANE_BITS == 0
    assert k == 7
    # degenerate inputs stay valid
    m, k = bloom_params(0, 0.5)
    assert m >= LANE_BITS and k >= 1


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc number {i} body") for i in range(200)]
    # odd ids 1/3/5 share text with even ids 0/2/4 -> true duplicates
    rows[1] = (1, rows[0][1])
    rows[3] = (3, rows[2][1])
    rows[5] = (5, rows[4][1])
    return spark.createDataFrame(rows, ["id", "key"])


def test_no_false_negatives(corpus):
    ref = corpus.where("id % 2 = 0")
    out = bloom_membership(corpus, "id", "key", ref, "key",
                           m_bits=4096, k=4).collect()
    flags = {r.id: r.maybe_member for r in out}
    assert len(flags) == 200
    # every reference key must flag true (no false negatives)...
    assert all(flags[i] for i in range(0, 200, 2))
    # ...including cross-corpus duplicates of a reference key
    assert flags[1] and flags[3] and flags[5]


def test_false_positive_rate_bounded(corpus):
    ref = corpus.where("id % 2 = 0")  # n=100 keys
    m, k = bloom_params(100, 0.01)  # ~959 bits, 7 hashes
    out = bloom_membership(corpus, "id", "key", ref, "key",
                           m_bits=m, k=k).collect()
    fp = sum(1 for r in out
             if r.maybe_member and r.id % 2 == 1 and r.id not in (1, 3, 5))
    assert fp <= 5  # 97 genuine negatives at ~1 % design rate


def test_build_is_sparse_and_bounded(corpus):
    lanes = bloom_build(corpus, "key", m_bits=4096, k=4)
    rows = lanes.collect()
    assert len(rows) <= 4096 // LANE_BITS
    assert all(r.bits != 0 for r in rows)
    # masks were 32-bit: every lane value is positive in signed 64-bit
    assert all(r.bits > 0 for r in rows)


def test_probe_expr_matches_probe_join(corpus, spark):
    """The embedded-literal expression probe and the lane-join probe are
    the same filter."""
    from pyspark.sql import functions as F

    from orange3_timeseries_spark.operators.bloom import (
        bloom_probe,
        bloom_probe_expr,
        dense_lanes,
    )

    ref = corpus.where("id % 2 = 0")
    lanes = bloom_build(ref, "key", m_bits=2048, k=4)
    joined = {r.id: r.maybe_member
              for r in bloom_probe(corpus, "id", "key", lanes,
                                   2048, 4).collect()}
    dense = dense_lanes(lanes, 2048)
    expr = {r.id: r.hit for r in corpus.select(
        "id", bloom_probe_expr(F.col("key"), dense, 2048, 4)
        .alias("hit")).collect()}
    assert joined == expr
