"""Sequence packing and one-pass column profiling."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.packing import (
    pack_manifest,
    pack_sequences,
)
from orange3_timeseries_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "s", 100) for i in range(10)]
    return spark.createDataFrame(rows, "id long, shard string, toks long")


def test_pack_next_fit_contiguous(docs):
    out = pack_sequences(docs, "id", "toks", 250, shard_cols=["shard"],
                         order_cols=["id"]).orderBy("id").collect()
    # starts: 0,100,200,300,... -> bins 0,0,0,1,1,2,2,2,3,3
    assert [r["bin_id"] for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert [r["bin_offset"] for r in out] == \
        [0, 100, 200, 50, 150, 0, 100, 200, 50, 150]


def test_pack_deterministic_across_partitioning(docs):
    a = {(r["id"], r["bin_id"]) for r in
         pack_sequences(docs, "id", "toks", 250,
                        shard_cols=["shard"]).collect()}
    b = {(r["id"], r["bin_id"]) for r in
         pack_sequences(docs.repartition(5), "id", "toks", 250,
                        shard_cols=["shard"]).collect()}
    assert a == b


def test_pack_manifest_totals(docs):
    m = {r["bin_id"]: (r["n_docs"], r["total_tokens"]) for r in
         pack_manifest(docs, "id", "toks", 250, shard_cols=["shard"],
                       order_cols=["id"]).collect()}
    assert m == {0: (3, 300), 1: (2, 200), 2: (3, 300), 3: (2, 200)}


def test_pack_oversized_doc_gets_own_bins(spark):
    df = spark.createDataFrame([(1, 50), (2, 900), (3, 50)],
                               "id long, toks long")
    out = {r["id"]: r["bin_id"] for r in
           pack_sequences(df, "id", "toks", 100,
                          order_cols=["id"]).collect()}
    # starts: 0, 50, 950 -> bins 0, 0, 9 (big doc overflows its bin)
    assert out == {1: 0, 2: 0, 3: 9}


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, 40.0)],
        "a double, b double")
    out = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    ra = out["a"]
    assert (ra["n"], ra["n_null"], ra["n_distinct"]) == (4, 0, 4)
    assert ra["mean"] == pytest.approx(2.5)
    assert ra["vmin"] == 1.0 and ra["vmax"] == 4.0
    assert ra["p50"] == pytest.approx(2.5)   # linear interpolation
    assert ra["p25"] == pytest.approx(1.75)
    rb = out["b"]
    assert rb["n_null"] == 1 and rb["n_distinct"] == 3
    assert rb["p50"] == pytest.approx(30.0)
