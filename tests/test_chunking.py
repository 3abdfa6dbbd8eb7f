"""Document chunking: window arithmetic, overlap coverage, edge cases,
plan purity."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.chunking import chunk_documents


class TestChunking:
    def test_exact_arithmetic(self, spark):
        words = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, words)], "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text", size=4,
                              overlap=1).collect()
        # n=10, stride=3: chunks at 0,3,6 cover ..9? 6+4=10 -> 3 chunks
        assert len(out) == 3
        by_id = {r.chunk_id: r for r in out}
        assert by_id[0].chunk_text == "w0 w1 w2 w3"
        assert by_id[1].chunk_text == "w3 w4 w5 w6"
        assert by_id[2].chunk_text == "w6 w7 w8 w9"
        assert all(r.n_chunks == 3 for r in out)
        assert [by_id[i].chunk_start for i in range(3)] == [0, 3, 6]

    def test_every_token_covered_no_empty_chunks(self, spark):
        rows = [(i, " ".join(f"t{j}" for j in range(i)))
                for i in range(1, 40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text", size=8,
                              overlap=3).collect()
        cover = {}
        for r in out:
            assert r.chunk_tokens > 0
            for k in range(r.chunk_start, r.chunk_start + r.chunk_tokens):
                cover.setdefault(r.doc_id, set()).add(k)
        for i in range(1, 40):
            assert cover[i] == set(range(i))  # full coverage

    def test_short_and_empty_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "one two"), (2, ""), (3, "   ")],
            "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text", size=64,
                              overlap=16).collect()
        assert {r.doc_id for r in out} == {1}  # empty docs dropped
        [r] = out
        assert r.n_chunks == 1 and r.chunk_tokens == 2

    def test_bad_overlap_rejected(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", size=8, overlap=8)

    def test_plan_map_only(self, spark):
        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        plan = chunk_documents(df, "doc_id", "text") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "Exchange" not in plan  # no shuffle: map-only explode
