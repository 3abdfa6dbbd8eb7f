"""Hand-computed semantics for the contamination / LM-score / chunking /
quantization operators (the driver oracles cover the corpus paths)."""

import math

import pytest


class TestContamination:
    def test_hand_computed(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            contamination,
        )

        corpus = spark.createDataFrame(
            [(1, "a b c d e"),            # grams: "a b c", "b c d", "c d e"
             (2, "x y z w q"),            # no overlap
             (3, "a b")],                 # too short: 0 grams
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, "a b c d zz")],          # grams: "a b c", "b c d", "c d zz"
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               contamination(corpus, bench, "text", "doc_id", n=3).collect()}
        assert (got[1]["n_hit"], got[1]["n_ngrams"]) == (2, 3)
        assert got[1]["contamination_frac"] == pytest.approx(2 / 3)
        assert (got[2]["n_hit"], got[2]["n_ngrams"]) == (0, 3)
        assert got[2]["contamination_frac"] == 0.0
        assert (got[3]["n_hit"], got[3]["n_ngrams"]) == (0, 0)
        assert got[3]["contamination_frac"] == 0.0

    def test_duplicate_grams_count_once(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            contamination,
        )

        # "a b a b a b" has positions [a b a, b a b, a b a, b a b] but only
        # 2 DISTINCT 3-grams; both hit -> n_hit=2, n_ngrams=2
        corpus = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, "a b a b")], "doc_id long, text string")
        r = contamination(corpus, bench, "text", "doc_id", n=3).collect()[0]
        assert (r["n_hit"], r["n_ngrams"]) == (2, 2)
        assert r["contamination_frac"] == pytest.approx(1.0)


class TestUnigramLM:
    def test_self_trained_no_oov(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            unigram_lm_score,
        )

        # corpus tokens: a a a b  -> p(a)=3/4, p(b)=1/4
        df = spark.createDataFrame(
            [(1, "a a a"), (2, "b")], "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               unigram_lm_score(df, "text", "doc_id").collect()}
        assert got[1]["avg_logp"] == pytest.approx(math.log(0.75))
        assert got[2]["avg_logp"] == pytest.approx(math.log(0.25))
        assert got[2]["perplexity"] == pytest.approx(4.0)
        assert got[1]["n_tokens"] == 3

    def test_external_model_oov(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            unigram_lm_score,
            unigram_table,
        )

        train = spark.createDataFrame(
            [(1, "a a b b")], "doc_id long, text string")
        model = unigram_table(train, "text")
        score = spark.createDataFrame(
            [(5, "a zz")], "doc_id long, text string")
        r = unigram_lm_score(score, "text", "doc_id",
                             model=model, oov_logp=-10.0).collect()[0]
        assert r["avg_logp"] == pytest.approx((math.log(0.5) - 10.0) / 2)

    def test_capped_vocab(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            unigram_table,
        )

        df = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string")
        rows = unigram_table(df, "text", top_k=2).collect()
        assert {r["token"] for r in rows} == {"a", "b"}
        # logp still normalizes by the FULL corpus count (6)
        got = {r["token"]: r["logp"] for r in rows}
        assert got["a"] == pytest.approx(math.log(3 / 6))


class TestChunking:
    def test_overlap_and_tail(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            chunk_documents,
        )

        toks = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
        rows = chunk_documents(df, "text", "doc_id", size=4, stride=3) \
            .orderBy("chunk_id").collect()
        assert [r["chunk_start"] for r in rows] == [0, 3, 6, 9]
        assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4, 1]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[3]["chunk_text"] == "t9"
        assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]

    def test_no_overlap_default_and_empty(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            chunk_documents,
        )

        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "")], "doc_id long, text string")
        rows = chunk_documents(df, "text", "doc_id", size=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert [r["chunk_text"] for r in
                sorted(by_doc[1], key=lambda r: r["chunk_id"])] \
            == ["a b", "c d", "e"]
        # empty text tokenizes to [""] (one empty token) -> one chunk
        assert len(by_doc.get(2, [])) == 1

    def test_invalid_args(self, spark):
        from orange3_timeseries_spark.operators.contamination import (
            chunk_documents,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "doc_id", size=0)


class TestQuantize:
    def test_roundtrip_error_bound(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            quantize_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>")
        got = {r["vec_id"]: r for r in
               quantize_embeddings(df, "embedding", "vec_id").collect()}
        r1 = got[1]
        assert r1["scale"] == pytest.approx(1.0 / 127)
        assert r1["qvec"] == [127, -63, 32, 0]   # floor(x/s + .5)
        assert r1["max_abs_err"] <= r1["scale"] / 2 + 1e-12
        r2 = got[2]
        assert r2["scale"] == 0.0
        assert r2["qvec"] == [0, 0, 0, 0]
        assert r2["max_abs_err"] == 0.0

    def test_reconstruction_close(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.similarity import (
            quantize_embeddings,
        )

        rng = np.random.RandomState(7)
        vecs = [(i, rng.standard_normal(16).tolist()) for i in range(20)]
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>")
        rows = quantize_embeddings(df, "embedding", "vec_id").collect()
        orig = dict(vecs)
        for r in rows:
            rec = np.array(r["qvec"]) * r["scale"]
            err = np.abs(rec - np.array(orig[r["vec_id"]])).max()
            assert err == pytest.approx(r["max_abs_err"])
            assert err <= r["scale"] / 2 + 1e-12
