"""Bigram-LM perplexity gate: hand-computed probabilities, OOV
smoothing, degenerate documents, plan shape."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string")


class TestBigramLM:
    def test_counts(self, spark, corpus):
        from orange3_timeseries_spark.operators.lm import train_bigram_lm

        uni, bi = train_bigram_lm(corpus, "text")
        assert {(r.w, r.c1) for r in uni.collect()} \
            == {("a", 3), ("b", 3), ("c", 1)}
        assert {(r.w1, r.w2, r.c2) for r in bi.collect()} \
            == {("a", "b", 3), ("b", "a", 1), ("b", "c", 1)}

    def test_hand_computed_perplexity(self, spark, corpus):
        from orange3_timeseries_spark.operators.lm import bigram_perplexity

        out = {r.doc_id: r for r in
               bigram_perplexity(corpus, "doc_id", "text").collect()}
        # V=3, k=0.5: P(b|a)=3.5/4.5, P(a|b)=1.5/4.5, P(c|b)=1.5/4.5
        lp_ab = math.log(3.5 / 4.5)
        lp_ba = math.log(1.5 / 4.5)
        d1 = (lp_ab + lp_ba + lp_ab) / 3
        d2 = (lp_ab + lp_ba) / 2
        assert out[1].n_bigrams == 3 and out[2].n_bigrams == 2
        assert out[1].avg_logp == pytest.approx(d1, rel=1e-12)
        assert out[1].ppl == pytest.approx(math.exp(-d1), rel=1e-12)
        assert out[2].avg_logp == pytest.approx(d2, rel=1e-12)

    def test_oov_scoring_against_trained_lm(self, spark, corpus):
        """Held-out scoring (the CCNet shape): unseen bigram of an
        unseen context word scores k/(0 + k*V) = 1/V."""
        from orange3_timeseries_spark.operators.lm import (
            bigram_perplexity,
            train_bigram_lm,
        )
        uni, bi = train_bigram_lm(corpus, "text")
        held = spark.createDataFrame([(9, "z z")],
                                     "doc_id long, text string")
        [r] = bigram_perplexity(held, "doc_id", "text",
                                unigrams=uni, bigrams=bi).collect()
        assert r.n_bigrams == 1
        assert r.avg_logp == pytest.approx(math.log(1 / 3), rel=1e-12)
        # and a seen-context unseen-continuation: P(z|a) = .5/4.5
        [r2] = bigram_perplexity(
            spark.createDataFrame([(8, "a z")], "doc_id long, text string"),
            "doc_id", "text", unigrams=uni, bigrams=bi).collect()
        assert r2.avg_logp == pytest.approx(math.log(0.5 / 4.5), rel=1e-12)

    def test_degenerate_docs_score_null(self, spark):
        from orange3_timeseries_spark.operators.lm import bigram_perplexity

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "!!!"), (4, "a b")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               bigram_perplexity(df, "doc_id", "text").collect()}
        assert len(out) == 4  # every doc appears, even with no bigrams
        for did in (1, 2, 3):
            assert out[did].n_bigrams == 0
            assert out[did].avg_logp is None and out[did].ppl is None
        assert out[4].n_bigrams == 1 and out[4].ppl is not None

    def test_repetitive_text_scores_lower_ppl(self, spark):
        """The gate's point: degenerate repetitive text is MORE probable
        under a self-trained LM than diverse text."""
        from orange3_timeseries_spark.operators.lm import bigram_perplexity

        rows = [(1, "spam " * 50), (2, "the quick brown fox jumps over "
                                       "a lazy dog near riverbanks")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.ppl for r in
               bigram_perplexity(df, "doc_id", "text").collect()}
        assert out[1] < out[2]

    def test_plan_no_python_and_broadcast_vocab(self, spark, corpus):
        from orange3_timeseries_spark.operators.lm import bigram_perplexity

        plan = bigram_perplexity(corpus, "doc_id", "text") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # pure Catalyst
        assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
