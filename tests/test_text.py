"""Text-operator unit tests (the driver oracles cover the full corpus
paths; these pin hand-computed semantics on tiny inputs)."""

import math

import pytest


class TestTfidf:
    def test_hand_computed(self, spark):
        from orange3_timeseries_spark.operators.text import tfidf

        docs = [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["doc_id"], r["token"]): (r["tf"], r["idf"])
               for r in tfidf(df, "text", "doc_id").collect()}
        # apple: only doc 1, tf = 2/3, idf = ln(3/1)
        tf, idf = got[(1, "apple")]
        assert tf == pytest.approx(2 / 3)
        assert idf == pytest.approx(math.log(3.0))
        # banana: docs 1 and 2 -> idf = ln(3/2)
        assert got[(1, "banana")][1] == pytest.approx(math.log(1.5))
        assert got[(2, "banana")][0] == pytest.approx(0.5)
        # cherry in doc 3: tf = 1.0, idf = ln(3/2)
        assert got[(3, "cherry")][0] == pytest.approx(1.0)

    def test_top_k_rank_deterministic(self, spark):
        from orange3_timeseries_spark.operators.text import tfidf

        df = spark.createDataFrame(
            [(1, "x y"), (2, "x y")], "doc_id long, text string")
        # x and y tie exactly (same tf, same df) -> token asc breaks it
        got = tfidf(df, "text", "doc_id", top_k=1) \
            .orderBy("doc_id").collect()
        assert [r["token"] for r in got] == ["x", "x"]
        assert all(r["rank"] == 1 for r in got)


# ------------------------------------------- calibrated quality filter
def test_calibrated_quality_filter(spark):
    from orange3_timeseries_spark.operators.text import (
        calibrated_quality_filter,
    )

    rows = []
    for i in range(100):
        # lang a: rich prose-ish; lang b: terse — different score bands
        if i % 2 == 0:
            rows.append((i, "a", "the quick brown fox and the lazy dog "
                         * (1 + i % 5)))
        else:
            rows.append((i, "b", "zz " * (1 + i % 3)))
    df = spark.createDataFrame(rows, ["id", "lang", "text"])
    kept = calibrated_quality_filter(df, "text", "id", "lang",
                                     pct=0.2).collect()
    per = {}
    for r in kept:
        per.setdefault(r.lang, []).append(r.id)
    # each stratum keeps roughly its top 80% BY ITS OWN distribution —
    # the terse language is not wiped out by the prose language's bar
    assert len(per["a"]) >= 35 and len(per["b"]) >= 35
    # deterministic
    again = calibrated_quality_filter(df, "text", "id", "lang",
                                      pct=0.2).collect()
    assert {r.id for r in again} == {r.id for r in kept}
    # sampled calibration still returns a sane, deterministic subset
    samp = calibrated_quality_filter(df, "text", "id", "lang", pct=0.2,
                                     sample_rate=0.5).collect()
    assert len(samp) >= 60
