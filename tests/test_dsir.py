"""DSIR importance weights (operators/sampling.py:dsir_weights)."""

import math

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.sampling import dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string,"
                                       " lang string")


CORPUS = [(1, "the cat sat on the mat", "en"),
          (2, "the dog sat on the rug", "en"),
          (3, "der hund sitzt auf dem teppich heute", "de"),
          (4, "le chat dort sur le tapis chaud", "fr"),
          (5, "the cat and the dog sat", "en"),
          (6, "", "de")]


class TestDsirWeights:
    def test_matches_reference_recompute(self, spark):
        out = {r.doc_id: r for r in
               dsir_weights(_docs(spark, CORPUS), "text", "doc_id",
                            F.col("lang") == "en",
                            n_buckets=64).collect()}
        # reference recompute in pure python with the same hashing
        # (md5-hex 15-char prefix -> int, exactly hashing.phash)
        import hashlib

        def bucket(gram):
            return int(hashlib.md5(gram.encode()).hexdigest()[:15],
                       16) % 64

        import re
        ct, cr = {}, {}
        grams = []
        for doc_id, text, lang in CORPUS:
            ts = [t for t in re.sub(
                r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ",
                                    text.lower())).strip().split(" ")
                  if t != ""]
            bs = [bucket(a + " " + b) for a, b in zip(ts, ts[1:])]
            grams.append((doc_id, lang, bs))
            for b in bs:
                (ct if lang == "en" else cr)[b] = \
                    (ct if lang == "en" else cr).get(b, 0) + 1
        nt, nr = sum(ct.values()), sum(cr.values())
        for doc_id, lang, bs in grams:
            su = 0
            for b in bs:
                w = (math.log((ct.get(b, 0) + 0.5) / (nt + 32.0))
                     - math.log((cr.get(b, 0) + 0.5) / (nr + 32.0)))
                su += round(w * 1e6)
            assert out[doc_id].logw == pytest.approx(su / 1e6,
                                                     abs=1e-12)
            assert out[doc_id].n_bigrams == len(bs)

    def test_target_docs_score_higher(self, spark):
        out = {r.doc_id: r for r in
               dsir_weights(_docs(spark, CORPUS), "text", "doc_id",
                            F.col("lang") == "en").collect()}
        en = [out[d].avg_lr for d in (1, 2, 5)]
        other = [out[d].avg_lr for d in (3, 4)]
        assert min(en) > max(other)

    def test_empty_doc_null_avg(self, spark):
        out = {r.doc_id: r for r in
               dsir_weights(_docs(spark, CORPUS), "text", "doc_id",
                            F.col("lang") == "en").collect()}
        assert out[6].n_bigrams == 0
        assert out[6].logw == 0.0
        assert out[6].avg_lr is None

    def test_partitioning_invariant(self, spark):
        df = _docs(spark, CORPUS)
        a = dsir_weights(df, "text", "doc_id",
                         F.col("lang") == "en").collect()
        b = dsir_weights(df.repartition(7), "text", "doc_id",
                         F.col("lang") == "en").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
