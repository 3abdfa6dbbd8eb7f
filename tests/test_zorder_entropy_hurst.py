"""Z-order key/layout, token entropy, and R/S Hurst vs direct references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _morton(x, y, bits=21):
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


class TestZorder:
    def test_key_matches_reference(self, spark):
        from orange3_timeseries_spark.operators.partitioning import (
            zorder_key,
        )

        rng = np.random.RandomState(5)
        rows = [(int(x), int(y))
                for x, y in rng.randint(0, 1 << 21, size=(200, 2))]
        df = spark.createDataFrame(rows, "x long, y long")
        got = df.select("x", "y",
                        zorder_key("x", "y").alias("z")).collect()
        for r in got:
            assert r.z == _morton(r.x, r.y)

    def test_masking_of_wide_values(self, spark):
        from orange3_timeseries_spark.operators.partitioning import (
            zorder_key,
        )

        big = (1 << 40) + 12345
        df = spark.createDataFrame([(big, 7)], "x long, y long")
        r = df.select(zorder_key("x", "y").alias("z")).collect()[0]
        assert r.z == _morton(big & ((1 << 21) - 1), 7)

    def test_repartition_colocates_both_dims(self, spark):
        from orange3_timeseries_spark.operators.partitioning import (
            zorder_repartition,
        )

        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x long, y long")
        parts = (zorder_repartition(df, "x", "y", 16)
                 .withColumn("pid", F.spark_partition_id())
                 .groupBy("pid")
                 .agg((F.max("x") - F.min("x")).alias("sx"),
                      (F.max("y") - F.min("y")).alias("sy"))
                 .collect())
        # 4096 cells over 16 partitions: a Z-curve tile spans ~16-32 per
        # dim; arrival order would span the full 0-63 in y on every
        # partition.  Assert both dims are genuinely narrowed.
        mean_sx = sum(p.sx for p in parts) / len(parts)
        mean_sy = sum(p.sy for p in parts) / len(parts)
        assert mean_sx < 40 and mean_sy < 40
        assert max(p.sx for p in parts) < 64
        assert max(p.sy for p in parts) < 64


class TestTokenEntropy:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_degenerate_and_uniform(self, spark):
        from orange3_timeseries_spark.operators.text import token_entropy

        out = {r.doc_id: r for r in token_entropy(
            self._docs(spark, ["a a a a", "w x y z"]),
            "text", "doc_id").collect()}
        assert out[0].entropy == 0.0 and out[0].n_types == 1
        assert out[0].type_token_ratio == pytest.approx(0.25)
        assert out[1].entropy == pytest.approx(math.log(4), abs=1e-6)
        assert out[1].type_token_ratio == 1.0

    def test_matches_direct_reference(self, spark):
        from collections import Counter

        from orange3_timeseries_spark.operators.text import token_entropy

        rng = np.random.RandomState(9)
        vocab = ["tok%d" % i for i in range(12)]
        texts = [" ".join(rng.choice(vocab, size=50)) for _ in range(5)]
        out = {r.doc_id: r for r in token_entropy(
            self._docs(spark, texts), "text", "doc_id").collect()}
        for i, t in enumerate(texts):
            c = Counter(t.split())
            n = sum(c.values())
            h = -sum((v / n) * math.log(v / n) for v in c.values())
            assert out[i].n_tokens == n
            assert out[i].n_types == len(c)
            assert out[i].entropy == pytest.approx(h, abs=1e-5)


class TestHurstRS:
    def _series(self, spark, values, user=1):
        rows = [(user, i, float(v)) for i, v in enumerate(values)]
        return spark.createDataFrame(
            rows, "user_id int, ts int, value double")

    def _reference(self, values):
        y = np.asarray(values, dtype=float)
        mu = round(float(y.mean()), 6)
        d = np.round(y - mu, 6)
        cum = np.cumsum(d)
        r = round(float(cum.max() - cum.min()), 6)
        s = round(float(y.std()), 6)
        return r, s, round(math.log(r / s) / math.log(len(y)), 6)

    def test_matches_direct_reference(self, spark):
        from orange3_timeseries_spark.operators.stattests import hurst_rs

        rng = np.random.RandomState(4)
        vals = rng.standard_normal(100).tolist()
        out = hurst_rs(self._series(spark, vals), "ts", "value",
                       ["user_id"]).collect()
        assert len(out) == 1
        r, s, h = self._reference(vals)
        assert out[0].rs_range == pytest.approx(r, abs=1e-6)
        assert out[0].rs_std == pytest.approx(s, abs=1e-6)
        assert out[0].hurst == pytest.approx(h, abs=1e-6)

    def test_persistent_beats_noise(self, spark):
        from orange3_timeseries_spark.operators.stattests import hurst_rs

        rng = np.random.RandomState(8)
        noise = rng.standard_normal(200)
        walk = np.cumsum(noise)          # persistent: H near 1
        df = self._series(spark, noise.tolist(), user=1).union(
            self._series(spark, walk.tolist(), user=2))
        out = {r.user_id: r.hurst
               for r in hurst_rs(df, "ts", "value",
                                 ["user_id"]).collect()}
        assert out[2] > out[1]
        assert out[2] > 0.7

    def test_constant_series_dropped(self, spark):
        from orange3_timeseries_spark.operators.stattests import hurst_rs

        df = self._series(spark, [5.0] * 20)
        assert hurst_rs(df, "ts", "value", ["user_id"]).count() == 0


class TestBigramPMI:
    def test_collocation_ranks_top_and_matches_reference(self, spark):
        import math
        from collections import Counter

        from orange3_timeseries_spark.operators.text import bigram_pmi

        rng = np.random.RandomState(2)
        filler = ["the", "a", "of", "to", "and", "in", "it", "is"]
        texts = []
        for _ in range(30):
            words = list(rng.choice(filler, size=40))
            words[10:12] = ["san", "francisco"]   # planted collocation
            texts.append(" ".join(words))
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        out = bigram_pmi(df, "text", min_count=5, top_k=10).collect()
        assert out[0].tok_a == "san" and out[0].tok_b == "francisco"

        # direct PMI reference for the planted pair
        toks = [t.split() for t in texts]
        uni = Counter(w for ws in toks for w in ws)
        big = Counter((ws[i], ws[i + 1]) for ws in toks
                      for i in range(len(ws) - 1))
        T_ = sum(uni.values())
        B_ = sum(big.values())
        exp = math.log((big[("san", "francisco")] / B_)
                       / ((uni["san"] / T_) * (uni["francisco"] / T_)))
        assert out[0].pmi == pytest.approx(exp, abs=1e-5)
        assert out[0].pair_count == 30

    def test_min_count_floor(self, spark):
        from orange3_timeseries_spark.operators.text import bigram_pmi

        df = spark.createDataFrame(
            [(0, "rare pair here"), (1, "common bit common bit "
                                        "common bit common bit common bit")],
            "doc_id long, text string")
        out = bigram_pmi(df, "text", min_count=5, top_k=10).collect()
        pairs = {(r.tok_a, r.tok_b) for r in out}
        assert ("rare", "pair") not in pairs
        assert ("common", "bit") in pairs
