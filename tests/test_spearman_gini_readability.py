"""Spearman rank correlation, Gini concentration, Flesch readability."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.profile import gini_concentration
from orange3_timeseries_spark.operators.stattests import spearman_corr
from orange3_timeseries_spark.operators.text import readability


class TestSpearman:
    def _df(self, spark, xs, ys, sid="a"):
        rows = [(sid, float(x), float(y)) for x, y in zip(xs, ys)]
        return spark.createDataFrame(rows, ["sid", "x", "y"])

    def test_perfect_monotone(self, spark):
        xs = np.arange(20.0)
        ys = np.exp(xs / 5.0)          # nonlinear but monotone
        row = spearman_corr(self._df(spark, xs, ys), "x", "y",
                            ["sid"]).collect()[0]
        assert row["spearman"] == pytest.approx(1.0)
        row = spearman_corr(self._df(spark, xs, -ys), "x", "y",
                            ["sid"]).collect()[0]
        assert row["spearman"] == pytest.approx(-1.0)

    def test_matches_scipy_formula_with_ties(self, spark):
        rng = np.random.RandomState(6)
        xs = np.round(rng.normal(size=40), 1)   # forces ties
        ys = np.round(xs + rng.normal(size=40), 1)
        row = spearman_corr(self._df(spark, xs, ys), "x", "y",
                            ["sid"]).collect()[0]

        def avg_ranks(v):
            order = np.argsort(v, kind="stable")
            ranks = np.empty(len(v))
            sv = v[order]
            i = 0
            while i < len(v):
                j = i
                while j < len(v) and sv[j] == sv[i]:
                    j += 1
                ranks[order[i:j]] = (i + 1 + j) / 2.0
                i = j
        # direct Pearson on average ranks
            return ranks
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        ref = np.corrcoef(rx, ry)[0, 1]
        assert row["spearman"] == pytest.approx(ref, abs=1e-6)

    def test_constant_column_null(self, spark):
        row = spearman_corr(self._df(spark, [1.0] * 10, range(10)),
                            "x", "y", ["sid"]).collect()[0]
        assert row["spearman"] is None


class TestGini:
    def _df(self, spark, sizes, g="s"):
        return spark.createDataFrame([(g, int(s)) for s in sizes],
                                     ["src", "sz"])

    def test_equal_sizes_zero(self, spark):
        row = gini_concentration(self._df(spark, [100] * 10), "sz",
                                 ["src"]).collect()[0]
        assert row["gini"] == pytest.approx(0.0)
        assert row["n_items"] == 10 and row["total_size"] == 1000

    def test_one_holds_all_near_one(self, spark):
        row = gini_concentration(self._df(spark, [0] * 19 + [1000]),
                                 "sz", ["src"]).collect()[0]
        assert row["gini"] == pytest.approx(0.95)   # (n-1)/n

    def test_matches_direct_formula(self, spark):
        rng = np.random.RandomState(3)
        sizes = rng.randint(1, 5000, 200)
        row = gini_concentration(self._df(spark, sizes), "sz",
                                 ["src"]).collect()[0]
        x = np.sort(sizes)
        n = len(x)
        ref = (np.sum((2 * np.arange(1, n + 1) - n - 1) * x)
               / (n * x.sum()))
        assert row["gini"] == pytest.approx(ref, abs=1e-6)


class TestReadability:
    def test_simple_vs_dense(self, spark):
        rows = [
            (1, "The cat sat on the mat. It was fat. It sat a lot."),
            (2, "Notwithstanding heterogeneous organizational "
                "prioritization methodologies, infrastructural "
                "interoperability considerations predominate."),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               readability(df, "text", "doc_id").collect()}
        assert out[1]["flesch"] > 80
        assert out[2]["flesch"] < 0
        assert out[1]["n_sentences"] == 3

    def test_hand_counts(self, spark):
        df = spark.createDataFrame([(1, "hello world. goodbye!")],
                                   "doc_id long, text string")
        r = readability(df, "text", "doc_id").collect()[0]
        assert r["n_words"] == 3
        assert r["n_sentences"] == 2
        # hello: e,o -> 2; world.: o -> 1; goodbye!: oo,ye -> 2
        assert r["n_syllables"] == 5
        w, s, syl = 3, 2, 5
        ref = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        assert r["flesch"] == pytest.approx(round(ref, 6))

    def test_no_terminal_punct_one_sentence(self, spark):
        df = spark.createDataFrame([(1, "just some words here")],
                                   "doc_id long, text string")
        r = readability(df, "text", "doc_id").collect()[0]
        assert r["n_sentences"] == 1
