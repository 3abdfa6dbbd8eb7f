"""JS divergence vs a direct numpy reference; centroid-cosine geometry."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _occ_df(spark, rows):
    return spark.createDataFrame(rows, "g string, item string")


def _js_reference(occ, top_k=100):
    """Direct JS per group over the global top-K support."""
    from collections import Counter
    gc = Counter(i for _, i in occ)
    support = sorted(gc, key=lambda i: (-gc[i], i))[:top_k]
    G = sum(gc[i] for i in support)
    out = {}
    for g in {g for g, _ in occ}:
        pc = Counter(i for gg, i in occ if gg == g and i in support)
        st = sum(pc.values())
        js = 0.0
        for i in support:
            p = pc[i] / st if st else 0.0
            q = gc[i] / G
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            js += 0.5 * q * math.log(q / m)
        out[g] = (st, js)
    return out


class TestJsDivergence:
    def test_single_group_is_zero(self, spark):
        from orange3_timeseries_spark.operators.drift import js_divergence

        occ = [("a", t) for t in ["x", "y", "z", "x", "y", "x"]]
        r = js_divergence(_occ_df(spark, occ), "g", "item").collect()
        assert len(r) == 1
        assert r[0].js_divergence == pytest.approx(0.0, abs=1e-9)
        assert r[0].js_distance == pytest.approx(0.0, abs=1e-9)
        assert r[0].n_in_support == 6

    def test_matches_direct_reference(self, spark):
        from orange3_timeseries_spark.operators.drift import js_divergence

        rng = np.random.RandomState(13)
        vocab = [f"t{i}" for i in range(30)]
        occ = []
        for g, bias in (("a", 0.0), ("b", 1.5), ("c", 3.0)):
            w = np.exp(-np.abs(np.arange(30) - 10 * bias) / 5.0)
            w /= w.sum()
            for i in rng.choice(30, size=400, p=w):
                occ.append((g, vocab[i]))
        ref = _js_reference(occ, top_k=20)
        got = {r.g: r for r in js_divergence(
            _occ_df(spark, occ), "g", "item", top_k=20).collect()}
        assert set(got) == set(ref)
        for g, (st, js) in ref.items():
            assert got[g].n_in_support == st
            assert got[g].js_divergence == pytest.approx(js, abs=1e-5)
            assert got[g].js_distance == pytest.approx(
                math.sqrt(max(round(js, 6), 0.0)), abs=1e-5)

    def test_disjoint_groups_bounded_by_ln2(self, spark):
        from orange3_timeseries_spark.operators.drift import js_divergence

        occ = [("a", f"x{i}") for i in range(50)] \
            + [("b", f"y{i}") for i in range(50)]
        got = {r.g: r.js_divergence for r in js_divergence(
            _occ_df(spark, occ), "g", "item").collect()}
        # each group holds half the pooled mass: JS(group, pooled) =
        # 0.5·ln 2 + 0.25·ln(1/2·2) ... = direct reference value
        ref = _js_reference(occ)
        for g in ("a", "b"):
            assert got[g] == pytest.approx(ref[g][1], abs=1e-6)
            assert got[g] <= math.log(2.0) + 1e-9

    def test_top_k_restricts_support(self, spark):
        from orange3_timeseries_spark.operators.drift import js_divergence

        # 'rare' appears once — outside top_k=2 support it must not count
        occ = ([("a", "x")] * 5 + [("a", "y")] * 3 + [("a", "rare")]
               + [("b", "x")] * 4 + [("b", "y")] * 4)
        got = {r.g: r for r in js_divergence(
            _occ_df(spark, occ), "g", "item", top_k=2).collect()}
        assert got["a"].n_in_support == 8   # rare excluded
        ref = _js_reference(occ, top_k=2)
        for g in ("a", "b"):
            assert got[g].js_divergence == pytest.approx(
                ref[g][1], abs=1e-6)


class TestCentroidCosine:
    def _emb_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_orthogonal_and_parallel_centroids(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            centroid_cosine,
        )

        rows = [
            # label 0 centroid -> [1, 0]; label 1 -> [0, 1]; label 2 ->
            # [2, 0] (parallel to label 0)
            (1, [2.0, 0.0], 0), (2, [0.0, 0.0], 0),
            (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1),
            (5, [2.0, 0.0], 2),
        ]
        out = {(r.label_a, r.label_b): r.cosine
               for r in centroid_cosine(self._emb_df(spark, rows),
                                        "embedding", "label").collect()}
        assert set(out) == {(0, 1), (0, 2), (1, 2)}
        assert out[(0, 1)] == pytest.approx(0.0, abs=1e-9)
        assert out[(0, 2)] == pytest.approx(1.0, abs=1e-9)
        assert out[(1, 2)] == pytest.approx(0.0, abs=1e-9)

    def test_matches_numpy_centroids(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            centroid_cosine,
        )

        rng = np.random.RandomState(3)
        rows, vecs = [], {}
        vid = 0
        for lab in range(4):
            vs = rng.standard_normal((6, 8)).astype(np.float32)
            vecs[lab] = vs
            for v in vs:
                rows.append((vid, [float(x) for x in v], lab))
                vid += 1
        out = {(r.label_a, r.label_b): r.cosine
               for r in centroid_cosine(self._emb_df(spark, rows),
                                        "embedding", "label").collect()}
        for a in range(4):
            for b in range(a + 1, 4):
                ca = np.round(vecs[a].astype(np.float64).mean(axis=0), 7)
                cb = np.round(vecs[b].astype(np.float64).mean(axis=0), 7)
                exp = (round(float(ca @ cb), 7)
                       / math.sqrt(round(float(ca @ ca), 7)
                                   * round(float(cb @ cb), 7)))
                assert out[(a, b)] == pytest.approx(exp, abs=1e-5)
