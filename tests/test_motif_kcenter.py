"""Matrix profile, greedy k-center selection, BPE fertility."""

import datetime as dt

import numpy as np
import pytest

from orange3_timeseries_spark.operators.motif import matrix_profile
from orange3_timeseries_spark.operators.similarity import kcenter_select


def _series_df(spark, values, sid="a"):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(sid, t0 + dt.timedelta(hours=i), float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def _np_matrix_profile(x, m=8, excl=4):
    """Direct reference mirroring the operator's micro-unit contract."""
    n = len(x)
    zs = {}
    for i in range(n - m + 1):
        w = np.asarray(x[i:i + m], dtype=float)
        mu = round(w.mean(), 6)
        sg = round(w.std(), 6)
        if sg > 0:
            zs[i] = (w - mu) / sg
    out = {}
    for i, za in zs.items():
        best = None
        for j, zb in zs.items():
            if abs(i - j) < excl:
                continue
            u = int(sum(int(round(d * d * 1e7)) for d in za - zb))
            if best is None or (u, j) < best:
                best = (u, j)
        if best is not None:
            out[i] = (best[1], round(float(np.sqrt(best[0] / 1e7)), 6))
    return out


class TestMatrixProfile:
    def test_planted_motif_and_discord(self, spark):
        rng = np.random.RandomState(11)
        x = rng.normal(0, 1, 64)
        motif = np.array([0, 5, 0, -5, 0, 5, 0, -5], dtype=float)
        x[4:12] = motif
        x[40:48] = motif          # planted exact repeat
        df = _series_df(spark, x)
        prof = {r["idx"]: (r["nn_idx"], r["nn_dist"])
                for r in matrix_profile(df, "ts", "value",
                                        ["user_id"]).collect()}
        assert prof[4][0] == 40 and prof[40][0] == 4
        assert prof[4][1] == pytest.approx(0.0, abs=1e-4)
        # motif windows sit far below the series median profile value
        med = float(np.median([d for _, d in prof.values()]))
        assert prof[4][1] < med / 4

    def test_matches_direct_reference(self, spark):
        rng = np.random.RandomState(3)
        x = rng.normal(size=40)
        df = _series_df(spark, x)
        got = {r["idx"]: (r["nn_idx"], r["nn_dist"])
               for r in matrix_profile(df, "ts", "value",
                                       ["user_id"]).collect()}
        ref = _np_matrix_profile(x)
        assert set(got) == set(ref)
        for i in ref:
            assert got[i][0] == ref[i][0], i
            assert got[i][1] == pytest.approx(ref[i][1], abs=2e-6)

    def test_constant_windows_excluded(self, spark):
        x = np.zeros(30)
        x[20:] = np.arange(10)
        df = _series_df(spark, x)
        out = matrix_profile(df, "ts", "value", ["user_id"]).collect()
        ref = _np_matrix_profile(x)
        assert {r["idx"] for r in out} == set(ref)

    def test_max_n_capped_series_emits_sentinel(self, spark):
        # no-silent-caps rule: a series past max_n must still appear —
        # as one sentinel row (idx=-1, nn_idx=length, NULL dist)
        df = _series_df(spark, np.arange(30.0))
        out = matrix_profile(df, "ts", "value", ["user_id"],
                             max_n=20).collect()
        assert len(out) == 1
        row = out[0]
        assert row["idx"] == -1
        assert row["nn_idx"] == 30
        assert row["nn_dist"] is None

    def test_max_n_mixed_lengths(self, spark):
        # short series keeps its full profile alongside the capped
        # series' sentinel
        rng = np.random.RandomState(7)
        short = _series_df(spark, rng.normal(size=16), sid="s")
        long = _series_df(spark, rng.normal(size=25), sid="l")
        out = matrix_profile(short.unionByName(long), "ts", "value",
                             ["user_id"], max_n=20).collect()
        by_sid = {}
        for r in out:
            by_sid.setdefault(r["user_id"], []).append(r)
        assert [r["idx"] for r in by_sid["l"]] == [-1]
        assert by_sid["l"][0]["nn_idx"] == 25
        short_vals = list(short.toPandas().sort_values("ts")["value"])
        ref = _np_matrix_profile(short_vals)
        assert {r["idx"] for r in by_sid["s"]} == set(ref)


class TestKCenter:
    def _emb_df(self, spark, vecs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_picks_one_per_cluster(self, spark):
        # three orthogonal directions, several near-duplicates each
        base = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
        vecs = []
        for c in range(3):
            for j in range(4):
                v = np.array(base[c]) * 5 + np.array(
                    [0.01 * j, 0.02 * j, 0.015 * j])
                vecs.append(v)
        df = self._emb_df(spark, vecs)
        out = kcenter_select(df, "embedding", "vec_id", k=3).collect()
        clusters = {r["vec_id"] // 4 for r in out}
        assert clusters == {0, 1, 2}
        assert [r["sel_order"] for r in
                sorted(out, key=lambda r: r["sel_order"])] == [1, 2, 3]

    def test_seed_is_lowest_id_and_radius_monotone(self, spark):
        rng = np.random.RandomState(5)
        df = self._emb_df(spark, rng.normal(size=(30, 8)))
        out = sorted(kcenter_select(df, "embedding", "vec_id", k=6)
                     .collect(), key=lambda r: r["sel_order"])
        assert out[0]["vec_id"] == 0 and out[0]["sel_dist"] is None
        dists = [r["sel_dist"] for r in out[1:]]
        assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))
        # selected ids are distinct
        assert len({r["vec_id"] for r in out}) == 6

    def test_zero_vectors_excluded(self, spark):
        vecs = [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [3.0, 3.0]]
        df = self._emb_df(spark, vecs)
        out = kcenter_select(df, "embedding", "vec_id", k=4).collect()
        ids = {r["vec_id"] for r in out}
        assert 0 not in ids and len(out) == 3

    def test_sample_prestep_matches_manual_hash_sample(self, spark):
        # kcenter_select(sample=r) == hash_sample first, then select:
        # the pre-step is the deterministic coreset-of-a-sample route
        from orange3_timeseries_spark.operators.sampling import (
            hash_sample,
        )
        rng = np.random.RandomState(9)
        df = self._emb_df(spark, rng.normal(size=(60, 8)))
        via_param = sorted(
            (r["sel_order"], r["vec_id"], r["sel_dist"]) for r in
            kcenter_select(df, "embedding", "vec_id", k=5,
                           sample=0.5).collect())
        manual = sorted(
            (r["sel_order"], r["vec_id"], r["sel_dist"]) for r in
            kcenter_select(hash_sample(df, "vec_id", 0.5),
                           "embedding", "vec_id", k=5).collect())
        assert via_param == manual
        # and the sample genuinely restricts the candidate pool
        kept = {r["vec_id"] for r in
                hash_sample(df, "vec_id", 0.5).collect()}
        assert {v for _, v, _ in via_param} <= kept
        assert 0 < len(kept) < 60


class TestBpeFertility:
    def test_hand_computed(self, spark):
        from orange3_timeseries_spark.operators.bpe import (
            bpe_fertility,
            train_bpe,
        )
        rows = [(1, "aa aa aa bb"), (2, "aa x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = train_bpe(df, "text", n_merges=1)
        assert merges == [("a", "a")]
        out = {r["doc_id"]: r for r in
               bpe_fertility(df, "doc_id", "text", merges).collect()}
        # doc 1: aa->1 token x3, bb->2 tokens; 4 words, 5 tokens,
        # unmerged multi-char words: bb only
        assert out[1]["n_words"] == 4
        assert out[1]["n_tokens"] == 5
        assert out[1]["n_unmerged"] == 1
        assert out[1]["fertility"] == pytest.approx(1.25)
        assert out[1]["unmerged_ratio"] == pytest.approx(0.25)
        # doc 2: aa->1, x/y/z single-char (never "unmerged"); ratio
        # divides by the 1 multi-char word
        assert out[2]["n_words"] == 4
        assert out[2]["n_tokens"] == 4
        assert out[2]["n_unmerged"] == 0
        assert out[2]["unmerged_ratio"] == pytest.approx(0.0)

    def test_all_single_char_words_null_ratio(self, spark):
        from orange3_timeseries_spark.operators.bpe import bpe_fertility
        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        row = bpe_fertility(df, "doc_id", "text", []).collect()[0]
        assert row["unmerged_ratio"] is None
        assert row["fertility"] == pytest.approx(1.0)
