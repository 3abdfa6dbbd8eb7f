"""Similarity-search tier: exactness of brute force, recall behavior of
the approximate paths (LSH, IVF), and determinism of the quantizers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(0)
    # 8 clusters in 16-d so ANN recall is meaningful
    centers = rng.standard_normal((8, 16)) * 3
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = c + rng.standard_normal(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries(df, n=8):
    return (df.where(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("query_id"), "embedding"))


class TestANN:
    def test_bruteforce_exact(self, spark, emb_df):
        out = brute_force_topk(emb_df, _queries(emb_df), k=3).toPandas()
        assert len(out) == 8 * 3
        assert set(out["rank"]) == {1, 2, 3}
        # top neighbor of each query is in its own cluster (mod 8)
        top = out[out["rank"] == 1]
        for _, r in top.iterrows():
            assert r.nn_id % 8 == r.query_id % 8

    def test_ivf_recall(self, spark, emb_df):
        exact = brute_force_topk(emb_df, _queries(emb_df), k=5).toPandas()
        approx = ivf_topk(emb_df, _queries(emb_df), k=5, n_centroids=8,
                          nprobe=2, seed=7).toPandas()
        e = {(r.query_id, r.nn_id) for _, r in exact.iterrows()}
        a = {(r.query_id, r.nn_id) for _, r in approx.iterrows()}
        recall = len(e & a) / len(e)
        assert recall >= 0.8, f"IVF recall {recall}"
        # approximate scores are real cosines — agree with exact where found
        m = exact.merge(approx, on=["query_id", "nn_id"], suffixes=("", "_a"))
        np.testing.assert_allclose(m["cosine"], m["cosine_a"], atol=1e-6)

    def test_ivf_deterministic(self, spark, emb_df):
        c1 = train_ivf_centroids(emb_df, n_centroids=8, seed=7)
        c2 = train_ivf_centroids(emb_df, n_centroids=8, seed=7)
        np.testing.assert_array_equal(np.array(c1), np.array(c2))

    def test_lsh_subset_and_scores(self, spark, emb_df):
        exact = brute_force_topk(emb_df, _queries(emb_df), k=5).toPandas()
        approx = lsh_topk(emb_df, _queries(emb_df), k=5, n_planes=4,
                          dim=16).toPandas()
        m = exact.merge(approx, on=["query_id", "nn_id"], suffixes=("", "_a"))
        if len(m):
            np.testing.assert_allclose(m["cosine"], m["cosine_a"], atol=1e-6)


class TestPQ:
    def _books(self, emb_df, M=4, K=16):
        from orange3_timeseries_spark.operators.similarity import (
            train_pq_codebooks,
        )
        return train_pq_codebooks(emb_df, n_subspaces=M, n_centroids=K,
                                  seed=7)

    def test_pq_encode_shape_and_determinism(self, spark, emb_df):
        from orange3_timeseries_spark.operators.similarity import pq_encode

        books = self._books(emb_df)
        a = {r.vec_id: list(r.pq_code)
             for r in pq_encode(emb_df, books).collect()}
        b = {r.vec_id: list(r.pq_code)
             for r in pq_encode(emb_df, books).collect()}
        assert a == b and len(a) == 400
        for code in a.values():
            assert len(code) == 4
            assert all(0 <= c < 16 for c in code)

    def test_pq_centroid_encodes_to_itself(self, spark, emb_df):
        """A vector equal to centroid j in every subspace must encode to
        [j]*M (distance exactly 0, argmin first-match tie-break)."""
        from orange3_timeseries_spark.operators.similarity import pq_encode

        books = self._books(emb_df)
        flat = [x for m in range(4) for x in books[m][3]]
        df = spark.createDataFrame([(0, [float(x) for x in flat])],
                                   "vec_id long, embedding array<double>")
        [row] = pq_encode(df, books).collect()
        assert list(row.pq_code) == [3, 3, 3, 3]

    def test_pq_topk_adc_exact_and_cluster_recall(self, spark, emb_df):
        """ADC scores must equal the numpy reference exactly, and the
        retrieved neighbors must come from the query's true cluster.

        (Plain recall@5 vs exact L2 is NOT asserted: every same-cluster
        vector quantizes to the same code here, so ADC ties cannot
        distinguish within-cluster order — inherent PQ resolution, not
        an operator defect.)"""
        from orange3_timeseries_spark.operators.similarity import (
            pq_encode,
            pq_topk,
        )

        books = self._books(emb_df)
        approx = pq_topk(emb_df, _queries(emb_df), books, k=5).toPandas()
        X = np.array(
            [r.embedding for r in
             emb_df.orderBy("vec_id").select("embedding").collect()],
            dtype=np.float64)
        codes = {r.vec_id: list(r.pq_code)
                 for r in pq_encode(emb_df, books).collect()}
        B = [np.array(b) for b in books]

        def adc(qi, xi):
            return sum(
                ((X[qi, m * 4:(m + 1) * 4] - B[m][codes[xi][m]]) ** 2).sum()
                for m in range(4))

        for _, r in approx.iterrows():
            np.testing.assert_allclose(
                r.approx_l2, adc(int(r.query_id), int(r.nn_id)), atol=1e-6)
        # retrieved neighbors live in the query's true cluster (i % 8)
        same = sum(int(r.nn_id) % 8 == int(r.query_id) % 8
                   for _, r in approx.iterrows())
        assert same / len(approx) >= 0.9
        for qid, grp in approx.groupby("query_id"):
            assert sorted(grp["rank"]) == [1, 2, 3, 4, 5]
            assert grp.sort_values("rank")["approx_l2"].is_monotonic_increasing


class TestIVFPQ:
    def test_ivfpq_cluster_recall_and_agreement(self, spark, emb_df):
        """Composite IVF-PQ: retrieved neighbors come from the query's
        true cluster, ranks are well-formed, and restricting PQ's ADC
        to IVF probe lists loses nothing vs plain pq_topk when the
        probes cover the query's cluster (nprobe=8 of 8 = exhaustive
        probing makes the candidate sets identical, so the two results
        must agree exactly)."""
        from orange3_timeseries_spark.operators.similarity import (
            ivfpq_topk,
            pq_topk,
            train_ivf_centroids,
            train_pq_codebooks,
        )

        books = train_pq_codebooks(emb_df, n_subspaces=4, n_centroids=16,
                                   seed=7)
        cents = train_ivf_centroids(emb_df, n_centroids=8, seed=7)
        out = ivfpq_topk(emb_df, _queries(emb_df), books, k=5,
                         nprobe=2, centroids=cents).toPandas()
        same = sum(int(r.nn_id) % 8 == int(r.query_id) % 8
                   for _, r in out.iterrows())
        assert same / len(out) >= 0.9
        for qid, grp in out.groupby("query_id"):
            assert sorted(grp["rank"]) == [1, 2, 3, 4, 5]
            assert grp.sort_values("rank")["approx_l2"] \
                .is_monotonic_increasing
        # exhaustive probing == plain PQ (identical candidates + ADC)
        full = ivfpq_topk(emb_df, _queries(emb_df), books, k=5,
                          nprobe=8, centroids=cents).toPandas()
        plain = pq_topk(emb_df, _queries(emb_df), books, k=5).toPandas()
        key = ["query_id", "rank"]
        f = full.sort_values(key).reset_index(drop=True)
        p = plain.sort_values(key).reset_index(drop=True)
        assert (f["nn_id"] == p["nn_id"]).all()
        np.testing.assert_allclose(f["approx_l2"], p["approx_l2"],
                                   atol=1e-9)

    def test_ivfpq_index_one_pass_layout(self, spark, emb_df):
        """The index is (id, centroid_id, pq_code) — skinny payload,
        single Arrow stage, consistent with the standalone assigners."""
        from orange3_timeseries_spark.operators.similarity import (
            _assign_centroid,
            ivfpq_index,
            pq_encode,
            train_ivf_centroids,
            train_pq_codebooks,
        )

        books = train_pq_codebooks(emb_df, n_subspaces=4, n_centroids=16,
                                   seed=7)
        cents = train_ivf_centroids(emb_df, n_centroids=8, seed=7)
        idx = ivfpq_index(emb_df, cents, books).toPandas()
        assert list(idx.columns) == ["vec_id", "centroid_id", "pq_code"]
        assert len(idx) == emb_df.count()
        assert idx["centroid_id"].between(0, 7).all()
        # agrees with the standalone centroid assigner and PQ encoder
        solo_assign = _assign_centroid(
            emb_df.select("vec_id",
                          F.transform("embedding",
                                      lambda x: x.cast("double"))
                          .alias("v")), "v", cents).toPandas()
        m = idx.merge(solo_assign[["vec_id", "centroid_id"]],
                      on="vec_id", suffixes=("", "_solo"))
        assert (m["centroid_id"] == m["centroid_id_solo"]).all()
        solo_codes = {r.vec_id: list(r.pq_code)
                      for r in pq_encode(emb_df, books).collect()}
        for _, r in idx.iterrows():
            assert list(r.pq_code) == solo_codes[r.vec_id]


class TestSemanticDedup:
    def test_planted_duplicates_dropped_keep_lowest_id(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            semantic_dedup_flags,
        )

        rng = np.random.RandomState(2)
        base = rng.standard_normal((12, 8)).astype("float32")
        rows = [(i, base[i].tolist()) for i in range(12)]
        rows.append((100, base[3].tolist()))   # exact dup of id 3
        rows.append((101, (base[5] * 2.0).tolist()))  # scaled: cos = 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        out = {r.vec_id: r for r in semantic_dedup_flags(
            df, n_centroids=4, tau=0.99).collect()}
        assert len(out) == 14  # one row per vector
        assert out[3].is_kept and not out[100].is_kept
        assert out[5].is_kept and not out[101].is_kept
        # originals with no high-cos partner survive
        assert sum(not r.is_kept for r in out.values()) == 2

    def test_cross_cluster_pairs_never_compared(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            semantic_dedup_flags,
        )

        # two tight groups far apart: with 2 centroids every vector's
        # only high-cos partner is in its own cluster; tau low enough
        # that WITHIN-cluster neighbors all pair up
        a = [[10.0, 0.0, 0.1 * i, 0.0] for i in range(4)]
        b = [[0.0, 10.0, 0.0, 0.1 * i] for i in range(4)]
        rows = [(i, v) for i, v in enumerate(a + b)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        out = {r.vec_id: r for r in semantic_dedup_flags(
            df, n_centroids=2, tau=0.9).collect()}
        kept = [i for i, r in out.items() if r.is_kept]
        # each tight group keeps exactly its lowest id
        assert sorted(kept) == [0, 4]


class TestRangeSearch:
    def test_subset_of_brute_force_and_radius_respected(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_range_search,
        )

        rng = np.random.RandomState(4)
        X = rng.standard_normal((80, 16)).astype("float64")
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(80)],
            "vec_id long, embedding array<double>")
        qs = (df.where(F.col("vec_id") < 5)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
        got = ivf_range_search(df, qs, radius=0.3, n_centroids=8,
                               nprobe=3).collect()
        norms = np.linalg.norm(X, axis=1)
        cos = (X @ X.T) / np.outer(norms, norms)
        exact = {(q, j) for q in range(5) for j in range(80)
                 if j != q and round(cos[q, j], 6) >= 0.3}
        assert {(r.query_id, r.nn_id) for r in got} <= exact
        assert all(r.cosine >= 0.3 for r in got)

    def test_full_probe_equals_exact(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_range_search,
        )

        rng = np.random.RandomState(9)
        X = rng.standard_normal((40, 8)).astype("float64")
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(40)],
            "vec_id long, embedding array<double>")
        qs = (df.where(F.col("vec_id") < 3)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
        got = {(r.query_id, r.nn_id) for r in ivf_range_search(
            df, qs, radius=0.2, n_centroids=4, nprobe=4).collect()}
        norms = np.linalg.norm(X, axis=1)
        cos = (X @ X.T) / np.outer(norms, norms)
        exact = {(q, j) for q in range(3) for j in range(40)
                 if j != q and round(cos[q, j], 6) >= 0.2}
        assert got == exact  # nprobe = n_centroids: no recall loss


class TestPcaTopComponent:
    def test_matches_numpy_eigenvector(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            pca_top_component,
        )

        rng = np.random.RandomState(6)
        direction = rng.standard_normal(12)
        direction /= np.linalg.norm(direction)
        X = (rng.standard_normal((300, 1)) * 5.0 * direction
             + rng.standard_normal((300, 12)) * 0.3)
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(300)],
            "vec_id long, embedding array<double>")
        v, lam, share, m = pca_top_component(df, "embedding", iters=8)

        Xc = X - X.mean(0)
        w, V = np.linalg.eigh(np.cov(Xc.T, bias=True))
        top = V[:, -1]
        got = np.array(v)
        if np.dot(got, top) < 0:
            top = -top
        assert np.allclose(got, top, atol=5e-3)
        assert lam == pytest.approx(w[-1], rel=2e-3)
        assert 0.9 < share <= 1.0  # dominant direction
        assert np.allclose(m, X.mean(0), atol=1e-6)

    def test_unit_norm_and_sign_convention(self, spark):
        from orange3_timeseries_spark.operators.similarity import (
            pca_top_component,
        )

        rng = np.random.RandomState(8)
        X = rng.standard_normal((100, 6))
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(100)],
            "vec_id long, embedding array<double>")
        v, lam, share, _ = pca_top_component(df, "embedding", iters=8)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)
        piv = max(range(6), key=lambda i: (abs(v[i]), -i))
        assert v[piv] > 0


class TestTwoLevelAssign:
    def test_duplicates_coroute_and_deterministic(self, spark):
        import numpy as np
        from orange3_timeseries_spark.operators.similarity import (
            semantic_dedup_flags, train_ivf_centroids,
        )

        rng = np.random.RandomState(11)
        base = rng.uniform(-1, 1, (400, 16)).round(4)
        base[50] = base[10]          # exact duplicate pair
        base[300] = base[200]
        rows = [(i, base[i].tolist()) for i in range(len(base))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = train_ivf_centroids(df, "embedding", 25, id_col="vec_id")
        out = semantic_dedup_flags(df, n_centroids=25, tau=0.999,
                                   centroids=cents,
                                   two_level_assign=True)
        rows1 = {r["vec_id"]: (r["centroid_id"], r["is_kept"])
                 for r in out.collect()}
        # complete partition
        assert len(rows1) == 400
        # identical vectors route to the same cell; the higher id drops
        assert rows1[10][0] == rows1[50][0]
        assert rows1[10][1] and not rows1[50][1]
        assert rows1[200][0] == rows1[300][0]
        assert rows1[200][1] and not rows1[300][1]
        # deterministic across runs
        rows2 = {r["vec_id"]: (r["centroid_id"], r["is_kept"])
                 for r in semantic_dedup_flags(
                     df, n_centroids=25, tau=0.999, centroids=cents,
                     two_level_assign=True).collect()}
        assert rows1 == rows2

    def test_small_k_falls_back_to_flat(self, spark):
        import numpy as np
        from orange3_timeseries_spark.operators.similarity import (
            semantic_dedup_flags, train_ivf_centroids,
        )

        rng = np.random.RandomState(5)
        rows = [(i, rng.uniform(-1, 1, 8).round(4).tolist())
                for i in range(120)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = train_ivf_centroids(df, "embedding", 8, id_col="vec_id")
        flat = semantic_dedup_flags(df, n_centroids=8, tau=0.9,
                                    centroids=cents).collect()
        two = semantic_dedup_flags(df, n_centroids=8, tau=0.9,
                                   centroids=cents,
                                   two_level_assign=True).collect()
        # k < 16 -> the two-level dial is a no-op, results identical
        assert sorted(map(tuple, flat)) == sorted(map(tuple, two))


class TestIvfIndexRegistry:
    def _index(self, spark, emb_df, tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_build_index,
            read_ivf_index,
            write_ivf_index,
        )

        cents = train_ivf_centroids(emb_df, n_centroids=16,
                                    id_col="vec_id")
        idx = ivf_build_index(emb_df, centroids=cents)
        path = str(tmp_path / "ivf_index")
        write_ivf_index(idx, path)
        return cents, read_ivf_index(spark, path)

    def test_served_bit_identical_to_live(self, spark, emb_df,
                                          tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_topk_from_index,
        )

        cents, idx = self._index(spark, emb_df, tmp_path)
        qs = _queries(emb_df)
        live = ivf_topk(emb_df, qs, k=5, nprobe=4, centroids=cents)
        served = ivf_topk_from_index(idx, qs, k=5, nprobe=4)
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        lrows = [(r["query_id"], r["nn_id"], r["cosine"], r["rank"])
                 for r in sorted(live.collect(), key=key)]
        srows = [(r["query_id"], r["nn_id"], r["cosine"], r["rank"])
                 for r in sorted(served.collect(), key=key)]
        assert lrows and lrows == srows

    def test_partition_prune_plan_and_equivalence(self, spark, emb_df,
                                                  tmp_path):
        import re

        from orange3_timeseries_spark.operators.similarity import (
            ivf_topk_from_index,
        )

        _, idx = self._index(spark, emb_df, tmp_path)
        qs = _queries(emb_df, n=2)
        a = ivf_topk_from_index(idx, qs, k=3, nprobe=2,
                                prune_partitions=True)
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert re.search(
            r"PartitionFilters: \[[^\]]*centroid_id#\d+ (=|IN)", plan)
        b = ivf_topk_from_index(idx, qs, k=3, nprobe=2,
                                prune_partitions=False)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_state_tables_shape(self, spark, emb_df, tmp_path):
        cents, idx = self._index(spark, emb_df, tmp_path)
        assert idx.centroids.count() == 16
        # every corpus vector is inverted-listed exactly once
        assert idx.lists.count() == emb_df.count()
        cids = {r["centroid_id"] for r in
                idx.lists.select("centroid_id").distinct().collect()}
        assert cids <= set(range(16))
        # centroids round-trip exactly
        got = {r["centroid_id"]: r["centroid"]
               for r in idx.centroids.collect()}
        for i, c in enumerate(cents):
            assert got[i] == [float(x) for x in c]


class TestPqIndexRegistry:
    def _books(self, emb_df, M=4, ds=4):
        rows = (emb_df.where(F.col("vec_id") < 8).orderBy("vec_id")
                .select("embedding").collect())
        return [[[float(x) for x in r.embedding[m * ds:(m + 1) * ds]]
                 for r in rows] for m in range(M)]

    def _index(self, spark, emb_df, tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            pq_build_index,
            read_pq_index,
            write_pq_index,
        )

        books = self._books(emb_df)
        idx = pq_build_index(emb_df, codebooks=books)
        path = str(tmp_path / "pq_index")
        write_pq_index(idx, path)
        return books, read_pq_index(spark, path)

    def test_served_bit_identical_to_live(self, spark, emb_df,
                                          tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            pq_topk, pq_topk_from_index,
        )

        books, idx = self._index(spark, emb_df, tmp_path)
        qs = _queries(emb_df)
        live = pq_topk(emb_df, qs, books, k=5)
        served = pq_topk_from_index(idx, qs, k=5)
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        lrows = sorted(map(tuple, live.collect()), key=lambda t: t[:2])
        srows = sorted(map(tuple, served.collect()),
                       key=lambda t: t[:2])
        assert lrows and lrows == srows

    def test_codebooks_round_trip_exactly(self, spark, emb_df,
                                          tmp_path):
        books, idx = self._index(spark, emb_df, tmp_path)
        assert idx.codebooks == books

    def test_serve_plan_reads_codes_only(self, spark, emb_df,
                                         tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            pq_topk_from_index,
        )

        _, idx = self._index(spark, emb_df, tmp_path)
        served = pq_topk_from_index(idx, _queries(emb_df, n=2), k=3)
        plan = served._jdf.queryExecution().executedPlan().toString()
        # ONE parquet scan (the codes table); no corpus embeddings, no
        # mapInPandas re-encode in the serve plan
        assert plan.count("FileScan parquet") == 1, plan[:2000]
        assert "MapInPandas" not in plan
        assert "embedding" not in plan.split("FileScan")[1][:500]

    def test_codes_state_shape(self, spark, emb_df, tmp_path):
        _, idx = self._index(spark, emb_df, tmp_path)
        rows = idx.codes.collect()
        assert len(rows) == emb_df.count()
        assert all(len(r["pq_code"]) == 4 for r in rows)
        assert all(0 <= c < 8 for r in rows for c in r["pq_code"])


class TestAnnIndexMerge:
    def test_ivf_merge_equals_rebuild(self, spark, emb_df, tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_build_index, ivf_merge_index, ivf_topk_from_index,
        )

        cents = train_ivf_centroids(emb_df, n_centroids=16,
                                    id_col="vec_id")
        half_a = emb_df.where("vec_id % 2 = 0")
        half_b = emb_df.where("vec_id % 2 = 1")
        merged = ivf_merge_index(ivf_build_index(half_a,
                                                 centroids=cents),
                                 half_b)
        rebuilt = ivf_build_index(emb_df, centroids=cents)
        ml = sorted((r["centroid_id"], r["nn_id"])
                    for r in merged.lists.collect())
        rl = sorted((r["centroid_id"], r["nn_id"])
                    for r in rebuilt.lists.collect())
        assert ml == rl
        qs = _queries(emb_df, n=4)
        a = ivf_topk_from_index(merged, qs, k=3, nprobe=4)
        b = ivf_topk_from_index(rebuilt, qs, k=3, nprobe=4)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_ivf_merge_rejects_duplicate_ids(self, spark, emb_df):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_build_index, ivf_merge_index,
        )

        cents = train_ivf_centroids(emb_df, n_centroids=16,
                                    id_col="vec_id")
        idx = ivf_build_index(emb_df, centroids=cents)
        with pytest.raises(ValueError, match="already indexed"):
            ivf_merge_index(idx, emb_df.where("vec_id = 3"))

    def test_pq_merge_equals_rebuild(self, spark, emb_df):
        from orange3_timeseries_spark.operators.similarity import (
            pq_build_index, pq_merge_index, pq_topk_from_index,
        )

        rows = (emb_df.where(F.col("vec_id") < 8).orderBy("vec_id")
                .select("embedding").collect())
        books = [[[float(x) for x in r.embedding[m * 4:(m + 1) * 4]]
                  for r in rows] for m in range(4)]
        merged = pq_merge_index(
            pq_build_index(emb_df.where("vec_id % 2 = 0"),
                           codebooks=books),
            emb_df.where("vec_id % 2 = 1"))
        rebuilt = pq_build_index(emb_df, codebooks=books)
        mc = sorted((r["nn_id"], tuple(r["pq_code"]))
                    for r in merged.codes.collect())
        rc = sorted((r["nn_id"], tuple(r["pq_code"]))
                    for r in rebuilt.codes.collect())
        assert mc == rc
        qs = _queries(emb_df, n=4)
        a = pq_topk_from_index(merged, qs, k=3)
        b = pq_topk_from_index(rebuilt, qs, k=3)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_pq_merge_rejects_duplicate_ids(self, spark, emb_df):
        from orange3_timeseries_spark.operators.similarity import (
            pq_build_index, pq_merge_index,
        )

        rows = (emb_df.where(F.col("vec_id") < 8).orderBy("vec_id")
                .select("embedding").collect())
        books = [[[float(x) for x in r.embedding[m * 4:(m + 1) * 4]]
                  for r in rows] for m in range(4)]
        idx = pq_build_index(emb_df, codebooks=books)
        with pytest.raises(ValueError, match="already indexed"):
            pq_merge_index(idx, emb_df.where("vec_id = 3"))


class TestIndexStateValidation:
    def test_nprobe_clamps_to_centroid_count(self, spark, emb_df,
                                             tmp_path):
        from orange3_timeseries_spark.operators.similarity import (
            ivf_build_index, ivf_topk_from_index, read_ivf_index,
            write_ivf_index,
        )

        cents = train_ivf_centroids(emb_df, n_centroids=4,
                                    id_col="vec_id")
        path = str(tmp_path / "ivf_small")
        write_ivf_index(ivf_build_index(emb_df, centroids=cents), path)
        idx = read_ivf_index(spark, path)
        qs = _queries(emb_df, n=2)
        # previously crashed the Python worker with a pandas length
        # mismatch; now clamps to the 4 cells that exist
        big = ivf_topk_from_index(idx, qs, k=3, nprobe=16)
        eq = ivf_topk_from_index(idx, qs, k=3, nprobe=4)
        assert sorted(map(tuple, big.collect())) \
            == sorted(map(tuple, eq.collect()))

    def test_ivf_rejects_gapped_centroid_ids(self, spark, emb_df,
                                             tmp_path):
        import pytest as _pt

        from orange3_timeseries_spark.operators.similarity import (
            IvfIndex, ivf_build_index, ivf_topk_from_index,
        )

        cents = train_ivf_centroids(emb_df, n_centroids=4,
                                    id_col="vec_id")
        idx = ivf_build_index(emb_df, centroids=cents)
        gapped = IvfIndex(
            idx.centroids.where("centroid_id != 1"), idx.lists,
            idx.id_col)
        with _pt.raises(ValueError, match="contiguous"):
            ivf_topk_from_index(gapped, _queries(emb_df, n=1),
                                k=2, nprobe=2).collect()

    def test_pq_read_rejects_gapped_codebooks(self, spark, emb_df,
                                              tmp_path):
        import os

        import pytest as _pt

        from orange3_timeseries_spark.operators.similarity import (
            pq_build_index, read_pq_index, write_pq_index,
        )

        rows = (emb_df.where(F.col("vec_id") < 8).orderBy("vec_id")
                .select("embedding").collect())
        books = [[[float(x) for x in r.embedding[m * 4:(m + 1) * 4]]
                  for r in rows] for m in range(4)]
        path = str(tmp_path / "pq_gap")
        write_pq_index(pq_build_index(emb_df, codebooks=books), path)
        # simulate a partial write: drop one (m, j) codebook row from
        # the CURRENT generation (writes land under path/v=<n> now)
        from orange3_timeseries_spark.operators.index_store import (
            resolve_index_path,
        )
        cb_path = os.path.join(resolve_index_path(path), "codebooks")
        kept = spark.read.parquet(cb_path).where(
            "NOT (m = 2 AND j = 5)")
        kept.write.mode("overwrite").parquet(str(tmp_path / "cb2"))
        spark.read.parquet(str(tmp_path / "cb2")).write \
            .mode("overwrite").parquet(cb_path)
        with _pt.raises(ValueError, match="centroid ids"):
            read_pq_index(spark, path)
