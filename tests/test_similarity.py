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
