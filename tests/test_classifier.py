"""IRLS logistic quality classifier: separable-data behavior, sklearn-free
reference agreement, Catalyst-only scoring plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _py_irls(X, y, iters=6, ridge=1e-3, quantize=7):
    """Plain-NumPy mirror of the distributed trainer (same firewall)."""
    k = X.shape[1]
    beta = np.zeros(k)
    for _ in range(iters):
        eta = np.clip(X @ beta, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(p * (1 - p), 1e-12)
        z = eta + (y - p) / w
        A = (X * w[:, None]).T @ X + ridge * np.eye(k)
        b = (X * w[:, None]).T @ z
        beta = np.round(np.linalg.solve(A, b), quantize)
    return beta


class TestLogisticIrls:
    def _df(self, spark, n=400, seed=0):
        rng = np.random.RandomState(seed)
        x1 = rng.uniform(-2, 2, n)
        x2 = rng.uniform(-2, 2, n)
        # noisy linear rule (not separable)
        p = 1 / (1 + np.exp(-(0.5 + 1.5 * x1 - 2.0 * x2)))
        y = (rng.uniform(size=n) < p).astype(float)
        rows = [(float(a), float(b), float(c))
                for a, b, c in zip(x1, x2, y)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        X = np.column_stack([np.ones(n), x1, x2])
        return df, X, y

    def test_matches_numpy_reference(self, spark):
        from orange3_timeseries_spark.operators.classifier import (
            logistic_train_irls,
        )
        df, X, y = self._df(spark)
        beta = logistic_train_irls(
            df, {"x1": F.col("x1"), "x2": F.col("x2")}, F.col("y"))
        want = _py_irls(X, y)
        # distributed float sums vs numpy matmuls: identical after the
        # per-round 7-dp rounding firewall
        assert np.allclose(beta, want, atol=2e-7), (beta, want)

    def test_recovers_signs_and_separates(self, spark):
        from orange3_timeseries_spark.operators.classifier import (
            logistic_score_expr,
            logistic_train_irls,
        )
        df, X, y = self._df(spark, seed=3)
        feats = {"x1": F.col("x1"), "x2": F.col("x2")}
        beta = logistic_train_irls(df, feats, F.col("y"))
        assert beta[1] > 0 and beta[2] < 0  # true coefficient signs
        scored = df.select(
            F.col("y"), logistic_score_expr(feats, beta).alias("s"))
        rows = scored.collect()
        acc = np.mean([(r.s >= 0.5) == (r.y >= 0.5) for r in rows])
        assert acc > 0.8

    def test_separable_labels_stay_finite(self, spark):
        """Label = deterministic threshold of a feature (perfect
        separation): ridge + the eta clamp keep IRLS finite and the
        fitted boundary lands near the true threshold."""
        from orange3_timeseries_spark.operators.classifier import (
            logistic_train_irls,
        )
        rows = [(float(i) / 50.0, 1.0 if i >= 100 else 0.0)
                for i in range(200)]
        df = spark.createDataFrame(rows, "x double, y double")
        beta = logistic_train_irls(df, {"x": F.col("x")}, F.col("y"))
        assert all(np.isfinite(beta))
        # decision boundary -b0/b1 near the true threshold x = 2.0
        assert abs(-beta[0] / beta[1] - 2.0) < 0.15

    def test_scoring_is_catalyst_only(self, spark):
        from orange3_timeseries_spark.operators.classifier import (
            logistic_score_expr,
        )
        df = spark.createDataFrame([(1.0,)], "x double")
        out = df.select(logistic_score_expr({"x": F.col("x")},
                                            [0.1, 0.2]).alias("s"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
