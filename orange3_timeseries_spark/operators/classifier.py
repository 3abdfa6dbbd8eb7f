"""Distributed quality-classifier training: logistic regression via
IRLS (iteratively reweighted least squares), Spark-first.

The corpus-scale pattern mirrors the engine's other trained models
(IVF, ARIMA): the DATA-sized step is distributed — each IRLS round is
ONE map-side-combinable aggregation over the corpus that reduces every
row to its contribution to the k x k weighted normal equations
``X'WX`` / ``X'Wz`` (features never collect, k is tiny) — and the
MODEL-sized step (the k x k solve) runs on the driver.  Six rounds =
six passes; at 100 TB you either accept six scans or run the late
rounds on a hash-sampled subset (the gradient is self-averaging).

Determinism contract (what lets a SQL oracle replay TRAINING exactly,
same firewall as ``ARIMA(quantize=)`` / ``train_ivf_centroids``):
coefficients round to ``quantize`` decimals after every solve, the
linear predictor is clamped to [-30, 30], and the IRLS weight has a
1e-12 floor — identical expressions on both engines, so float noise
in the big sums is absorbed at each round boundary.

Scoring is a pure Catalyst expression (broadcast coefficients inside
the closure): at serving time quality filtering is map-only on the
scan, like the Gopher rules it generalizes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logistic_train_irls", "logistic_score_expr"]

ETA_CLAMP = 30.0
W_FLOOR = 1e-12


def _eta_expr(feats: Sequence[Column], beta: Sequence[float]) -> Column:
    """b0*x0 + b1*x1 + ... in explicit left-to-right order (the oracle
    writes the identical expression, keeping FP association aligned)."""
    eta = F.lit(float(beta[0])) * feats[0]
    for b, x in zip(beta[1:], feats[1:]):
        eta = eta + F.lit(float(b)) * x
    return F.greatest(F.lit(-ETA_CLAMP), F.least(F.lit(ETA_CLAMP), eta))


def logistic_train_irls(df: DataFrame, feature_cols: Dict[str, Column],
                        label: Column, iters: int = 6,
                        ridge: float = 1e-3,
                        quantize: int = 7) -> List[float]:
    """Fit ``P(label=1 | x) = sigmoid(b . [1, x...])`` by IRLS.

    ``feature_cols`` maps name -> Column (the intercept is implicit).
    Returns the coefficient list ``[b_intercept, b_f1, ...]`` rounded
    to ``quantize`` decimals (the replay firewall)."""
    names = list(feature_cols)
    k = len(names) + 1
    feats = [F.lit(1.0)] + [feature_cols[n].cast("double") for n in names]
    # materialize the skinny (k+1)-column feature table once: every IRLS
    # round re-reads it, and recomputing text-derived features per round
    # would re-tokenize the corpus `iters` times
    base = df.select(*[f.alias(f"x{i}") for i, f in enumerate(feats)],
                     label.cast("double").alias("y")).localCheckpoint()
    beta = [0.0] * k
    for _ in range(iters):
        xs = [F.col(f"x{i}") for i in range(k)]
        eta = _eta_expr(xs, beta)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = F.greatest(p * (F.lit(1.0) - p), F.lit(W_FLOOR))
        z = eta + (F.col("y") - p) / w
        it = base.select(*[x.alias(f"x{i}") for i, x in enumerate(xs)],
                         w.alias("w"), z.alias("z"))
        aggs = []
        for i in range(k):
            for j in range(i, k):
                aggs.append(F.sum(F.col("w") * F.col(f"x{i}")
                                  * F.col(f"x{j}")).alias(f"s_{i}_{j}"))
            aggs.append(F.sum(F.col("w") * F.col(f"x{i}")
                              * F.col("z")).alias(f"r_{i}"))
        row = it.agg(*aggs).first()
        A = np.zeros((k, k))
        b = np.zeros(k)
        for i in range(k):
            for j in range(i, k):
                A[i, j] = A[j, i] = row[f"s_{i}_{j}"]
            b[i] = row[f"r_{i}"]
        A += ridge * np.eye(k)
        beta = [float(v) for v in
                np.round(np.linalg.solve(A, b), quantize)]
    return beta


def logistic_score_expr(feature_cols: Dict[str, Column],
                        beta: Sequence[float]) -> Column:
    """sigmoid(b . [1, x...]) as a pure Catalyst expression — map-only
    scoring on the scan at any corpus size."""
    feats = [F.lit(1.0)] + [feature_cols[n].cast("double")
                            for n in feature_cols]
    eta = _eta_expr(feats, beta)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def rank_auc(df: DataFrame, score_units_col: str, label_col: str,
             group_cols: Sequence[str]) -> DataFrame:
    """Exact ROC-AUC of an integer-unit score against a boolean label,
    per group: ``(group..., n_pos, n_neg, auc)`` — the Mann-Whitney
    rank form ``AUC = (ΣR⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻)`` with AVERAGE ranks
    on ties, the textbook tie-corrected estimator.

    Determinism: average ranks are exact half-integers carried as
    BIGINT doubled-ranks ``2·rank + (ties−1)`` (the spearman trick),
    the score itself must already be an exact integer-unit column (the
    caller's responsibility — never rank a raw float), and AUC is a
    fixed-order double combination of exact BIGINT sums.  Groups with
    a single class are dropped (AUC undefined).

    Scale: one rank window + one groupBy sharing the group key — one
    skinny shuffle; a billion scored rows per slice cost one pass."""
    group_cols = list(group_cols)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(score_units_col)
    tw = Window.partitionBy(*group_cols, score_units_col)
    rk2 = (F.lit(2).cast("bigint") * F.rank().over(w).cast("bigint")
           + (F.count(F.lit(1)).over(tw).cast("bigint") - 1))
    pos = F.col(label_col).cast("boolean")
    r = df.select(*group_cols, F.col(score_units_col), pos.alias("__y__")) \
          .where(F.col(score_units_col).isNotNull()
                 & F.col("__y__").isNotNull()) \
          .withColumn("__rk2__", rk2)
    g = r.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n__"),
        F.sum(F.when(F.col("__y__"), 1).otherwise(0)).cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("__y__"), F.col("__rk2__"))).cast("bigint")
        .alias("__s2__"))
    npos = F.col("n_pos")
    nneg = F.col("__n__") - npos
    auc = F.round((F.col("__s2__").cast("double") / F.lit(2.0)
                   - (npos * (npos + 1)).cast("double") / F.lit(2.0))
                  / (npos * nneg).cast("double"), 6)
    return (g.where((npos > 0) & (nneg > 0))
            .select(*group_cols, "n_pos",
                    nneg.cast("bigint").alias("n_neg"),
                    auc.alias("auc")))


def calibration_bins(df: DataFrame, score_units_col: str, label_col: str,
                     n_bins: int = 10,
                     unit_scale: int = 6) -> DataFrame:
    """Reliability-diagram bins of an integer-unit probability score in
    ``[0, 10^unit_scale]``: ``(bin, n_rows, mean_pred, obs_rate, gap)``
    — mean predicted probability vs observed positive rate per score
    decile, the audit that decides whether a threshold means what it
    claims before it gates a corpus.

    Bin edges cut on the INTEGER units (never ``floor(score·10)`` on a
    float — a 6-dp decimal times 10 straddles the bin edge in binary),
    clamped into [0, n_bins); rows with a NULL label are dropped (the
    same convention as :func:`rank_auc`);
    ``mean_pred`` is an exact unit sum over one division, ``obs_rate``
    an exact count ratio, ``gap`` their fixed-order difference —
    bit-identical cross-engine.  One groupBy over ≤ n_bins groups."""
    width = 10 ** unit_scale // n_bins
    su = F.col(score_units_col)
    b = df.select(
        F.greatest(
            F.least(F.floor(su.cast("double") / F.lit(float(width))),
                    F.lit(n_bins - 1)),
            F.lit(0)).cast("int").alias("bin"),
        su.alias("__su__"),
        F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)
        .alias("__pos__")) \
        .where(su.isNotNull() & F.col(label_col).isNotNull())
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("__pos__").cast("bigint").alias("__npos__"),
        F.sum("__su__").cast("bigint").alias("__sus__"))
    mean_pred = (F.col("__sus__").cast("double")
                 / (F.col("n_rows") * F.lit(10 ** unit_scale))
                 .cast("double"))
    obs = (F.col("__npos__").cast("double")
           / F.col("n_rows").cast("double"))
    return g.select("bin", "n_rows", mean_pred.alias("mean_pred"),
                    obs.alias("obs_rate"), (obs - mean_pred).alias("gap"))


__all__ += ["rank_auc", "calibration_bins"]
