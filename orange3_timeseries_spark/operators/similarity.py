"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path.

Scale design: brute-force is a broadcast of the (small) query set against
the full corpus — a map-only pass, no shuffle of the corpus; per-query top-k
uses a window rank on (query, score).  The LSH variant buckets both sides by
sign-bit signatures so each query only scans its bucket — the classic
sub-linear ANN trade; recall is tunable by signature bits / multi-probe.
All dot products run through ``aggregate``/``zip_with`` higher-order
functions (JVM-side, no UDFs).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_id_col: str = "query_id", k: int = 5,
                     ) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set, rank per query.
    Ties break on the corpus id for determinism."""
    c = corpus.select(F.col(id_col).alias("nn_id"),
                      _as_double(F.col(vec_col)).alias("cvec"))
    q = queries.select(F.col(query_id_col),
                       _as_double(F.col(vec_col)).alias("qvec"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col(query_id_col) != F.col("nn_id"))
              .select(query_id_col, "nn_id",
                      F.round(cosine_expr(F.col("cvec"), F.col("qvec")), 6)
                       .alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def lsh_signature_expr(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i).  Planes are
    deterministic (seeded) and broadcast as literals."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot_expr(vec, plane) > 0,
                           F.lit(1 << i).cast("long"))
                     .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def make_planes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (numpy, driver-side)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_topk(corpus: DataFrame, queries: DataFrame,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id", k: int = 5,
             n_planes: int = 8, dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Sub-linear per query at scale; recall < 1 by construction."""
    planes = make_planes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col).alias("nn_id"),
                      _as_double(F.col(vec_col)).alias("cvec"))
    c = c.withColumn("bucket", lsh_signature_expr(F.col("cvec"), planes))
    q = queries.select(F.col(query_id_col),
                       _as_double(F.col(vec_col)).alias("qvec"))
    q = q.withColumn("bucket", lsh_signature_expr(F.col("qvec"), planes))
    scored = (c.join(F.broadcast(q), "bucket")
              .where(F.col(query_id_col) != F.col("nn_id"))
              .select(query_id_col, "nn_id",
                      F.round(cosine_expr(F.col("cvec"), F.col("qvec")), 6)
                       .alias("cosine")))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            id_col: str = "vec_id", threshold: float = 0.99,
                            block_col: Optional[str] = None) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold; optionally blocked by a
    key column (at scale, block on an LSH bucket)."""
    base = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"),
                     *([block_col] if block_col else []))
    a, b = base.alias("a"), base.alias("b")
    conds = [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
    if block_col:
        conds.append(F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (a.join(b, conds)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6)
                     .alias("cosine"))
            .where(F.col("cosine") >= threshold))
