"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Design for 100 TB:

- **exact**: one hash-groupBy with map-side partial aggregation; the digest
  (md5) is computed scan-side so only (digest, id) shuffles.
- **minhash_lsh**: shingle -> k seeded min-hashes -> b bands; candidate
  generation is an equi-join on (band, band_key) — i.e. a shuffle on small
  keys, never an all-pairs product; verification computes exact Jaccard only
  on candidates.  All hashing uses the portable md5-based ``phash`` so the
  DuckDB oracle replays the *identical* pipeline.
- **simhash**: 32-bit signature via per-token bit votes folded with one
  higher-order aggregate; near-dup candidates join on band prefixes.
- **ngram_jaccard_pairs**: the exact quadratic variant for modest
  partitions (blocked by a key column when given) — the LSH path is the
  scale path, this is the verifier.
- **embedding near-dup**: cosine >= tau pairs, blocked by an LSH bucket or a
  provided key at scale.

No Python UDFs anywhere — everything is Catalyst expressions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash, phash_seeded
from orange3_timeseries_spark.operators.text import tokens_expr


# ----------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, text_col: str, id_col: str,
                keep: str = "min") -> DataFrame:
    """Exact duplicate groups by content digest; keeps the min-id (or
    max-id) representative and counts members."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (df.select(F.md5(F.col(text_col)).alias("digest"), id_col)
            .groupBy("digest")
            .agg(agg.alias("keep_id"),
                 F.count(F.lit(1)).alias("n_members")))


def exact_dedup_filter(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The deduplicated corpus: one representative row per distinct text."""
    keep = exact_dedup(df, text_col, id_col)
    return (df.join(F.broadcast(keep.select(F.col("keep_id").alias(id_col))),
                    on=id_col, how="left_semi"))


# -------------------------------------------------------------------- shingles
def shingles_expr(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text."""
    toks = tokens_expr(c)
    if n == 1:
        return F.array_distinct(toks)
    # guard: sequence(0, negative) would produce a descending range
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))
    ).otherwise(F.array().cast("array<string>"))


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / F.nullif(union, F.lit(0.0))


# --------------------------------------------------------------------- minhash
def minhash_signature_expr(sh: Column, k: int = 16) -> Column:
    """k-permutation MinHash signature: per seed, the min portable hash of
    the shingle set (empty set -> nulls)."""
    def _hasher(seed):  # factory: a 2-arg HOF lambda would receive
        return lambda s: phash_seeded(s, seed)  # (element, index)

    return F.array(*[
        F.array_min(F.transform(sh, _hasher(i))) for i in range(k)
    ])


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       k: int = 16, n: int = 3) -> DataFrame:
    sh = shingles_expr(F.col(text_col), n)
    return df.select(F.col(id_col),
                     minhash_signature_expr(sh, k).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      k: int = 16, bands: int = 4, n: int = 3,
                      threshold: float = 0.2) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact Jaccard.

    Returns (id_a, id_b, jaccard) for verified pairs with
    jaccard >= threshold.  rows_per_band = k // bands; a pair collides when
    one band of the signature matches exactly.
    """
    rows_per_band = k // bands
    sh = shingles_expr(F.col(text_col), n)
    base = df.select(F.col(id_col), sh.alias("sh"),
                     minhash_signature_expr(sh, k).alias("sig"))
    band_entries = base.select(
        id_col, "sh",
        F.posexplode(F.array(*[
            phash(F.concat_ws(",", *[
                F.col("sig")[b * rows_per_band + r].cast("string")
                for r in range(rows_per_band)]))
            for b in range(bands)
        ])).alias("band", "band_key"))
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cand = (a.join(b, [F.col(f"a.band") == F.col("b.band"),
                       F.col("a.band_key") == F.col("b.band_key"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.sh").alias("sh_a"),
                    F.col("b.sh").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.select("id_a", "id_b",
                        jaccard_expr(F.col("sh_a"), F.col("sh_b"))
                        .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# --------------------------------------------------------------------- simhash
def simhash_expr(c: Column, bits: int = 32) -> Column:
    """SimHash signature: per-token bit votes (+1/-1 per bit of the token's
    portable hash), folded with one higher-order aggregate; bit i of the
    result is 1 when the summed vote is positive."""
    hashes = F.transform(tokens_expr(c), lambda t: phash(t))
    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0).cast("long") for _ in range(bits)]),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                       F.lit(1).cast("long"))
                 .otherwise(F.lit(-1).cast("long"))
                for i in range(bits)]),
            lambda a, v: a + v))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(F.element_at(votes, i + 1) > 0,
                           F.lit(1 << i).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return out


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two integer signatures (via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  bits: int = 32, max_distance: int = 3,
                  band_bits: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: block on each of the ``bits/band_bits``
    signature bands (a pair within distance d < bands collides on >= one
    band by pigeonhole), verify exact Hamming distance."""
    sigs = df.select(F.col(id_col),
                     simhash_expr(F.col(text_col), bits).alias("sig"))
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    entries = sigs.select(
        id_col, "sig",
        F.posexplode(F.array(*[
            F.shiftright(F.col("sig"), b * band_bits)
             .bitwiseAND(F.lit(mask)).cast("long")
            for b in range(n_bands)])).alias("band", "band_key"))
    a, b = entries.alias("a"), entries.alias("b")
    cand = (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.band_key") == F.col("b.band_key"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.sig").alias("sig_a"),
                    F.col("b.sig").alias("sig_b"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.select("id_a", "id_b",
                        hamming_expr(F.col("sig_a"), F.col("sig_b"))
                        .alias("hamming"))
            .where(F.col("hamming") <= max_distance))


# ------------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.2,
                        block_col: Optional[str] = None) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (optionally blocked by a key column —
    at scale always pass a block or use :func:`minhash_lsh_pairs`)."""
    sh = df.select(F.col(id_col), shingles_expr(F.col(text_col), n).alias("sh"),
                   *([block_col] if block_col else []))
    a, b = sh.alias("a"), sh.alias("b")
    conds = [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
    if block_col:
        conds.append(F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (a.join(b, conds)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    jaccard_expr(F.col("a.sh"), F.col("b.sh")).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
