"""N-gram language-model perplexity scoring — the KenLM-style corpus
quality gate (CCNet/Gopher/FineWeb pipelines score every document
against a reference LM and drop the high-perplexity tail).

This is the distributed, model-free variant: the reference model is a
bigram LM with add-k smoothing trained ON a reference corpus (often the
corpus itself, or a trusted subset), and scoring is pure relational
algebra — no external LM binary:

- **train**: explode token bigrams, two map-side-combinable groupBy
  counts (unigram and bigram) — one shuffle each over skinny (token,
  count) rows at any corpus size;
- **score**: explode each document's bigrams, join the count tables,
  ``ln((c2 + k) / (c1 + k·V))`` per bigram, one groupBy back to the
  document.  The count tables are one row per distinct (bi)gram —
  at web-corpus scale the unigram side broadcasts and the bigram join
  is a plain shuffle join on the gram key (hot grams like "of the" are
  single count rows, not skew).

Tokenization is :func:`~.text.normalize_text_expr` words (lowercase,
punctuation stripped) so the DuckDB oracle replays it exactly.
Documents with fewer than 2 tokens have no bigrams and score NULL.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.text import normalize_text_expr

__all__ = ["lm_tokens_expr", "train_bigram_lm", "bigram_perplexity"]


def lm_tokens_expr(c: Column) -> Column:
    """Normalized word tokens (empty strings dropped, so an empty or
    punctuation-only document yields an empty array)."""
    return F.filter(F.split(normalize_text_expr(c), " "),
                    lambda t: t != "")


def _bigrams_expr(toks: Column) -> Column:
    """Array of (w1, w2) structs for consecutive token pairs."""
    n = F.size(toks)
    return F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("w2"))


def train_bigram_lm(df: DataFrame, text_col: str
                    ) -> Tuple[DataFrame, DataFrame]:
    """(unigram counts ``(w, c1)``, bigram counts ``(w1, w2, c2)``) over
    the corpus — two aggregations over exploded tokens; both partial-
    aggregate on the map side, so the shuffles move distinct grams, not
    token instances."""
    toks = df.select(lm_tokens_expr(F.col(text_col)).alias("__toks__"))
    uni = (toks.select(F.explode("__toks__").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    bi = (toks.select(F.explode(_bigrams_expr(F.col("__toks__")))
                      .alias("b"))
          .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")))
    return uni, bi


def bigram_perplexity(df: DataFrame, id_col: str, text_col: str,
                      unigrams: Optional[DataFrame] = None,
                      bigrams: Optional[DataFrame] = None,
                      k: float = 0.5) -> DataFrame:
    """Per-document bigram perplexity under the add-k-smoothed LM:

        P(w2 | w1) = (c2 + k) / (c1 + k·V)
        ppl = exp(-mean ln P)   over the document's bigrams

    ``unigrams``/``bigrams`` default to training on ``df`` itself (the
    self-scoring quality gate); pass tables trained on a trusted corpus
    for the CCNet-style "perplexity against clean text" variant.
    Returns ``(id, n_bigrams, avg_logp, ppl)``; < 2 tokens → NULLs.

    OOV and unseen-bigram mass is carried by the smoothing term: an
    unseen bigram scores ``k / (c1 + k·V)`` and an unseen *context*
    word ``1 / V`` — finite log-probs everywhere, no special cases.
    """
    if unigrams is None or bigrams is None:
        unigrams, bigrams = train_bigram_lm(df, text_col)
    vocab = unigrams.agg(F.count(F.lit(1)).alias("__V__"))

    pairs = (df.select(F.col(id_col),
                       lm_tokens_expr(F.col(text_col)).alias("__toks__"))
             .select(id_col,
                     F.explode_outer(_bigrams_expr(F.col("__toks__")))
                     .alias("b"))
             .select(id_col, F.col("b.w1").alias("w1"),
                     F.col("b.w2").alias("w2")))
    scored = (pairs
              .join(bigrams, ["w1", "w2"], "left")
              .join(unigrams.withColumnRenamed("w", "w1"), "w1", "left")
              .crossJoin(F.broadcast(vocab))
              .select(id_col,
                      F.when(F.col("w1").isNull(), F.lit(None))
                      .otherwise(F.log(
                          (F.coalesce("c2", F.lit(0)) + F.lit(k))
                          / (F.coalesce("c1", F.lit(0))
                             + F.lit(k) * F.col("__V__"))))
                      .alias("__lp__")))
    return (scored.groupBy(id_col)
            .agg(F.count("__lp__").cast("long").alias("n_bigrams"),
                 F.avg("__lp__").alias("avg_logp"))
            .select(id_col,
                    "n_bigrams",
                    F.when(F.col("n_bigrams") > 0, F.col("avg_logp"))
                    .alias("avg_logp"),
                    F.when(F.col("n_bigrams") > 0,
                           F.exp(-F.col("avg_logp"))).alias("ppl")))
