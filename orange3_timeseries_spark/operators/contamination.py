"""Benchmark decontamination and corpus language-model scoring — two
standard large-scale training-data hygiene passes (public heuristics:
GPT-3/PaLM-style n-gram decontamination, CCNet-style LM quality scoring).

The reference has no text surface; these extend the pipeline tier per the
project brief.  Everything is native Spark SQL — no Python UDFs — and each
operator has an exact DuckDB oracle (queries_pipeline.py).

Scale design (100 TB corpus, ~10^4..10^6-document benchmark):

- ``contamination``: the benchmark's distinct n-gram set is SMALL relative
  to the corpus (benchmarks are fixed eval sets), so the join is a
  broadcast hash semi-join — the corpus never shuffles for the match; the
  only wide exchange is the final per-document count, which groups the
  already-filtered HIT rows (a tiny fraction of corpus positions).
- ``unigram_lm_score``: pass 1 builds the unigram table with one
  map-side-combining groupBy (optionally capped to a top-K vocabulary);
  pass 2 re-explodes the corpus and joins token->logp.  The vocab join
  side is broadcast when capped; per-document aggregation shuffles skinny
  (id, logp) rows only.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.dedup import shingles_expr
from orange3_timeseries_spark.operators.partitioning import widen_partitions
from orange3_timeseries_spark.operators.text import tokens_expr


def contamination(corpus: DataFrame, benchmark: DataFrame, text_col: str,
                  id_col: str, n: int = 8) -> DataFrame:
    """Per-document n-gram overlap with a benchmark set: for each corpus
    document, the number of its distinct word ``n``-grams that appear
    anywhere in ``benchmark``, the document's total distinct ``n``-gram
    count, and the contaminated fraction.

    Documents with fewer than ``n`` tokens have no ``n``-grams and report
    ``n_ngrams = 0, frac = 0.0`` (they cannot leak an eval question).

    Returns ``(id_col, n_hit, n_ngrams, contamination_frac)`` with one row
    per corpus document (zero-hit documents included — the common case —
    so the output is a full audit table, filterable downstream).

    Plan: benchmark -> distinct exploded n-grams (small) -> broadcast;
    corpus -> ONE scan computing the shingle set, exploded (outer, so
    gram-less documents keep their row) -> broadcast LEFT join marks
    hits without shuffling the corpus -> ONE skinny per-document
    aggregation counts grams and hits together.  (The previous shape
    ran the shingle pass twice — a totals branch and a hits branch —
    and re-joined them: two corpus passes and two shuffles for what one
    of each computes; guide §2.3/§2.4.)
    """
    bench_grams = (benchmark
                   .select(F.explode(shingles_expr(F.col(text_col), n))
                           .alias("__g__"))
                   .distinct()
                   .withColumn("__hit__", F.lit(1)))
    exploded = widen_partitions(corpus.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode_outer(shingles_expr(F.col(text_col), n))
        .alias("__g__"))
    agg = (exploded
           .join(F.broadcast(bench_grams), "__g__", "left")
           .groupBy(id_col)
           .agg(F.count("__hit__").alias("n_hit"),
                F.count("__g__").cast("int").alias("n_ngrams")))
    return agg.select(
        id_col,
        F.col("n_hit"),
        "n_ngrams",
        F.when(F.col("n_ngrams") > 0,
               F.col("n_hit") / F.col("n_ngrams").cast("double"))
        .otherwise(F.lit(0.0)).alias("contamination_frac"))


def unigram_table(corpus: DataFrame, text_col: str,
                  top_k: Optional[int] = None) -> DataFrame:
    """Corpus unigram model: ``(token, freq, logp)`` with
    ``logp = ln(freq / N)`` over total corpus token count ``N``.

    ``top_k`` caps the vocabulary to the most frequent tokens (count
    desc, token asc tie-break) — the cap that keeps the scoring join
    broadcastable at 100 TB; ``logp`` still normalizes by the FULL corpus
    count, so capped-vocab scores are comparable across cap choices."""
    df = widen_partitions(corpus.select(text_col))
    tok = df.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    if top_k is not None:
        w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
        counts = (counts.withColumn("__r__", F.row_number().over(w))
                  .where(F.col("__r__") <= top_k).drop("__r__"))
    n_total = tok.groupBy().agg(F.count(F.lit(1)).alias("__n__"))
    return (counts.crossJoin(F.broadcast(n_total))
            .select("token", "freq",
                    F.log(F.col("freq") / F.col("__n__").cast("double"))
                    .alias("logp")))


def unigram_lm_score(corpus: DataFrame, text_col: str, id_col: str,
                     model: Optional[DataFrame] = None,
                     oov_logp: float = -20.0) -> DataFrame:
    """Per-document unigram log-likelihood quality score (CCNet-style):
    ``avg_logp`` = mean ln-probability of the document's tokens under a
    unigram model, plus ``perplexity = exp(-avg_logp)``.  Lower perplexity
    = more typical of the training distribution; the score drives
    quality bucketing / head-middle-tail sampling.

    ``model`` defaults to the corpus's own :func:`unigram_table` (no OOV
    possible); a capped or external model scores unknown tokens at
    ``oov_logp``.

    Returns ``(id_col, n_tokens, avg_logp, perplexity)``.
    """
    if model is None:
        model = unigram_table(corpus, text_col)
    toks = (widen_partitions(corpus.select(id_col, text_col))
            .select(id_col,
                    F.explode(tokens_expr(F.col(text_col))).alias("token")))
    scored = (toks.join(F.broadcast(model.select("token", "logp")),
                        "token", "left")
              .select(id_col,
                      F.coalesce("logp", F.lit(float(oov_logp)))
                      .alias("logp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.avg("logp").alias("avg_logp"))
            .select(id_col, "n_tokens", "avg_logp",
                    F.exp(-F.col("avg_logp")).alias("perplexity")))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    size: int, stride: Optional[int] = None) -> DataFrame:
    """Split each document's token stream into fixed-size chunks with
    optional overlap (``stride < size``) — the pre-tokenization pass that
    turns long documents into training-window-sized pieces.

    Emits ``(id_col, chunk_id, chunk_start, n_chunk_tokens, chunk_text)``;
    the final chunk may be short, and a chunk is only emitted when it
    starts strictly inside the token stream.  Empty documents emit no
    rows.

    Map-only: the token array is bound once per row (HOF-inlining trap
    avoided), chunk starts come from ``sequence``, and ``posexplode``
    fans out — no shuffle at any point, so the pass streams over 100 TB
    at scan speed.
    """
    stride = size if stride is None else stride
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    base = df.select(id_col, tokens_expr(F.col(text_col)).alias("__toks__"))
    n = F.size("__toks__")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    chunks = base.select(
        id_col,
        F.col("__toks__"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"))
    piece = F.slice(F.col("__toks__"), F.col("chunk_start") + 1, size)
    return chunks.select(
        id_col, "chunk_id", "chunk_start",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
