"""BM25 retrieval over a document corpus: the standard inverted-index
ranking primitive for decontamination-by-retrieval and quality-slicing
in training-data pipelines.

Extends the reference's surface (it has no retrieval operators) per the
project brief.  Design:

- **Inverted index as a DataFrame**: explode tokens -> one
  map-side-combining ``groupBy(doc, token)`` -> postings ``(doc_id,
  token, tf, dl)``.  At 100 TB the postings shuffle carries only skinny
  (id, token, two ints) rows.
- **Query-first pruning**: the distinct query-token set is broadcast and
  semi-joined into the postings BEFORE document frequencies are
  computed, so df/idf and scoring only ever touch postings whose token
  appears in some query — the corpus-sized token tail never shuffles.
  The df a token gets is still its full-corpus document frequency
  (filtering is by token, never by document).
- **Corpus stats without a driver action**: ``(N, Σdl)`` ride along as a
  broadcast one-row aggregate, ``avgdl`` derived per-row from the same
  two BIGINTs in both engines (one IEEE division — bit-identical).
- **Deterministic integer-unit scoring**: each per-(query, doc, token)
  BM25 term is computed with a fixed association of IEEE ops, rounded
  once to integer micro-units (``round(term * 10^unit_scale)`` as
  BIGINT), and the per-document score is the exact integer SUM of those
  units — order-free, so the ranking comparison is an integer compare
  that reassociation or partitioning cannot flip.  Ties break on
  ``doc_id`` ascending.
- **Top-k per query**: rank window partitioned by query over
  ``(units DESC, doc_id ASC)``.

Scoring formula (the Lucene/"BM25+1" robust-idf form, always >= 0)::

    idf(t)  = ln( ((N - df) + 0.5) / (df + 0.5) + 1 )
    norm(d) = k1 * ((1 - b) + b * (dl / avgdl))
    score   = sum_t  idf(t) * (tf * (k1 + 1)) / (tf + norm(d))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.text import tokens_expr

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(docs: DataFrame, queries: DataFrame, *,
              text_col: str = "text", id_col: str = "doc_id",
              query_text_col: str = "text", query_id_col: str = "query_id",
              k1: float = 1.2, b: float = 0.75, top_k: int = 10,
              unit_scale: int = 6) -> DataFrame:
    """Top-``top_k`` BM25 matches per query: ``(query_id, doc_id, rank,
    score, n_terms)``.

    ``n_terms`` is the number of distinct query tokens the document
    matched; ``score`` is the exact micro-unit sum presented as a
    double (``units / 10^unit_scale``).  Queries are tokenized like
    documents (lowercased whitespace tokens) and deduplicated — the
    classic binary-qtf BM25.  A query whose tokens match nothing
    produces no rows.
    """
    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    unit = float(10 ** unit_scale)
    d = widen_partitions(docs.select(id_col, text_col))
    toks = tokens_expr(F.col(text_col))
    posting = d.select(F.col(id_col),
                       F.size(toks).alias("__dl__"),
                       F.explode(toks).alias("__tok__"))

    # distinct (query, token) pairs; small by contract -> broadcast
    q_terms = (queries
               .select(F.col(query_id_col),
                       F.explode(F.array_distinct(
                           tokens_expr(F.col(query_text_col))))
                       .alias("__tok__"))
               .distinct())
    # prune the postings to query tokens BEFORE the tf aggregation, not
    # after: the map-side broadcast semi-join means only matching-token
    # postings ever shuffle (for keyword queries that is ~1% of the
    # corpus's exploded rows — the r9 decade smoke measured exponent
    # 1.27 with the groupBy first, 0.9x after this reorder).  The df a
    # token gets is still its full-corpus document frequency, because
    # pruning drops whole tokens, never docs.
    qtok_b = F.broadcast(q_terms.select("__tok__").distinct())
    hit = (posting.join(qtok_b, "__tok__")
           .groupBy(id_col, "__tok__", "__dl__")
           .agg(F.count(F.lit(1)).alias("__tf__")))
    # df per token as a map-side-combining aggregate broadcast back in —
    # NOT a window partitioned by token: a frequent token's window
    # partition is every matching document (unbounded skew at corpus
    # scale), while the aggregated df table is <= |distinct query tokens|
    # rows no matter how large the corpus is
    df_tbl = hit.groupBy("__tok__").agg(F.count(F.lit(1)).alias("__df__"))
    hit = hit.join(F.broadcast(df_tbl), "__tok__")

    stats = d.agg(F.count(F.lit(1)).alias("__n__"),
                  F.sum(F.size(toks)).alias("__sdl__"))
    scored = hit.crossJoin(F.broadcast(stats))

    # fixed-association IEEE pipeline, identical in the DuckDB oracle:
    # every input is BIGINT, every mixed op promotes the same way
    avgdl = F.col("__sdl__").cast("double") / F.col("__n__").cast("double")
    idf = F.log(
        ((F.col("__n__") - F.col("__df__")).cast("double") + F.lit(0.5))
        / (F.col("__df__").cast("double") + F.lit(0.5)) + F.lit(1.0))
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * (F.col("__dl__").cast("double") / avgdl))
    weight = (F.col("__tf__").cast("double") * F.lit(k1 + 1.0)) \
        / (F.col("__tf__").cast("double") + norm)
    term_units = F.round(idf * weight * F.lit(unit)).cast("bigint")

    per_doc = (scored
               .join(F.broadcast(q_terms), "__tok__")
               .groupBy(query_id_col, id_col)
               .agg(F.sum(term_units).alias("__units__"),
                    F.count(F.lit(1)).cast("bigint").alias("n_terms")))
    wr = (Window.partitionBy(query_id_col)
          .orderBy(F.col("__units__").desc(), F.col(id_col).asc()))
    return (per_doc
            .withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= top_k)
            .select(query_id_col, id_col,
                    F.col("rank").cast("int").alias("rank"),
                    (F.col("__units__") / F.lit(unit)).alias("score"),
                    "n_terms"))


def rrf_fuse(rankings, k: int = 60, top_k: int = 10, *,
             query_id_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    per-query rankings: ``score(d) = sum_r 1/(k + rank_r(d))`` with a
    missing ranker contributing 0; output ``(query_id, doc_id,
    rank_1..rank_N, score, rrf_rank)`` with ``rrf_rank`` breaking score
    ties on ``id_col`` ascending.

    The standard hybrid-retrieval combiner (BM25 + embedding ANN) for
    training-data pipelines: rank fusion needs no score calibration
    between rankers, and because every input is an INTEGER rank the
    score is the same fixed left-to-right sum of exact reciprocals on
    every engine — the fused ordering is bit-deterministic, no quantize
    firewall needed.  Each ranking is a skinny (query, doc, rank) table,
    so the N-way outer join shuffles only ids and small ints no matter
    how large the underlying corpus is."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    fused = None
    for i, r in enumerate(rankings, start=1):
        part = r.select(query_id_col, id_col,
                        F.col(rank_col).cast("int").alias(f"rank_{i}"))
        fused = part if fused is None else fused.join(
            part, on=[query_id_col, id_col], how="full_outer")
    score = None
    for i in range(1, len(rankings) + 1):
        term = F.coalesce(F.lit(1.0) / (F.lit(float(k))
                                        + F.col(f"rank_{i}")),
                          F.lit(0.0))
        score = term if score is None else score + term
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("__score__").desc(), F.col(id_col).asc()))
    return (fused.withColumn("__score__", score)
            .withColumn("rrf_rank", F.row_number().over(w))
            .where(F.col("rrf_rank") <= top_k)
            .select(query_id_col, id_col,
                    *[f"rank_{i}" for i in range(1, len(rankings) + 1)],
                    F.col("__score__").alias("score"), "rrf_rank"))
