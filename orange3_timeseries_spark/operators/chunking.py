"""Document chunking: split long documents into fixed-token windows
with overlap — the context-window preprocessing step for embedding /
retrieval indexing and for LLM training examples (every RAG pipeline
chunks; every SFT pipeline windows long documents).

Pure Catalyst: tokenize once (whitespace split — chunking must
PRESERVE the original text, so no normalization), compute the chunk
count per document, ``explode(sequence(...))`` to one row per chunk,
and reconstruct each chunk's text with ``slice`` + ``array_join``.
One narrow explode on the scan, no shuffle, no Python — scales as a
map-only pass at any corpus size.

Chunk arithmetic (``size`` tokens, ``overlap`` tokens, stride
``size - overlap``): chunk ``i`` covers tokens
``[i*stride, i*stride + size)``; the last chunk is the first one whose
window reaches the end (shorter tail windows are NOT emitted — the
final chunk simply ends at the document end), so every token belongs
to >= 1 chunk and no empty chunks exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    size: int = 128, overlap: int = 32) -> DataFrame:
    """One row per (document, chunk): ``(id, chunk_id, n_chunks,
    chunk_start, chunk_tokens, chunk_text)``; ``chunk_start`` is the
    0-based token offset.  Documents with no tokens are dropped."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("__toks__")) \
        .withColumn("__n__", F.size("__toks__")) \
        .where(F.col("__n__") > 0)
    # chunks = 1 + ceil(max(n - size, 0) / stride)
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(F.col("__n__") - size, F.lit(0))
                         / F.lit(stride)).cast("int"))
    out = (base.withColumn("n_chunks", n_chunks)
           .withColumn("chunk_id",
                       F.explode(F.sequence(F.lit(0),
                                            F.col("n_chunks") - 1))))
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("__toks__"), start + 1, size)
    return out.select(
        id_col, "chunk_id", "n_chunks",
        start.alias("chunk_start"),
        F.size(piece).alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
