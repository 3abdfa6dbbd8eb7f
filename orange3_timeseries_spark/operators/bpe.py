"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The classic corpus→tokenizer step of an LLM data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"): start from characters, repeatedly merge the most frequent
adjacent symbol pair.  The split of work follows the IVF/ARIMA pattern
used elsewhere in this engine:

- **data-sized step distributed**: the word-frequency table comes from
  one `split → explode → groupBy` over the corpus (the only pass that
  touches every byte at 100 TB), capped to a bounded vocabulary by a
  distributed ``orderBy(count desc, word).limit(max_vocab)``
  (TakeOrdered — never a full collect);
- **model-sized step bounded**: the merge loop runs driver-side over
  that capped table (at most ``max_vocab`` rows regardless of corpus
  size — the standard practice: BPE trainers operate on word counts,
  not raw text);
- **application distributed and JVM-side**: encoding applies the
  learned merges as a chain of literal `replace` expressions — pure
  Catalyst, no Python in the hot path — against the (bounded,
  broadcast) vocabulary, which then joins back to exploded corpus
  words.

Symbol representation — every symbol is WRAPPED individually as
``SEP + sym + SEP`` (SEP = chr(31), the ASCII unit separator), so an
adjacent pair reads ``SEPxSEPSEPySEP`` with NO shared characters
between neighboring pairs.  That makes a plain non-overlapping
left-to-right ``replace`` of the pair pattern EXACTLY the greedy
left-to-right BPE merge (``aaaa`` + merge (a,a) → ``aa aa``, not the
``aa a a`` a shared-separator encoding produces — the classic
anchored-replace pitfall), on Python, Catalyst, and SQL alike.  Symbol
count falls out as ``count(SEP) / 2`` — each symbol carries exactly
two separators.  Words containing SEP itself (never produced by
whitespace tokenization of text; chr(31) is a control character) are
dropped from the vocabulary for safety.

Determinism contract (what makes a SQL oracle replay training exactly):
pair frequencies are counted per adjacent symbol POSITION (a run
``aaa`` contributes 2 to the pair ``(a, a)`` — standard BPE), merges
apply greedy left-to-right, and the best pair ties break on (count
desc, left asc, right asc) with binary string comparison.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SEP", "word_count_table", "train_bpe",
           "bpe_token_count_table", "bpe_doc_token_counts"]

SEP = "\x1f"


def word_count_table(df: DataFrame, text_col: str,
                     max_vocab: int = 50_000) -> DataFrame:
    """(w, cnt) for the ``max_vocab`` most frequent whitespace words
    (ties broken by the word, so the cap is deterministic).  Words
    containing the symbol separator chr(31) are excluded (see module
    docstring)."""
    words = df.select(F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("w")).where((F.col("w") != "")
                                         & ~F.col("w").contains(SEP))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.orderBy(F.col("cnt").desc(), F.col("w").asc()) \
        .limit(max_vocab)


def _symize(word: str) -> str:
    """``|a||b||c|`` wrapped symbol form (| denotes chr(31))."""
    return "".join(SEP + ch + SEP for ch in word)


def _pat(left: str, right: str) -> Tuple[str, str]:
    return (f"{SEP}{left}{SEP}{SEP}{right}{SEP}",
            f"{SEP}{left}{right}{SEP}")


def train_bpe(df: DataFrame, text_col: str, n_merges: int,
              max_vocab: int = 50_000,
              word_counts: Optional[DataFrame] = None
              ) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...].

    The driver loop touches only the capped word-count table (bounded
    by ``max_vocab`` at any corpus size); each iteration is pure Python
    over that table — no per-iteration Spark job.  Pass a precomputed
    ``word_counts`` (from :func:`word_count_table`) to share the
    corpus-sized pass with the encoding side."""
    wc = word_counts if word_counts is not None \
        else word_count_table(df, text_col, max_vocab)
    rows = wc.collect()
    vocab = [[_symize(r["w"]), int(r["cnt"])] for r in rows]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for s, cnt in vocab:
            syms = s[1:-1].split(SEP + SEP) if s else []
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pat, rep = _pat(*best)
        for ent in vocab:
            ent[0] = ent[0].replace(pat, rep)
        merges.append(best)
    return merges


def _merge_chain(col: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    """Wrapped symbol form of a word column with the merge list applied
    — a chain of literal ``replace`` expressions.  With wrapped
    symbols, non-overlapping left-to-right replace IS the greedy BPE
    merge; the chain runs fully inside whole-stage codegen."""
    sym = F.regexp_replace(col, "(.)", f"{SEP}$1{SEP}")
    for left, right in merges:
        pat, rep = _pat(left, right)
        sym = F.replace(sym, F.lit(pat), F.lit(rep))
    return sym


def bpe_token_count_table(df: DataFrame, text_col: str,
                          merges: Sequence[Tuple[str, str]],
                          max_vocab: int = 50_000,
                          word_counts: Optional[DataFrame] = None
                          ) -> DataFrame:
    """(w, n_tok): BPE token count per distinct corpus word under the
    given merges — ``count(SEP) / 2`` of the merged symbol string.  The
    replace chain runs over the BOUNDED vocabulary (not per corpus
    row); pass ``word_counts`` to reuse the corpus scan the trainer
    already did."""
    wc = word_counts if word_counts is not None \
        else word_count_table(df, text_col, max_vocab)
    sym = _merge_chain(F.col("w"), merges)
    toks = ((F.length(sym)
             - F.length(F.replace(sym, F.lit(SEP), F.lit("")))) / 2) \
        .cast("int")
    return wc.select("w", toks.alias("n_tok"))


def bpe_doc_token_counts(df: DataFrame, id_col: str, text_col: str,
                         merges: Sequence[Tuple[str, str]],
                         max_vocab: int = 50_000,
                         word_counts: Optional[DataFrame] = None
                         ) -> DataFrame:
    """(id, n_tokens): BPE token count per document — exploded corpus
    words equi-join the broadcast word→token-count table (every word is
    in the table when ``max_vocab`` is not binding; with a binding cap
    out-of-vocab words fall back to their character count)."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w")) \
        .where(F.col("w") != "")
    tok = bpe_token_count_table(df, text_col, merges, max_vocab,
                                word_counts=word_counts)
    fallback = F.length("w")
    return (words.join(F.broadcast(tok), "w", "left")
            .groupBy(id_col)
            .agg(F.sum(F.coalesce(F.col("n_tok"), fallback))
                 .alias("n_tokens")))


def bpe_fertility(df: DataFrame, id_col: str, text_col: str,
                  merges: Sequence[Tuple[str, str]],
                  max_vocab: int = 50_000,
                  word_counts: Optional[DataFrame] = None) -> DataFrame:
    """Per-document tokenizer-quality profile under the given merges:
    ``(id, n_words, n_tokens, n_unmerged, fertility, unmerged_ratio)``.

    ``fertility`` (tokens per whitespace word) is THE standard
    tokenizer-fit metric — near 1 means the vocabulary covers the text,
    high values mean the text fragments into many subwords (wrong
    domain/language for the merges).  ``n_unmerged`` counts multi-char
    words the merge list never helped at all (token count == character
    count) — the OOV-ish tail; ``unmerged_ratio`` divides by the
    multi-char word count (NULL when a doc has none).

    Same plan shape as :func:`bpe_doc_token_counts`: the replace chain
    runs over the BOUNDED vocabulary, documents equi-join the broadcast
    word→count table — exchanges = 2, no Python."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w")) \
        .where(F.col("w") != "")
    tok = bpe_token_count_table(df, text_col, merges, max_vocab,
                                word_counts=word_counts)
    ntok = F.coalesce(F.col("n_tok"), F.length("w"))
    multi = F.length("w") > 1
    unmerged = (multi & (ntok == F.length("w"))).cast("int")
    agg = (words.join(F.broadcast(tok), "w", "left")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_words"),
                F.sum(ntok).alias("n_tokens"),
                F.sum(unmerged).alias("n_unmerged"),
                F.sum(multi.cast("int")).alias("__nm__")))
    return agg.select(
        F.col(id_col), F.col("n_words"), F.col("n_tokens"),
        F.col("n_unmerged").cast("bigint").alias("n_unmerged"),
        F.round(F.col("n_tokens").cast("double")
                / F.col("n_words").cast("double"), 6).alias("fertility"),
        F.round(F.col("n_unmerged").cast("double")
                / F.nullif(F.col("__nm__"), F.lit(0)).cast("double"), 6)
        .alias("unmerged_ratio"))
