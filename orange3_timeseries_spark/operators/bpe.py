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
  learned merges as a chain of literal `replace` expressions over the
  space-separated symbol form — pure Catalyst, no Python in the hot
  path — against the (bounded, broadcast) vocabulary, which then
  joins back to exploded corpus words.

Determinism contract (what makes a SQL oracle replay training exactly):
pair frequencies are counted per adjacent symbol POSITION (a run
``aaa`` contributes 2 to the pair ``(a, a)`` — standard BPE), merges
apply greedy left-to-right non-overlapping (``aaa`` → ``aa a`` —
also standard), and the best pair ties break on (count desc, left asc,
right asc) with binary string comparison.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_count_table", "train_bpe", "bpe_token_count_table",
           "bpe_doc_token_counts"]


def word_count_table(df: DataFrame, text_col: str,
                     max_vocab: int = 50_000) -> DataFrame:
    """(w, cnt) for the ``max_vocab`` most frequent whitespace words
    (ties broken by the word, so the cap is deterministic)."""
    words = df.select(F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("w")).where(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.orderBy(F.col("cnt").desc(), F.col("w").asc()) \
        .limit(max_vocab)


def _symize(word: str) -> str:
    """`` a b c `` space-anchored symbol form of a word."""
    return " " + " ".join(word) + " "


def train_bpe(df: DataFrame, text_col: str, n_merges: int,
              max_vocab: int = 50_000) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...].

    The driver loop touches only the capped word-count table (bounded
    by ``max_vocab`` at any corpus size); each iteration is pure Python
    over that table — no per-iteration Spark job."""
    rows = word_count_table(df, text_col, max_vocab).collect()
    vocab = [[_symize(r["w"]), int(r["cnt"])] for r in rows]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for s, cnt in vocab:
            syms = s.split()
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pat = f" {best[0]} {best[1]} "
        rep = f" {best[0]}{best[1]} "
        for ent in vocab:
            ent[0] = ent[0].replace(pat, rep)
        merges.append(best)
    return merges


def _merge_chain(col: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    """Space-anchored symbol form of a word column with the merge list
    applied — a chain of literal ``replace`` expressions (greedy
    left-to-right non-overlapping, the BPE merge semantics), fully
    inside whole-stage codegen."""
    sym = F.concat(F.lit(" "), F.regexp_replace(col, "(.)", "$1 "))
    for left, right in merges:
        sym = F.replace(sym, F.lit(f" {left} {right} "),
                        F.lit(f" {left}{right} "))
    return sym


def bpe_token_count_table(df: DataFrame, text_col: str,
                          merges: Sequence[Tuple[str, str]],
                          max_vocab: int = 50_000) -> DataFrame:
    """(w, n_tok): BPE token count per distinct corpus word under the
    given merges.  The replace chain runs over the BOUNDED vocabulary
    (not per corpus row) — encoding cost is O(vocab), corpus cost is
    the join below."""
    wc = word_count_table(df, text_col, max_vocab)
    sym = _merge_chain(F.col("w"), merges)
    toks = F.size(F.filter(F.split(sym, " "), lambda x: x != ""))
    return wc.select("w", toks.alias("n_tok"))


def bpe_doc_token_counts(df: DataFrame, id_col: str, text_col: str,
                         merges: Sequence[Tuple[str, str]],
                         max_vocab: int = 50_000) -> DataFrame:
    """(id, n_tokens): BPE token count per document — exploded corpus
    words equi-join the broadcast word→token-count table (every word is
    in the table when ``max_vocab`` is not binding; with a binding cap
    out-of-vocab words fall back to their character count)."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w")) \
        .where(F.col("w") != "")
    tok = bpe_token_count_table(df, text_col, merges, max_vocab)
    fallback = F.length("w")
    return (words.join(F.broadcast(tok), "w", "left")
            .groupBy(id_col)
            .agg(F.sum(F.coalesce(F.col("n_tok"), fallback))
                 .alias("n_tokens")))
