"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language identification,
and document fingerprinting.

These extend the reference's surface (it has no text operators) per the
project brief; everything is built from native Spark SQL expressions — no
Python UDFs — so the operators run at full codegen speed over 100 TB of
documents, and each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash

#: regex for BPE-ish tokenization: word pieces or single non-space symbols
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: small stopword marker sets per language for the n-gram/stopword
#: language-ID heuristic (deterministic, oracle-able)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["that", "for", "on", "with", "as"]


def tokens_expr(c: Column) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count_expr(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_expr(c))


def bpe_token_count_expr(c: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single symbols."""
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), 0))


def quality_features(c: Column) -> dict:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio (cf. quality filters in large-scale
    corpus pipelines, e.g. Gopher/C4 rules — public heuristics)."""
    toks = tokens_expr(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(
        toks, lambda t: t.isin(*STOPWORDS_EN)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": (F.length(F.regexp_replace(c, r"\s+", ""))
                           / F.nullif(n_tok.cast("double"), F.lit(0.0))),
        "punct_ratio": n_punct / F.nullif(n_chars.cast("double"), F.lit(0.0)),
        "stopword_ratio": n_stop / F.nullif(n_tok.cast("double"), F.lit(0.0)),
    }


def quality_score_expr(c: Column) -> Column:
    """Composite quality score in [0, 1]: rewards mid-length docs, prose-like
    token lengths, some stopwords, low punctuation density."""
    f = quality_features(c)
    len_score = F.least(f["n_tokens"] / F.lit(50.0), F.lit(1.0))
    tok_score = F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 10),
                       F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.least(f["stopword_ratio"] * 5, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5)
    return (len_score + tok_score + stop_score + punct_pen) / 4


def language_id_expr(c: Column) -> Column:
    """Heuristic language ID: count marker-stopword hits per language and
    take the argmax (first language in registry order on ties, 'und' when
    no markers hit)."""
    toks = tokens_expr(c)

    def _has(markers):  # single-arg lambda: a 2-arg HOF lambda would be
        return lambda t: t.isin(*markers)  # called with (element, index)

    scores = [
        (lang, F.size(F.filter(toks, _has(markers))))
        for lang, markers in LANG_MARKERS.items()
    ]
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse so earlier languages win ties
    for lang, score in reversed(scores):
        take = score >= best_score
        best = F.when(take & (score > 0), F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


def fingerprint_expr(c: Column, modulus: int = (1 << 57) - 13) -> Column:
    """Polynomial rolling-hash fingerprint of the normalized token stream:
    ``h = (h * 31 + phash(token)) mod M`` — a deterministic document
    signature, exactly reproducible in SQL via list_reduce.  M < 2^57 keeps
    ``31*h + phash`` inside int64 (no overflow on either engine)."""
    toks = tokens_expr(c)
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + phash(t)) % F.lit(modulus))


def normalize_text_expr(c: Column) -> Column:
    """Canonical text normalization for dedup: lowercase, strip
    punctuation, collapse whitespace — the standard pre-pass that turns
    formatting-only variants into exact duplicates."""
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


#: PII patterns that behave identically under Java regex (Spark) and RE2
#: (DuckDB) — keep them free of lookaround/backrefs.  Replacement order
#: matters: email first (its local part may contain dots/digits), then
#: ipv4 (dotted digits), then ssn / phone (disjoint hyphen shapes).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(df, text_col: str, out_col: str = None,
               kinds: tuple = ("email", "ipv4", "ssn", "phone")):
    """Scrub PII from a text column: adds ``n_<kind>`` match counts and
    ``out_col`` (default ``<text_col>_redacted``) with every match
    replaced by ``<KIND>``.  Pure chained ``regexp_replace`` /
    ``regexp_extract_all`` — whole-stage codegen, no shuffle, scales as a
    map-only pass over the corpus."""
    c = F.col(text_col)
    out_col = out_col or f"{text_col}_redacted"
    counts = {f"n_{k}": F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[k]), 0))
              for k in kinds}
    red = c
    for k in kinds:
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    return df.select("*", *[v.alias(n) for n, v in counts.items()],
                     red.alias(out_col))


def repetition_features(df, text_col: str):
    """Within-document repetition metrics (Gopher-style quality rules —
    public heuristics): adds

    - ``dup_word_frac``  — 1 − distinct/total whitespace tokens;
    - ``dup_2gram_frac`` / ``dup_3gram_frac`` — fraction of n-gram
      positions whose n-gram also occurs elsewhere in the doc
      (1 − distinct/total n-grams);
    - ``top_word_frac`` — share of tokens taken by the most frequent one.

    DataFrame-level (not a Column builder) because the token array MUST be
    bound as a real column first: referencing the tokenizer expression
    inside the n-gram / count HOF lambdas would make Catalyst re-run it
    per array element (the measured ~100x trap documented in
    ``dedup.shingles_expr``).  Map-only codegen pass, no shuffle."""
    from orange3_timeseries_spark.operators.dedup import shingles_expr

    bind = {"__toks__": tokens_expr(F.col(text_col)),
            "__sh2__": shingles_expr(F.col(text_col), 2),
            "__sh3__": shingles_expr(F.col(text_col), 3)}
    out = df.select("*", *[v.alias(k) for k, v in bind.items()])
    out = out.withColumn("__srt__", F.array_sort(F.col("__toks__")))
    toks, sh2, sh3 = F.col("__toks__"), F.col("__sh2__"), F.col("__sh3__")
    n = F.size(toks).cast("double")
    n2 = F.greatest(F.size(toks) - 1, F.lit(0)).cast("double")
    n3 = F.greatest(F.size(toks) - 2, F.lit(0)).cast("double")
    # top count = longest equal-run in the SORTED tokens — O(n log n) vs
    # the naive count-each-distinct O(distinct*n) (measured 3.5x at sf0.1)
    st0 = F.struct(F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
                   F.lit(0).cast("long").alias("best"))

    def _run(acc, x):
        run = F.when(x == acc["prev"],
                     acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    top = F.aggregate(F.col("__srt__"), st0, _run, lambda a: a["best"])
    feats = {
        "dup_word_frac":
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.nullif(n, F.lit(0.0)),
        "dup_2gram_frac": F.lit(1.0) - F.size(sh2) / F.nullif(n2, F.lit(0.0)),
        "dup_3gram_frac": F.lit(1.0) - F.size(sh3) / F.nullif(n3, F.lit(0.0)),
        "top_word_frac": top.cast("double") / F.nullif(n, F.lit(0.0)),
    }
    return out.select(*df.columns,
                      *[v.alias(k) for k, v in feats.items()])


def quality_filter(df, text_col: str, min_tokens: int = 5,
                   max_tokens: int = 100000,
                   max_punct_ratio: float = 0.3,
                   min_stopword_ratio: float = 0.0):
    """Row filter keeping documents inside the quality envelope — the
    pipeline gate built from :func:`quality_features`; pure Catalyst
    predicates, pushed as far down as the expressions allow."""
    c = F.col(text_col)
    f = quality_features(c)
    n = token_count_expr(c)
    cond = (n >= F.lit(min_tokens)) & (n <= F.lit(max_tokens)) \
        & (F.coalesce(f["punct_ratio"], F.lit(0.0))
           <= F.lit(max_punct_ratio)) \
        & (F.coalesce(f["stopword_ratio"], F.lit(1.0))
           >= F.lit(min_stopword_ratio))
    return df.where(cond)


def tfidf(df, text_col: str, id_col: str, top_k: int = None):
    """TF-IDF postings per (document, token): ``tf = count/doc_len``,
    ``idf = ln(N/df)``, one row per distinct (doc, token).

    Plan (all map-side-combining, no arrays through shuffles):
    explode tokens carrying the per-doc length as a constant column ->
    ``groupBy(doc, token)`` count [shuffle 1] -> document frequency via a
    count window partitioned by token [shuffle 2; the partitioning is
    reused if a downstream join keys on token] -> corpus size N attached
    as a broadcast 1-row aggregate (no driver-side count job) ->
    optional per-doc top-k window [shuffle 3].  At 100 TB every stage
    shuffles skinny (id, token-hash-sized) rows only.
    """
    from pyspark.sql import Window

    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    df = widen_partitions(df.select(id_col, text_col))
    toks = tokens_expr(F.col(text_col))
    posting = df.select(F.col(id_col),
                        F.size(toks).alias("__len__"),
                        F.explode(toks).alias("token"))
    tf = (posting.groupBy(id_col, "token", "__len__")
          .agg(F.count(F.lit(1)).alias("__tc__")))
    n_df = df.select(F.countDistinct(id_col).alias("__n__"))
    wdf = Window.partitionBy("token")
    # tf has exactly one row per (doc, token), so a plain count over the
    # token partition IS the document frequency
    scored = (tf
              .withColumn("__df__", F.count(F.lit(1)).over(wdf))
              .crossJoin(F.broadcast(n_df))
              .select(
                  F.col(id_col), F.col("token"),
                  (F.col("__tc__") / F.col("__len__").cast("double"))
                  .alias("tf"),
                  F.log(F.col("__n__").cast("double")
                        / F.col("__df__").cast("double")).alias("idf")))
    out = scored.withColumn("tfidf", F.col("tf") * F.col("idf"))
    if top_k is None:
        return out
    wk = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(),
                                            F.col("token").asc())
    return (out.withColumn("rank", F.row_number().over(wk))
            .where(F.col("rank") <= top_k))


def vocabulary(df, text_col: str, top_k: int = None):
    """Corpus vocabulary with frequencies: explode tokens -> one
    map-side-combining groupBy.  Deterministic order (count desc, token
    asc); ``top_k`` limits via window rank."""
    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    df = widen_partitions(df.select(text_col))
    tok = df.select(F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    if top_k is None:
        return counts
    from pyspark.sql import Window
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k))


#: the canonical Gopher "required word" set (Rae et al. 2021, §A1.1):
#: a doc must contain at least 2 of these to count as running English text
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(df, text_col: str, id_col: str,
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_len: float = 3.0,
                         max_mean_len: float = 10.0,
                         min_alpha_frac: float = 0.8,
                         min_stop_hits: int = 2):
    """Gopher-style document quality rules (Rae et al. 2021) as pure
    Catalyst expressions — word-count bounds, mean-word-length band,
    fraction of words containing an alphabetic character, and the
    required-word (stopword) presence rule.  Map-only: at 100 TB every
    rule evaluates inside whole-stage codegen on the scan, and the
    boolean columns make the filter auditable (which rule rejected a doc)
    rather than a silent drop."""
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    mean_len = (F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, t: acc + F.length(t)).cast("double")
                / F.nullif(n.cast("double"), F.lit(0.0)))
    alpha_frac = (F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
                  .cast("double")
                  / F.nullif(n.cast("double"), F.lit(0.0)))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    flags = df.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        n.between(min_words, max_words).alias("ok_word_count"),
        mean_len.between(min_mean_len, max_mean_len).alias("ok_mean_len"),
        (alpha_frac >= min_alpha_frac).alias("ok_alpha"),
        (stop_hits >= min_stop_hits).alias("ok_required_words"))
    return flags.withColumn(
        "gopher_pass",
        F.col("ok_word_count") & F.col("ok_mean_len")
        & F.col("ok_alpha") & F.col("ok_required_words"))


def calibrated_quality_filter(df, text_col: str, id_col: str,
                              strata_col: str, pct: float = 0.2,
                              sample_rate: float = None):
    """Percentile-calibrated quality gate: per stratum (language,
    source, …) compute the ``pct`` quantile of the composite quality
    score and keep documents at or above it — thresholds adapt to each
    stratum's score distribution instead of one hand-tuned constant.

    Returns (id, stratum, score) for kept docs.  The exact percentile
    aggregate buffers each stratum's scores; at corpus scale pass
    ``sample_rate`` to calibrate thresholds on a deterministic hash
    sample (operators/sampling.hash_sample) — quantiles of a 1 % sample
    carry ~1e-2 relative error, far below any meaningful quality cut,
    and the buffered state drops 100x."""
    from pyspark.sql import functions as F

    scored = df.select(F.col(id_col), F.col(strata_col),
                       quality_score_expr(F.col(text_col)).alias("score"))
    cal = scored
    if sample_rate is not None:
        from orange3_timeseries_spark.operators.sampling import hash_sample
        cal = hash_sample(scored, id_col, sample_rate)
    thr = cal.groupBy(strata_col).agg(
        F.expr(f"percentile(score, {pct})").alias("__thr__"))
    return (scored.join(F.broadcast(thr), strata_col)
            .where(F.col("score") >= F.col("__thr__"))
            .select(id_col, strata_col, "score"))


def token_entropy(df, text_col: str, id_col: str):
    """Per-document Shannon entropy (nats) of the whitespace-token
    distribution plus the type-token ratio — the two classic lexical-
    diversity quality signals (low entropy ⇒ boilerplate / repetition;
    TTR near 0 ⇒ keyword stuffing).  Output: ``(id, n_tokens, n_types,
    entropy, type_token_ratio)``.

    Plan: explode → one (id, token) count → one per-id aggregation;
    both groupBys map-side combine, shuffle rows ∝ distinct (id,
    token) pairs.  p = c/n are exact integer ratios; the per-doc term
    sum is rounded 6 dp (the usual association firewall)."""
    from pyspark.sql import functions as F

    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    base = widen_partitions(df.select(id_col, text_col))
    tok = base.select(
        id_col, F.explode(tokens_expr(F.col(text_col))).alias("__t__"))
    c = (tok.groupBy(id_col, "__t__")
         .agg(F.count(F.lit(1)).alias("__c__")))
    from pyspark.sql import Window
    n = F.sum("__c__").over(Window.partitionBy(id_col)).cast("double")
    c = c.withColumn("__n__", n)
    p = F.col("__c__").cast("double") / F.col("__n__")
    term = p * F.log(p)
    out = (c.withColumn("__term__", term)
           .groupBy(id_col)
           .agg(F.max("__n__").alias("__n__"),
                F.count(F.lit(1)).alias("__types__"),
                F.round(-F.sum("__term__"), 6).alias("entropy")))
    return out.select(
        id_col,
        F.col("__n__").cast("long").alias("n_tokens"),
        F.col("__types__").cast("long").alias("n_types"),
        F.when(F.col("entropy") == -0.0, F.lit(0.0))
         .otherwise(F.col("entropy")).alias("entropy"),
        F.round(F.col("__types__").cast("double") / F.col("__n__"), 6)
        .alias("type_token_ratio"))


def bigram_pmi(df, text_col: str, min_count: int = 5,
               top_k: int = 50):
    """Top-``top_k`` token bigram collocations by pointwise mutual
    information ``PMI = ln( p(x,y) / (p(x)·p(y)) )`` with a
    ``min_count`` pair floor (Church & Hanks 1990) — the classic
    phrase-mining / tokenizer-seeding signal ("new york" scores high,
    "of the" does not).  Output: ``(tok_a, tok_b, pair_count, pmi)``.

    Plan: posexplode once, adjacent pairs via one ``lead()`` window on
    the (doc, position) ordering (no self-join), two map-combining
    counts, two broadcast 1-row totals, TakeOrderedAndProject for the
    deterministic (pmi desc, tok_a, tok_b) top-K.  PMI is scalar
    arithmetic on exact integer counts — identical doubles on any
    engine, no rounding firewall needed before the 6-dp display
    rounding."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    base = widen_partitions(df.select("doc_id", text_col)
                            if "doc_id" in df.columns
                            else df.select(text_col))
    idc = "doc_id" if "doc_id" in df.columns else None
    if idc is None:
        base = base.withColumn("__doc__", F.monotonically_increasing_id())
        idc = "__doc__"
    tok = base.select(
        F.col(idc).alias("__doc__"),
        F.posexplode(tokens_expr(F.col(text_col)))
        .alias("__pos__", "__t__"))
    w = Window.partitionBy("__doc__").orderBy("__pos__")
    bg = (tok.withColumn("__tb__", F.lead("__t__", 1).over(w))
          .where(F.col("__tb__").isNotNull())
          .select(F.col("__t__").alias("__ta__"), "__tb__"))
    cb = bg.groupBy("__ta__", "__tb__").agg(
        F.count(F.lit(1)).alias("__cxy__"))
    cu = tok.groupBy("__t__").agg(F.count(F.lit(1)).alias("__c__"))
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("__tt__"))
    btot = bg.agg(F.count(F.lit(1)).cast("double").alias("__bt__"))
    ca = cu.select(F.col("__t__").alias("__ta__"),
                   F.col("__c__").alias("__ca__"))
    cbu = cu.select(F.col("__t__").alias("__tb__"),
                    F.col("__c__").alias("__cb__"))
    j = (cb.where(F.col("__cxy__") >= min_count)
         .join(ca, "__ta__").join(cbu, "__tb__")
         .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(btot)))
    pmi = F.log((F.col("__cxy__").cast("double") / F.col("__bt__"))
                / ((F.col("__ca__").cast("double") / F.col("__tt__"))
                   * (F.col("__cb__").cast("double") / F.col("__tt__"))))
    out = (j.withColumn("__pmi__", F.round(pmi, 6))
           .orderBy(F.col("__pmi__").desc(), F.col("__ta__").asc(),
                    F.col("__tb__").asc())
           .limit(top_k))
    return out.select(F.col("__ta__").alias("tok_a"),
                      F.col("__tb__").alias("tok_b"),
                      F.col("__cxy__").cast("long").alias("pair_count"),
                      F.col("__pmi__").alias("pmi"))


def readability(df, text_col: str, id_col: str):
    """Flesch reading-ease per document: ``(id, n_words, n_sentences,
    n_syllables, flesch)`` with

        ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``

    — the classic readability gate (high = simple prose, negative =
    dense/technical/garbled), complementing the Gopher rules: a
    perfectly "clean" document that scores −40 is a parts catalog,
    not training prose.

    Syllables use the standard vowel-group heuristic (runs of
    ``[aeiouy]``, minimum 1 per word) — deterministic integer counts;
    sentences count terminal-punctuation runs (``[.!?]+``, minimum 1).
    Pure Catalyst regexp + integer arithmetic, map-only per document;
    the one float expression is replayed verbatim by the oracle."""
    toks = tokens_expr(F.col(text_col))
    words = F.size(toks)
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit(r"[.!?]+"), 0)), F.lit(1))
    syl_per_word = F.transform(
        toks, lambda w: F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
            F.lit(1)))
    syllables = F.aggregate(syl_per_word, F.lit(0),
                            lambda acc, v: acc + v)
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (words.cast("double")
                                / sentences.cast("double"))
              - F.lit(84.6) * (syllables.cast("double")
                               / words.cast("double")))
    return (df.where(words > 0)
            .select(F.col(id_col),
                    words.cast("bigint").alias("n_words"),
                    sentences.cast("bigint").alias("n_sentences"),
                    syllables.cast("bigint").alias("n_syllables"),
                    F.round(flesch, 6).alias("flesch")))
