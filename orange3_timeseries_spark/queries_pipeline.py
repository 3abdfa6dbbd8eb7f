"""Oracle-checked queries for the training-data pipeline operators
(dedup / similarity / text analysis) over the ``documents`` and
``embeddings`` tables.

Because every hash in the engine is the portable md5-based ``phash``
(operators/hashing.py), the DuckDB oracles replay the *entire* pipeline —
shingling, minhash, banding, simhash bit votes, rolling fingerprints —
value-for-value, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators import dedup as D
from orange3_timeseries_spark.operators.localrel import local_df
from orange3_timeseries_spark.operators import similarity as S
from orange3_timeseries_spark.operators import text as T
from orange3_timeseries_spark.queries import query, r6
from orange3_timeseries_spark.sources import read_table

# DuckDB building blocks
_PH = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SHINGLES = ("list_distinct(list_transform(range(1, greatest(len({t}) - 1, 1)),"
             " i -> array_to_string(list_slice({t}, i, i + 2), ' ')))"
             .format(t=_TOKS))


# ------------------------------------------------------------------ text tier
@query("text_token_counts", f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(regexp_extract_all(lower(text),
           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)) AS n_bpe_tokens,
       length(text) AS n_chars_m
FROM documents
""")
def q_text_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counting (pipeline brief: token counting)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count_expr(F.col("text")).alias("n_tokens"),
        T.bpe_token_count_expr(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_m"))


_STOP_LIST = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)


@query("text_quality", f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       round(length(regexp_replace(text, '\\s+', '', 'g'))
             / nullif(len(toks), 0), 6) AS mean_token_len,
       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
             / nullif(length(text), 0), 6) AS punct_ratio,
       round(len(list_filter(toks, x -> x IN ({_STOP_LIST})))
             / nullif(len(toks), 0), 6) AS stopword_ratio
FROM t
""")
def q_text_quality(spark, sf_dir):
    """Quality-scoring features: mean token length, punctuation ratio,
    stopword ratio."""
    d = read_table(spark, sf_dir, "documents")
    f = T.quality_features(F.col("text"))
    return d.select("doc_id",
                    r6(f["mean_token_len"], "mean_token_len"),
                    r6(f["punct_ratio"], "punct_ratio"),
                    r6(f["stopword_ratio"], "stopword_ratio"))


def _lang_sql():
    counts = {
        lang: (f"len(list_filter({_TOKS}, x -> x IN "
               f"({', '.join(repr(w) for w in m)})))")
        for lang, m in T.LANG_MARKERS.items()
    }
    e, s, fr, de = counts["en"], counts["es"], counts["fr"], counts["de"]
    return f"""
SELECT doc_id, lang AS labeled_lang,
  CASE WHEN {e} >= {s} AND {e} >= {fr} AND {e} >= {de} AND {e} > 0 THEN 'en'
       WHEN {s} >= {fr} AND {s} >= {de} AND {s} > 0 THEN 'es'
       WHEN {fr} >= {de} AND {fr} > 0 THEN 'fr'
       WHEN {de} > 0 THEN 'de'
       ELSE 'und' END AS pred_lang
FROM documents
"""


@query("text_language_id", _lang_sql())
def q_text_language_id(spark, sf_dir):
    """Stopword-marker language-ID heuristic (argmax with registry-order
    tie-break)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("lang").alias("labeled_lang"),
                    T.language_id_expr(F.col("text")).alias("pred_lang"))


_FP_M = (1 << 57) - 13


@query("text_fingerprint", f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
                      list_transform({_TOKS}, t -> {_PH.format(e='t')})),
         (a, b) -> (a * 31 + b) % {_FP_M}) AS fingerprint
FROM documents
""")
def q_text_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (token stream, mod 2^57-13)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id",
                    T.fingerprint_expr(F.col("text")).alias("fingerprint"))


# ----------------------------------------------------------------- dedup tier
@query("dedup_exact", """
SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_members
FROM documents GROUP BY 1
""")
def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups by content digest (hash-groupBy)."""
    d = read_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, "text", "doc_id")


def _substring_pairs_sql():
    """Positional-gram substring-pair detection as one nestable query
    (used by both the pair query and the substring dedup corpus)."""
    return f"""
WITH g AS (
  SELECT doc_id, i AS pos,
         {_PH.format(e="substr(text, i, 40)")} AS h
  FROM documents,
       LATERAL unnest(range(1, greatest(len(text) - 40 + 1, 0) + 1)) t(i)),
sel0 AS (SELECT * FROM g WHERE h % 4 = 0),
rare AS (  -- max_df boilerplate-gram cap (non-binding on the fixture,
           -- replayed so the verified path IS the production path)
  SELECT h FROM sel0 GROUP BY h HAVING count(DISTINCT doc_id) <= 1000),
sel AS (SELECT sel0.* FROM sel0 JOIN rare USING (h)),
m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id),
r AS (
  SELECT id_a, id_b, diag, pa,
         CASE WHEN lag(pa) OVER w IS NULL
                OR pa - lag(pa) OVER w > 40 THEN 1 ELSE 0 END AS nr
  FROM m WINDOW w AS (PARTITION BY id_a, id_b, diag ORDER BY pa)),
r2 AS (
  SELECT id_a, id_b, diag, pa,
         sum(nr) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa) AS run
  FROM r),
runs AS (
  SELECT id_a, id_b, diag, run, max(pa) - min(pa) + 40 AS rl
  FROM r2 GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, max(rl) AS longest
FROM runs GROUP BY 1, 2 HAVING max(rl) >= 150
"""


@query("dedup_substring_pairs", _substring_pairs_sql())
def q_dedup_substring_pairs(spark, sf_dir):
    """Exact long-shared-substring pairs (suffix-array-style dedup
    modality, Lee et al. 2022): content-selected positional 40-gram
    fingerprints (portable phash, mod-4 sampling), diagonal run-length
    merge, pairs with a proven contiguous identical span >= 150 chars."""
    d = read_table(spark, sf_dir, "documents")
    return D.substring_pairs(d, "text", "doc_id", min_len=150,
                             gram_len=40, mod=4, max_df=1000)


@query("dedup_ngram_jaccard", f"""
WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0),
             6) AS jaccard
FROM sh a, sh b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.s, b.s))::DOUBLE
      / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0) >= 0.2
""")
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs at tau=0.2 (the quadratic
    verifier; the LSH path below is the scale variant).  Runs with the
    default ``max_df=64`` stop-shingle cap — max observed df is 7 at
    sf0.01 and 25 at sf0.1, so the result is bit-identical to the
    uncapped oracle at driver scales while the Σdf² join blow-up stays
    bounded at corpus scale."""
    d = read_table(spark, sf_dir, "documents")
    out = D.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.2,
                                max_df=64)
    return out.select("id_a", "id_b", r6(F.col("jaccard"), "jaccard"))


def _minhash_sig_sql(k=16):
    from orange3_timeseries_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    a, b = minhash_coeffs(k)
    base = _PH.format(e="x") + " % 1073741824"
    mins = ", ".join(
        f"coalesce(list_min(list_transform(hs, h -> "
        f"({a[i]} * h + {b[i]}) % {MINHASH_P})), {MINHASH_P}) AS m{i}"
        for i in range(k))
    return f"WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents),\n" \
           f"hsrc AS (SELECT doc_id, list_transform(s, x -> {base}) AS hs," \
           f" s FROM sh),\n" \
           f"sig AS (SELECT doc_id, {mins} FROM hsrc)"


def _minhash_query_sql(k=16):
    cols = " || '-' || ".join(f"m{i}::VARCHAR" for i in range(k))
    return (_minhash_sig_sql(k)
            + f"\nSELECT doc_id, ({cols}) AS sig_str FROM sig")


@query("dedup_minhash_signatures", _minhash_query_sql())
def q_dedup_minhash_signatures(spark, sf_dir):
    """16-permutation MinHash signatures (portable hashing — the oracle
    recomputes identical signatures)."""
    d = read_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(d, "text", "doc_id", k=16, n=3)
    return sigs.select(
        "doc_id",
        F.concat_ws("-", *[F.col("sig")[i].cast("string")
                           for i in range(16)]).alias("sig_str"))


def _minhash_pairs_sql(k=16, bands=4, threshold=0.2):
    rpb = k // bands
    band_keys = ", ".join(
        _PH.format(e="(" + " || ',' || ".join(
            f"m{b * rpb + r}::VARCHAR" for r in range(rpb)) + ")")
        + f" AS bk{b}" for b in range(bands))
    return f"""{_minhash_sig_sql(k)},
bk AS (SELECT doc_id, {band_keys} FROM sig),
entries AS (
  SELECT doc_id, u.band, u.key FROM bk,
  LATERAL (SELECT * FROM (VALUES {", ".join(f"({b}, bk{b})" for b in range(bands))})
           AS v(band, key)) u),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM entries a JOIN entries b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       round(len(list_intersect(x.s, y.s))::DOUBLE
             / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0),
             6) AS jaccard
FROM cand
JOIN sh x ON x.doc_id = id_a
JOIN sh y ON y.doc_id = id_b
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0)
      >= {threshold}
"""


@query("dedup_minhash_lsh_pairs", _minhash_pairs_sql())
def q_dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (4 bands x 4 rows) verified with exact
    Jaccard >= 0.2 — the oracle replays banding + verification exactly."""
    d = read_table(spark, sf_dir, "documents")
    out = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                              threshold=0.2)
    return out.select("id_a", "id_b", r6(F.col("jaccard"), "jaccard"))


_SIMHASH48_SIG = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
th AS (SELECT doc_id, {_PH.format(e='t')} AS h FROM tok),
bits AS (SELECT doc_id, i,
                sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM th, generate_series(0, 47) g(i) GROUP BY 1, 2),
sig AS (SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)
                    AS BIGINT) AS sig
        FROM bits GROUP BY 1)
"""


@query("dedup_simhash_pairs", _SIMHASH48_SIG + """,
entries AS (
  SELECT doc_id, sig, u.band, u.key FROM sig,
  LATERAL (SELECT * FROM (VALUES (0, (sig >> 0) & 4095),
                                 (1, (sig >> 12) & 4095),
                                 (2, (sig >> 24) & 4095),
                                 (3, (sig >> 36) & 4095)) AS v(band, key)) u)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM entries a JOIN entries b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
""")
def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: 12-bit band blocking over 48-bit signatures
    (pigeonhole catches every pair within Hamming distance 3) + exact
    Hamming verification — the oracle replays signatures, banding AND
    verification.  48/12 rather than 32/8 is the scale choice: 4096-key
    bands keep bucket occupancy — and with it the |bucket|^2 candidate
    volume — bounded as the corpus grows (measured at sf0.1: 2.7M
    candidates / 129k "near-dups" with 32/8 vs 789k / 7.1k with 48/12 —
    the wider signature is both cheaper AND far more selective)."""
    d = read_table(spark, sf_dir, "documents")
    out = D.simhash_pairs(d, "text", "doc_id", bits=48, max_distance=3,
                          band_bits=12)
    return out.select("id_a", "id_b", F.col("hamming").cast("int")
                      .alias("hamming"))


@query("text_tfidf_top3", f"""
WITH posting AS (
  SELECT doc_id, len({_TOKS}) AS dlen, unnest({_TOKS}) AS token
  FROM documents),
tf AS (SELECT doc_id, token, dlen, count(*) AS tc
       FROM posting GROUP BY 1, 2, 3),
scored AS (
  SELECT doc_id, token,
         tc / dlen::DOUBLE AS tf,
         ln((SELECT count(DISTINCT doc_id) FROM documents)::DOUBLE
            / count(*) OVER (PARTITION BY token)) AS idf
  FROM tf)
SELECT doc_id, token, round(tf * idf, 6) AS tfidf, CAST(rank AS INT) AS rank
FROM (SELECT doc_id, token, tf, idf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf * idf DESC, token ASC) AS rank
      FROM scored) t
WHERE rank <= 3
""")
def q_text_tfidf_top3(spark, sf_dir):
    """Top-3 TF-IDF terms per document (tf = count/len, idf = ln(N/df),
    deterministic tfidf/token tie-break) — the standard keyword-extraction
    / relevance-weighting primitive over the corpus."""
    d = read_table(spark, sf_dir, "documents")
    out = T.tfidf(d, "text", "doc_id", top_k=3)
    return out.select("doc_id", "token",
                      r6(F.col("tfidf"), "tfidf"),
                      F.col("rank").cast("int").alias("rank"))


@query("dedup_simhash", f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
th AS (SELECT doc_id, {_PH.format(e='t')} AS h FROM tok),
bits AS (SELECT doc_id, i,
                sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM th, generate_series(0, 31) g(i) GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY 1
""")
def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash signatures via per-token bit votes — two-stage
    aggregation (map-side-combining vote sums), same formulation as the
    oracle; the row-wise HOF fold is equivalence-tested in
    tests/test_property.py."""
    d = read_table(spark, sf_dir, "documents")
    return D.simhash_signatures(d, "text", "doc_id") \
        .withColumnRenamed("sig", "simhash")


# ------------------------------------------------------------ similarity tier
@query("ann_bruteforce_topk", """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, c.vec_id AS nn_id,
         round(list_cosine_similarity(c.v, q.qv), 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(list_cosine_similarity(c.v, q.qv), 6)
                                     DESC, c.vec_id) AS rank
  FROM c, q WHERE c.vec_id != q.query_id) t
WHERE rank <= 5
""")
def q_ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-5 neighbors for the first 10 query vectors
    (broadcast cross-join + per-query window rank)."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.brute_force_topk(e, queries, k=5)


@query("embedding_neardup", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
""")
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs at tau=0.35."""
    e = read_table(spark, sf_dir, "embeddings")
    out = S.embedding_neardup_pairs(e, threshold=0.35)
    return out.select("id_a", "id_b", "cosine")


def _lsh_topk_sql(k=5, n_planes=8, dim=64, seed=42):
    """Oracle replays the hyperplane signatures with the SAME planes,
    inlined as literals (deterministic seeded generation)."""
    from orange3_timeseries_spark.operators.similarity import make_planes

    planes = make_planes(dim, n_planes, seed)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in p)}])"
        f" > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, ({bits}) AS bucket FROM c),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig
      WHERE vec_id < 10)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT q.query_id, s.vec_id AS nn_id,
         round(list_cosine_similarity(s.v, q.qv), 6) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(s.v, q.qv), 6) DESC,
                      s.vec_id) AS rank
  FROM sig s JOIN q ON s.bucket = q.bucket AND s.vec_id != q.query_id) t
WHERE rank <= {k}
"""


@query("ann_lsh_topk", _lsh_topk_sql())
def q_ann_lsh_topk(spark, sf_dir):
    """Approximate top-5 neighbors via random-hyperplane LSH bucketing —
    the sub-linear scale path (candidates share the query's bucket).  The
    oracle replays the identical plane projections, so bucketing AND
    ranking are value-hash-checked."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.lsh_topk(e, queries, k=5)


@query("ann_ivf_served_topk", """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv,
                list_inner_product(v, v) / 2.0 AS half_cc
         FROM c WHERE vec_id < 16),
assign AS (  -- nearest centroid per corpus vector: argmax(x.c - |c|^2/2),
             -- numpy-argmax tie -> lowest centroid index
  SELECT vec_id AS nn_id, v AS cvec, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_inner_product(v, cv) - half_cc
                                     DESC, cid) AS rnk
  FROM c CROSS JOIN cent QUALIFY rnk = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 10),
probes AS (  -- each query probes its 4 nearest inverted lists
  SELECT query_id, qv, cid,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_inner_product(qv, cv) - half_cc
                                     DESC, cid) AS prnk
  FROM q CROSS JOIN cent QUALIFY prnk <= 4),
cand AS (
  SELECT p.query_id, a.nn_id,
         round(list_cosine_similarity(a.cvec, p.qv), 6) AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid
  WHERE p.query_id != a.nn_id)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nn_id) AS rank
  FROM cand) t
WHERE rank <= 5
""")
def q_ann_ivf_served_topk(spark, sf_dir):
    """The IVF SERVING path under a full value-hash oracle: centroids
    are injected deterministically (the first 16 corpus embeddings, a
    bounded 16-row collect), so nearest-centroid assignment, the
    per-query nprobe=4 probe list, the inverted-list equi-join, and the
    cosine top-5 window are all hash-verified — everything except Lloyd
    training, which a driver-side ``limit(sample)`` makes row-order
    dependent (the trained variant below stays rows-only + recall-
    tested).  Centroid INDEX equals vec_id here, so numpy's
    first-index argmax tie-break maps to ORDER BY score DESC, cid."""
    e = read_table(spark, sf_dir, "embeddings")
    cent_rows = (e.where(F.col("vec_id") < 16).orderBy("vec_id")
                 .select("embedding").collect())
    centroids = [[float(x) for x in r.embedding] for r in cent_rows]
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.ivf_topk(e, queries, k=5, n_centroids=16, nprobe=4,
                      centroids=centroids)


def _lloyd_assign_stages(n_centroids=16, sample=2048, iters=10):
    """Shared unrolled-Lloyd CTE stages: deterministic training replay
    ending in ``centf`` (final centroids + half-norms) and ``assignf``
    (every corpus vector with its nearest centroid and DOUBLE vector) —
    the common prefix of the trained-IVF serving oracle and the
    SemDeDup / range-search oracles."""
    stages = [f"""samp AS MATERIALIZED (
  SELECT v, rn FROM (
    SELECT embedding::DOUBLE[] AS v,
           row_number() OVER (ORDER BY vec_id) - 1 AS rn
    FROM embeddings) t
  WHERE rn < {sample}),
nn AS (SELECT count(*) AS cnt FROM samp),
cent0 AS MATERIALIZED (
  SELECT g.i AS cid, s.v AS cv
  FROM (SELECT unnest(generate_series(0, {n_centroids - 1})) AS i) g
  CROSS JOIN nn
  JOIN samp s ON s.rn = (g.i * nn.cnt) // {n_centroids})"""]
    for t in range(1, iters + 1):
        p = t - 1
        stages.append(f"""assign{t} AS MATERIALIZED (
  SELECT s.rn, s.v, c.cid
  FROM samp s CROSS JOIN cent{p} c
  QUALIFY row_number() OVER (PARTITION BY s.rn
      ORDER BY list_inner_product(s.v, c.cv)
               - list_inner_product(c.cv, c.cv) / 2.0 DESC, c.cid) = 1),
means{t} AS MATERIALIZED (
  SELECT cid, list(mv ORDER BY d) AS cv FROM (
    SELECT cid, d, round(avg(val), 6) AS mv
    FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS d
          FROM assign{t}) u
    GROUP BY cid, d) m
  GROUP BY cid),
cent{t} AS MATERIALIZED (
  SELECT p.cid,
         coalesce(m.cv, list_transform(p.cv, x -> round(x, 6))) AS cv
  FROM cent{p} p LEFT JOIN means{t} m USING (cid))""")
    stages.append(f"""centf AS (
  SELECT cid, cv, list_inner_product(cv, cv) / 2.0 AS half_cc
  FROM cent{iters}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assignf AS (
  SELECT vec_id AS nn_id, v AS cvec, cid
  FROM c CROSS JOIN centf
  QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY list_inner_product(v, cv) - half_cc DESC, cid) = 1)""")
    return stages


def _ivf_trained_sql(n_centroids=16, sample=2048, iters=10,
                     nprobe=4, k=5, n_queries=10):
    """Unrolled-Lloyd replay of the trained IVF path: DuckDB re-runs the
    ENTIRE training — ordered sample, evenly spaced init, ``iters``
    assignment/recompute rounds with first-index tie-break, empty-cluster
    carry, 6-dp centroid rounding per round (the rounding is what pins
    both sides to identical centroids instead of float-associativity
    noise) — then the same serving replay ``ann_ivf_served_topk`` uses."""
    stages = _lloyd_assign_stages(n_centroids, sample, iters)
    stages.append(f"""q AS (SELECT vec_id AS query_id, v AS qv FROM c
      WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv, cid
  FROM q CROSS JOIN centf
  QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY list_inner_product(qv, cv) - half_cc DESC,
               cid) <= {nprobe}),
cand AS (
  SELECT p.query_id, a.nn_id,
         round(list_cosine_similarity(a.cvec, p.qv), 6) AS cosine
  FROM probes p JOIN assignf a ON a.cid = p.cid
  WHERE p.query_id != a.nn_id)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nn_id) AS rank
  FROM cand) t
WHERE rank <= {k}"""


@query("ann_ivf_topk", _ivf_trained_sql())
def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-5 on the TRAINED path, under a full value-hash
    oracle: content-deterministic Lloyd training (ordered smallest-id
    sample, evenly spaced init, per-round 6-dp centroid rounding — see
    ``train_ivf_centroids(id_col=...)``), corpus inverted-listed by
    centroid, queries probe 4 lists.  DuckDB replays training AND serving
    (unrolled-iteration CTEs), so the one previously rows-only stage of
    the IVF family is now hash-verified end to end; recall vs brute force
    stays asserted in tests/test_similarity.py."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.ivf_topk(e, queries, k=5, n_centroids=16, nprobe=4)


def _clusters_sql():
    """Connected components via recursive min-label propagation — the
    exact SQL mirror of the Spark label-propagation loop."""
    pairs = _minhash_pairs_sql()
    return f"""
WITH RECURSIVE p AS ({pairs}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
)
SELECT id AS doc_id, min(lab) AS cluster_id FROM cc GROUP BY id
"""


@query("dedup_clusters", _clusters_sql())
def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: connected components over the verified
    minhash-LSH pair graph, every doc labeled with its component's min id
    — oracle = recursive-CTE label propagation over the identical pairs."""
    d = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                                threshold=0.2)
    return D.dedup_clusters(d, pairs, "doc_id")


def _dedup_corpus_sql():
    pairs = _minhash_pairs_sql()
    return f"""
WITH RECURSIVE p AS ({pairs}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
),
lab AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM cc GROUP BY id)
SELECT d.doc_id, length(d.text) AS n_chars
FROM documents d JOIN lab USING (doc_id)
WHERE lab.cluster_id = d.doc_id
"""


@query("dedup_corpus", _dedup_corpus_sql())
def q_dedup_corpus(spark, sf_dir):
    """The DEDUPLICATED corpus — the terminal dedup-pipeline step: keep
    one canonical document (min id) per near-duplicate cluster plus all
    unclustered documents; oracle = recursive-CTE label propagation with
    the canonical filter."""
    d = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                                threshold=0.2)
    out = D.dedup_corpus(d, pairs, "doc_id")
    return out.select("doc_id", F.length("text").alias("n_chars"))


def _substring_corpus_sql():
    return f"""
WITH RECURSIVE p AS (SELECT id_a, id_b FROM ({_substring_pairs_sql()})),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
),
lab AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM cc GROUP BY id)
SELECT d.doc_id, length(d.text) AS n_chars
FROM documents d JOIN lab USING (doc_id)
WHERE lab.cluster_id = d.doc_id
"""


@query("substring_dedup_corpus", _substring_corpus_sql())
def q_substring_dedup_corpus(spark, sf_dir):
    """Corpus deduplicated on LONG SHARED SUBSTRINGS (>= 150 chars):
    substring_pairs feeds the same connected-components + canonical-
    per-cluster semi-join as the minhash corpus — the pair generator is
    pluggable, the terminal pipeline step is shared.  Oracle nests the
    substring-pair SQL inside the recursive label propagation."""
    d = read_table(spark, sf_dir, "documents")
    pairs = D.substring_pairs(d, "text", "doc_id", min_len=150,
                              gram_len=40, mod=4, max_df=1000)
    out = D.dedup_corpus(d, pairs, "doc_id")
    return out.select("doc_id", F.length("text").alias("n_chars"))


def _dedup_corpus_best_sql():
    pairs = _minhash_pairs_sql()
    return f"""
WITH RECURSIVE p AS ({pairs}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
),
lab AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM cc GROUP BY id),
keep AS (
  SELECT doc_id FROM (
    SELECT l.doc_id,
           row_number() OVER (PARTITION BY l.cluster_id
                              ORDER BY d.n_chars DESC, l.doc_id) AS rk
    FROM lab l JOIN documents d USING (doc_id)) t
  WHERE rk = 1)
SELECT d.doc_id, d.n_chars
FROM documents d JOIN keep USING (doc_id)
"""


@query("dedup_corpus_best", _dedup_corpus_best_sql())
def q_dedup_corpus_best(spark, sf_dir):
    """Deduplicated corpus keeping the RICHEST member of each near-dup
    cluster (max n_chars, min-id tie-break) instead of the min-id
    canonical — the retention policy when duplicates differ in
    truncation or boilerplate (``dedup_corpus(keep_by=)``).  Oracle
    ranks cluster members inside the same recursive label propagation."""
    d = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                                threshold=0.2)
    out = D.dedup_corpus(d, pairs, "doc_id", keep_by="n_chars")
    return out.select("doc_id", "n_chars")


@query("dedup_exact_normalized", """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]',
                                            ' ', 'g'),
                             '\\s+', ' ', 'g')) AS norm
  FROM documents)
SELECT md5(norm) AS digest, min(doc_id) AS keep_id, count(*) AS n_members
FROM n GROUP BY 1
""")
def q_dedup_exact_normalized(spark, sf_dir):
    """Exact dedup on NORMALIZED text (lowercase, punctuation stripped,
    whitespace collapsed) — catches formatting-only duplicates the raw
    digest misses."""
    d = read_table(spark, sf_dir, "documents")
    normed = d.select("doc_id",
                      T.normalize_text_expr(F.col("text")).alias("norm"))
    return D.exact_dedup(normed, "norm", "doc_id")


@query("text_quality_filter", """
WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents),
q AS (SELECT doc_id,
             len(toks) AS n_tokens,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '',
                                                   'g')))
                 / nullif(length(text), 0) AS punct_ratio,
             len(list_filter(toks, x -> x IN ({stops})))
                 / nullif(len(toks), 0) AS stopword_ratio
      FROM t)
SELECT doc_id FROM q
WHERE n_tokens >= 10 AND n_tokens <= 1000
  AND coalesce(punct_ratio, 0) <= 0.05
  AND coalesce(stopword_ratio, 1) >= 0.05
""".format(toks=_TOKS, stops=_STOP_LIST))
def q_text_quality_filter(spark, sf_dir):
    """Quality-gate filter: token-count bounds + punctuation and stopword
    ratio thresholds — the standard corpus cleaning step as one pushed
    Catalyst predicate."""
    d = read_table(spark, sf_dir, "documents")
    kept = T.quality_filter(d, "text", min_tokens=10, max_tokens=1000,
                            max_punct_ratio=0.05,
                            min_stopword_ratio=0.05)
    return kept.select("doc_id")


@query("text_vocabulary_top50", f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
c AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1)
SELECT token, freq, CAST(rank AS INT) AS rank FROM (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM c) t
WHERE rank <= 50
""")
def q_text_vocabulary_top50(spark, sf_dir):
    """Corpus vocabulary: top-50 tokens by frequency (vocabulary building
    for tokenizer training — deterministic count/token tie-break)."""
    d = read_table(spark, sf_dir, "documents")
    return T.vocabulary(d, "text", top_k=50) \
        .select("token", "freq", F.col("rank").cast("int").alias("rank"))


@query("embedding_normalize", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e)
SELECT vec_id,
       round(CASE WHEN nrm > 0
                  THEN sqrt(list_sum(list_transform(
                           list_transform(v, x -> x / nrm), x -> x * x)))
                  ELSE 0.0 END, 6) AS unit_norm,
       round(list_sum(list_transform(v, x -> x / nullif(nrm, 0))), 6)
           AS comp_sum
FROM n
""")
def q_embedding_normalize(spark, sf_dir):
    """L2 normalization: after the pre-pass every vector has unit norm;
    oracle recomputes the normalized component sum and norm."""
    e = read_table(spark, sf_dir, "embeddings")
    normed = S.normalize_embeddings(e, "embedding", out="u")
    from orange3_timeseries_spark.operators.similarity import norm_expr
    u = F.col("u")
    return normed.select(
        "vec_id",
        r6(norm_expr(u), "unit_norm"),
        r6(F.aggregate(u, F.lit(0.0), lambda a, x: a + x), "comp_sum"))


# ------------------------------------------------------- sampling tier
_SPACE = 1 << 60
_PH_DOC = _PH.format(e="doc_id::VARCHAR")


def _rate_thr(rate):
    return int(rate * _SPACE)


@query("sample_mix_corpus", f"""
WITH w AS (
  SELECT source, sum(n_chars)::DOUBLE AS w FROM documents GROUP BY 1),
tot AS (SELECT 0.4::DOUBLE * sum(n_chars)::DOUBLE AS budget
        FROM documents),
p(source, p) AS (VALUES
  ('src0', 0.30::DOUBLE), ('src1', 0.30::DOUBLE), ('src2', 0.20::DOUBLE),
  ('src3', 0.10::DOUBLE), ('src4', 0.10::DOUBLE)),
thr AS (
  SELECT w.source,
         CAST(floor(least(1.0, tot.budget * p.p / w.w)
                    * 1152921504606846976.0) AS BIGINT) AS t
  FROM w JOIN p USING (source) CROSS JOIN tot)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN thr ON thr.source = d.source
WHERE {_PH_DOC} < thr.t
""")
def q_sample_mix_corpus(spark, sf_dir):
    """Source-proportioned corpus MIX (the training-data "data mixing"
    step): budget = 40% of total corpus chars, split src0..src4 at
    30/30/20/10/10; per-source keep rates ``min(1, budget*p_s/w_s)``
    become inline hash thresholds, so the mix is a deterministic pure
    scan filter (operators/sampling.mix_corpus).  Oracle recomputes the
    identical double-precision thresholds from the same totals."""
    from orange3_timeseries_spark.operators.sampling import mix_corpus

    d = read_table(spark, sf_dir, "documents")
    total = float(d.agg(F.sum("n_chars")).first()[0])
    out = mix_corpus(d, "source", "doc_id",
                     {"src0": 0.30, "src1": 0.30, "src2": 0.20,
                      "src3": 0.10, "src4": 0.10},
                     budget=0.4 * total, weight_col="n_chars")
    return out.select("doc_id", "source", "n_chars")


@query("sample_hash_10pct", f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_PH_DOC} < {_rate_thr(0.10)}
""")
def q_sample_hash_10pct(spark, sf_dir):
    """Deterministic 10% hash sample keyed on doc_id — partitioning- and
    engine-independent (same rows in Spark and DuckDB), a pure pushable
    filter with no shuffle (operators/sampling.py)."""
    from orange3_timeseries_spark.operators.sampling import hash_sample

    d = read_table(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.10).select("doc_id", "lang", "source")


@query("sample_stratified_lang", f"""
SELECT doc_id, lang
FROM documents
WHERE {_PH_DOC} < (CASE lang WHEN 'en' THEN {_rate_thr(0.5)}
                             WHEN 'zh' THEN {_rate_thr(0.25)}
                             ELSE {_rate_thr(0.1)} END)
""")
def q_sample_stratified_lang(spark, sf_dir):
    """Per-language stratified hash sampling (en 50%, zh 25%, rest 10%) —
    the rates map folds into one CASE predicate, still shuffle-free."""
    from orange3_timeseries_spark.operators.sampling import stratified_sample

    d = read_table(spark, sf_dir, "documents")
    out = stratified_sample(d, "lang", "doc_id",
                            {"en": 0.5, "zh": 0.25}, default_rate=0.1)
    return out.select("doc_id", "lang")


@query("sample_topn_per_source", f"""
SELECT source, doc_id
FROM (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_PH_DOC}, doc_id) AS rn
      FROM documents)
WHERE rn <= 10
""")
def q_sample_topn_per_source(spark, sf_dir):
    """Exactly-10-docs-per-source balanced sample, chosen by
    deterministic hash order — one shuffle on the stratum key."""
    from orange3_timeseries_spark.operators.sampling import top_n_per_key

    d = read_table(spark, sf_dir, "documents")
    return top_n_per_key(d, "source", "doc_id", 10).select("source", "doc_id")


# ------------------------------------------------- repetition / PII tier
_SH2 = ("list_distinct(list_transform(range(1, greatest(len({t}), 1)),"
        " i -> array_to_string(list_slice({t}, i, i + 1), ' ')))"
        .format(t="toks"))
_SH3 = ("list_distinct(list_transform(range(1, greatest(len({t}) - 1, 1)),"
        " i -> array_to_string(list_slice({t}, i, i + 2), ' ')))"
        .format(t="toks"))


@query("text_repetition", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, toks, {_SH2} AS sh2, {_SH3} AS sh3 FROM t)
SELECT doc_id,
       round(1.0 - len(list_distinct(toks)) / nullif(len(toks), 0), 6)
         AS dup_word_frac,
       round(1.0 - len(sh2) / nullif(greatest(len(toks) - 1, 0), 0), 6)
         AS dup_2gram_frac,
       round(1.0 - len(sh3) / nullif(greatest(len(toks) - 2, 0), 0), 6)
         AS dup_3gram_frac,
       round(list_max(list_transform(list_distinct(toks),
                 t2 -> len(list_filter(toks, x -> x = t2))))
             / nullif(len(toks), 0), 6) AS top_word_frac
FROM s
""")
def q_text_repetition(spark, sf_dir):
    """Within-doc repetition quality metrics (Gopher-style duplicate
    n-gram fractions + top-word share) — map-only codegen; the token and
    shingle arrays are bound as columns before any HOF lambda touches
    them (operators/text.py repetition_features)."""
    from orange3_timeseries_spark.operators.partitioning import (
        widen_partitions,
    )

    d = read_table(spark, sf_dir, "documents")
    out = T.repetition_features(
        widen_partitions(d.select("doc_id", "text")), "text")
    return out.select(
        "doc_id",
        r6(F.col("dup_word_frac"), "dup_word_frac"),
        r6(F.col("dup_2gram_frac"), "dup_2gram_frac"),
        r6(F.col("dup_3gram_frac"), "dup_3gram_frac"),
        r6(F.col("top_word_frac"), "top_word_frac"))


_PII_AUG = ("text || ' contact user' || doc_id::VARCHAR || "
            "'@example.com ip 10.0.0.' || (doc_id % 256)::VARCHAR || "
            "' tel 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || "
            "'-0199'")
_RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_RE_SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
_RE_PHONE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"


@query("text_pii_redaction", f"""
WITH a AS (SELECT doc_id, {_PII_AUG} AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_RE_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_RE_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_RE_SSN}')) AS n_ssn,
       len(regexp_extract_all(text, '{_RE_PHONE}')) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_RE_EMAIL}', '<EMAIL>', 'g'),
                 '{_RE_IPV4}', '<IPV4>', 'g'),
                 '{_RE_SSN}', '<SSN>', 'g'),
                 '{_RE_PHONE}', '<PHONE>', 'g')) AS red_md5
FROM a
""")
def q_text_pii_redaction(spark, sf_dir):
    """PII scrubbing exercised on deterministically synthesized PII (the
    corpus has none): each doc gains an email, an IPv4, and a phone
    number built from its doc_id in BOTH engines, then redact_pii
    counts and replaces them; the md5 of the redacted text is
    value-hash compared.  Chained regexp codegen, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com ip 10.0.0."),
                 (F.col("doc_id") % 256).cast("string"),
                 F.lit(" tel 555-"),
                 F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                 F.lit("-0199")).alias("text"))
    out = T.redact_pii(aug, "text")
    return out.select("doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone",
                      F.md5(F.col("text_redacted")).alias("red_md5"))


# ------------------------------------------------------- packing / profiling
_PACK_START = (f"sum(len({_TOKS})) OVER (PARTITION BY source "
               f"ORDER BY {_PH_DOC}, doc_id ROWS UNBOUNDED PRECEDING)"
               f" - len({_TOKS})")


@query("pack_sequences_2048", f"""
WITH c AS (SELECT source, doc_id, len({_TOKS}) AS n_tokens,
                  {_PACK_START} AS strt
           FROM documents)
SELECT source, doc_id, n_tokens,
       CAST(floor(strt / 2048.0) AS BIGINT) AS bin_id,
       CAST(strt - CAST(floor(strt / 2048.0) AS BIGINT) * 2048 AS BIGINT)
         AS bin_offset
FROM c
""")
def q_pack_sequences_2048(spark, sf_dir):
    """Token-budgeted next-fit sequence packing (2048-token packs, one
    shard per source, deterministic hash order) — the training-batch
    construction step; one shuffle, two fused windows
    (operators/packing.py)."""
    from orange3_timeseries_spark.operators.packing import pack_sequences

    d = read_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id",
                 T.token_count_expr(F.col("text")).alias("n_tokens"))
    out = pack_sequences(t, "doc_id", "n_tokens", 2048,
                         shard_cols=["source"])
    return out.select("source", "doc_id", "n_tokens", "bin_id",
                      "bin_offset")


@query("pack_manifest_2048", f"""
WITH c AS (SELECT source, doc_id, len({_TOKS}) AS n_tokens,
                  {_PACK_START} AS strt
           FROM documents)
SELECT source, CAST(floor(strt / 2048.0) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY source, bin_id
""")
def q_pack_manifest_2048(spark, sf_dir):
    """Per-pack manifest (doc count + token total per bin) for the
    2048-token packing above — the map-side-combining rollup a data
    loader consumes."""
    from orange3_timeseries_spark.operators.packing import pack_manifest

    d = read_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id",
                 T.token_count_expr(F.col("text")).alias("n_tokens"))
    return pack_manifest(t, "doc_id", "n_tokens", 2048,
                         shard_cols=["source"])


_PROF_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
_PROF_SQL = "\nUNION ALL\n".join(f"""
SELECT '{c}' AS column, count(*) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       round(avg({c}), 6) AS mean, round(stddev({c}), 6) AS std,
       round(min({c}), 6) AS vmin, round(max({c}), 6) AS vmax,
       round(quantile_cont({c}, 0.25), 6) AS p25,
       round(quantile_cont({c}, 0.50), 6) AS p50,
       round(quantile_cont({c}, 0.75), 6) AS p75
FROM lineitem""" for c in _PROF_COLS)


@query("profile_lineitem", _PROF_SQL)
def q_profile_lineitem(spark, sf_dir):
    """One-pass column profile of lineitem's numeric measures: count /
    nulls / distinct / mean / std / min / max / EXACT quartiles — single
    long-form histogram plan: moments agg + frequency-weighted exact percentile
    (operators/profile.py)."""
    from orange3_timeseries_spark.operators.profile import profile_columns

    li = read_table(spark, sf_dir, "lineitem")
    out = profile_columns(li, _PROF_COLS)
    return out.select("column", "n", "n_null", "n_distinct",
                      r6(F.col("mean"), "mean"), r6(F.col("std"), "std"),
                      r6(F.col("vmin"), "vmin"), r6(F.col("vmax"), "vmax"),
                      r6(F.col("p25"), "p25"), r6(F.col("p50"), "p50"),
                      r6(F.col("p75"), "p75"))


# ------------------------------------------- contamination / LM / chunk tier
def _shingle_sql(n, toks=_TOKS):
    """DuckDB distinct word n-gram list matching dedup.shingles_expr."""
    return (f"list_distinct(list_transform("
            f"range(1, greatest(len({toks}) - {n - 2}, 1)),"
            f" i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))")


@query("text_decontaminate", f"""
WITH d AS (SELECT doc_id, source, {_shingle_sql(5)} AS grams FROM documents),
bench AS (SELECT DISTINCT gram
          FROM (SELECT unnest(grams) AS gram FROM d WHERE source = 'src0')),
corp AS (SELECT doc_id, grams FROM d WHERE source <> 'src0'),
hit AS (SELECT e.doc_id, count(*) AS n_hit
        FROM (SELECT doc_id, unnest(grams) AS gram FROM corp) e
        JOIN bench USING (gram) GROUP BY 1)
SELECT c.doc_id,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(len(c.grams) AS INTEGER) AS n_ngrams,
       round(CASE WHEN len(c.grams) > 0
                  THEN coalesce(h.n_hit, 0) / CAST(len(c.grams) AS DOUBLE)
                  ELSE 0.0 END, 6) AS contamination_frac
FROM corp c LEFT JOIN hit h USING (doc_id)
""")
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: per-document count + fraction of word
    5-grams shared with the benchmark set (source 'src0' stands in for an
    eval benchmark).  Broadcast semi-join on the benchmark's distinct
    n-gram set — the corpus never shuffles for the match."""
    from orange3_timeseries_spark.operators.contamination import (
        contamination,
    )

    d = read_table(spark, sf_dir, "documents")
    out = contamination(d.where(F.col("source") != "src0"),
                        d.where(F.col("source") == "src0"),
                        "text", "doc_id", n=5)
    return out.select("doc_id", "n_hit", "n_ngrams",
                      r6(F.col("contamination_frac"), "contamination_frac"))


@query("text_lm_score", f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
vocab AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
tot AS (SELECT count(*) AS total FROM toks),
scored AS (SELECT t.doc_id,
                  ln(v.freq / (SELECT total FROM tot)::DOUBLE) AS logp
           FROM toks t JOIN vocab v USING (token))
SELECT doc_id, count(*) AS n_tokens,
       round(avg(logp), 6) AS avg_logp,
       round(exp(-avg(logp)), 6) AS perplexity
FROM scored GROUP BY doc_id
""")
def q_text_lm_score(spark, sf_dir):
    """Unigram LM quality score: per-document mean token ln-probability
    under the corpus's own unigram model, plus perplexity (CCNet-style
    quality signal)."""
    from orange3_timeseries_spark.operators.contamination import (
        unigram_lm_score,
    )

    d = read_table(spark, sf_dir, "documents")
    out = unigram_lm_score(d, "text", "doc_id")
    return out.select("doc_id", "n_tokens", r6(F.col("avg_logp"), "avg_logp"),
                      r6(F.col("perplexity"), "perplexity"))


@query("text_chunks", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE len({_TOKS}) > 0),
s AS (SELECT doc_id, toks,
             unnest(range(0, len(toks), 48)) AS chunk_start FROM t)
SELECT doc_id,
       CAST(chunk_start / 48 AS INTEGER) AS chunk_id,
       CAST(chunk_start AS INTEGER) AS chunk_start,
       CAST(len(list_slice(toks, chunk_start + 1, chunk_start + 64))
            AS INTEGER) AS n_chunk_tokens,
       array_to_string(list_slice(toks, chunk_start + 1, chunk_start + 64),
                       ' ') AS chunk_text
FROM s
""")
def q_text_chunks(spark, sf_dir):
    """Token-window chunking: size 64, stride 48 (25% overlap) — map-only
    posexplode, the long-document splitter ahead of sequence packing."""
    from orange3_timeseries_spark.operators.contamination import (
        chunk_documents,
    )

    d = read_table(spark, sf_dir, "documents")
    return chunk_documents(d, "text", "doc_id", size=64, stride=48)


@query("embedding_quantize", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
m AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e),
q AS (SELECT vec_id, v, scale,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(floor(x / scale + 0.5)
                                                   AS INTEGER))
                  ELSE list_transform(v, x -> 0) END AS qv
      FROM m)
SELECT vec_id, round(scale, 6) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS INTEGER) AS q_min,
       CAST(list_max(qv) AS INTEGER) AS q_max,
       round(CASE WHEN scale > 0
                  THEN list_max(list_transform(
                           generate_series(1, len(v)),
                           i -> abs(qv[i] * scale - v[i])))
                  ELSE 0.0 END, 6) AS max_abs_err
FROM q
""")
def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column — the
    oracle replays scale, the quantized-component sum/min/max, and the
    worst reconstruction error (bounded by scale/2)."""
    e = read_table(spark, sf_dir, "embeddings")
    out = S.quantize_embeddings(e, "embedding", "vec_id", bits=8)
    qv = F.col("qvec")
    return out.select(
        "vec_id", r6(F.col("scale"), "scale"),
        F.aggregate(qv, F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("q_sum"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
        r6(F.col("max_abs_err"), "max_abs_err"))


_EMB_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a,
     (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
"""


@query("embedding_clusters", f"""
WITH RECURSIVE p AS ({_EMB_PAIRS_SQL}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
)
SELECT id AS vec_id, min(lab) AS cluster_id FROM cc GROUP BY id
""")
def q_embedding_clusters(spark, sf_dir):
    """SEMANTIC dedup clusters: connected components over the
    embedding-cosine near-dup pair graph (blocked-GEMM pairs at
    tau=0.35), each vector labeled with its component's min id — the
    embedding-space mirror of ``dedup_clusters``."""
    e = read_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(e, threshold=0.35)
    return D.dedup_clusters(e, pairs, "vec_id")


@query("embedding_dedup_corpus", f"""
WITH RECURSIVE p AS ({_EMB_PAIRS_SQL}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s
),
lab AS (SELECT id AS vec_id, min(lab) AS cluster_id FROM cc GROUP BY id)
SELECT emb.vec_id, emb.label, len(emb.embedding) AS dim
FROM embeddings emb JOIN lab USING (vec_id)
WHERE lab.cluster_id = emb.vec_id
""")
def q_embedding_dedup_corpus(spark, sf_dir):
    """SEMANTIC deduplicated corpus: one canonical vector (min id) per
    cosine near-dup cluster plus every unclustered vector — the
    embedding-space mirror of ``dedup_corpus``, same skinny-keep-set
    semi-join plan."""
    e = read_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(e, threshold=0.35)
    out = D.dedup_corpus(e, pairs, "vec_id")
    return out.select("vec_id", "label",
                      F.size("embedding").alias("dim"))


# ------------------------------------------------------- bloom membership
def _bloom_probe_sql(m=4096, k=4):
    """Oracle replays build AND probe with the same md5 positions, 32-bit
    lanes, and bit_or aggregation (operators/bloom.py)."""
    from orange3_timeseries_spark.operators.hashing import phash_seeded_sql

    pos_values = ", ".join(
        f"(({phash_seeded_sql('key', i)}) % {m})" for i in range(k))
    mask = "(1::BIGINT << (p & 31))"
    return f"""
WITH n AS (SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]',
                                            ' ', 'g'),
                             '\\s+', ' ', 'g')) AS key
  FROM documents),
pos AS (SELECT doc_id, u.p FROM n,
        LATERAL (SELECT * FROM (VALUES {pos_values}) AS v(p)) u),
lanes AS (SELECT p >> 5 AS lane, bit_or({mask}) AS bits
          FROM pos WHERE doc_id % 2 = 0 GROUP BY 1)
SELECT doc_id,
       bool_and(coalesce((l.bits & {mask}) = {mask}, false)) AS maybe_seen
FROM pos LEFT JOIN lanes l ON (p >> 5) = l.lane
GROUP BY doc_id
"""


@query("dedup_bloom_probe", _bloom_probe_sql())
def q_dedup_bloom_probe(spark, sf_dir):
    """Bloom-filter cross-corpus membership: build a 4096-bit / 4-hash
    filter over the NORMALIZED text of the reference half of the corpus
    (even doc_id), probe every document.  No false negatives by
    construction — every reference doc and every formatting-variant
    duplicate of one flags true; false positives are bounded by the
    m/n sizing (``bloom.bloom_params``).  At 100 TB this is the standard
    "seen before?" gate: the filter is built once (one bit_or agg, ≤ m/32
    skinny rows out) and probed per batch with no access to the reference
    corpus itself."""
    from orange3_timeseries_spark.operators import bloom as B

    d = read_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id",
                     T.normalize_text_expr(F.col("text")).alias("key"))
    ref = keyed.where(F.col("doc_id") % 2 == 0)
    return B.bloom_membership(keyed, "doc_id", "key", ref, "key",
                              m_bits=4096, k=4, out_col="maybe_seen")


# ------------------------------------------------------------- sharding
@query("shuffle_shards", f"""
WITH h AS (SELECT doc_id, {_PH.format(e="doc_id::VARCHAR")} AS h
           FROM documents)
SELECT doc_id, (h % 8)::INT AS shard,
       row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
FROM h
""")
def q_shuffle_shards(spark, sf_dir):
    """Deterministic training-order materialization: every document gets
    a reproducible (shard, position) — shard by portable hash, position
    by hash order within the shard.  One shuffle; at 100 TB each shard
    sorts in its own task and re-runs are byte-identical."""
    from orange3_timeseries_spark.operators.sharding import hash_shards

    d = read_table(spark, sf_dir, "documents")
    return hash_shards(d.select("doc_id"), "doc_id", 8) \
        .select("doc_id", "shard", "pos")


@query("shard_manifest_balanced", f"""
WITH t AS (SELECT doc_id, len({_TOKS}) AS w FROM documents),
r AS (SELECT doc_id, w,
             row_number() OVER (ORDER BY w DESC, doc_id) - 1 AS i
      FROM t),
s AS (SELECT CASE WHEN (i % 16) < 8 THEN (i % 16)
                  ELSE 15 - (i % 16) END AS shard, w
      FROM r)
SELECT shard::INT AS shard, count(*) AS n_docs,
       sum(w)::BIGINT AS total_weight
FROM s GROUP BY 1
""")
def q_shard_manifest_balanced(spark, sf_dir):
    """Token-balanced snake sharding manifest: global weight-descending
    rank folded boustrophedon into 8 shards (LPT-style greedy — max/min
    shard weight differ by at most one document).  The global rank is
    computed distributively (range repartition + local row numbers +
    broadcast offsets, operators/sharding.py), NOT via a single-task
    global window; the oracle's plain OVER (ORDER BY) is the semantic
    spec only."""
    from orange3_timeseries_spark.operators.sharding import (
        balanced_shards,
        shard_manifest,
    )

    d = read_table(spark, sf_dir, "documents")
    w = d.select("doc_id", T.token_count_expr(F.col("text")).alias("w"))
    assigned = balanced_shards(w, "doc_id", "w", 8)
    return shard_manifest(assigned, "shard", "w") \
        .select("shard", "n_docs", "total_weight")


@query("sample_token_budget", f"""
WITH t AS (SELECT doc_id, source, len({_TOKS}) AS w,
                  {_PH.format(e="doc_id::VARCHAR")} AS h
           FROM documents),
c AS (SELECT doc_id, source,
             sum(w) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM t)
SELECT doc_id, source, cum_tokens FROM c WHERE cum_tokens <= 1200
""")
def q_sample_token_budget(spark, sf_dir):
    """Token-budget curation: keep documents per source in deterministic
    hash order until 1200 tokens are reached — the "at most B tokens per
    source" primitive, reproducible across partitionings and engines.
    One per-stratum window shuffle, no global sort."""
    from orange3_timeseries_spark.operators.sampling import (
        token_budget_sample,
    )

    d = read_table(spark, sf_dir, "documents")
    w = d.select("doc_id", "source",
                 T.token_count_expr(F.col("text")).alias("w"))
    out = token_budget_sample(w, "source", "doc_id", "w", 1200,
                              cum_col="cum_tokens")
    return out.select("doc_id", "source", "cum_tokens")


_GOPHER_STOPS = "'the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'"


@query("text_gopher_rules", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
m AS (SELECT doc_id, len(toks) AS n_words,
             list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                 / nullif(len(toks), 0) AS ml,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
                 / nullif(len(toks), 0) AS af,
             len(list_intersect(list_distinct(toks),
                                [{_GOPHER_STOPS}])) AS stop_hits
      FROM t)
SELECT doc_id, n_words, round(ml, 6) AS mean_word_len,
       round(af, 6) AS alpha_frac, stop_hits,
       n_words BETWEEN 50 AND 100000 AS ok_word_count,
       ml BETWEEN 3.0 AND 10.0 AS ok_mean_len,
       af >= 0.8 AS ok_alpha,
       stop_hits >= 2 AS ok_required_words,
       (n_words BETWEEN 50 AND 100000) AND (ml BETWEEN 3.0 AND 10.0)
           AND af >= 0.8 AND stop_hits >= 2 AS gopher_pass
FROM m
""")
def q_text_gopher_rules(spark, sf_dir):
    """Gopher quality-rule breakdown (Rae et al. 2021 §A1.1): word-count
    bounds, mean-word-length band, alphabetic-word fraction, and the
    required-word rule, each as an auditable boolean plus the combined
    verdict — all map-only Catalyst expressions."""
    d = read_table(spark, sf_dir, "documents")
    return T.gopher_quality_flags(d, "text", "doc_id")


def _crosscorpus_sql(k=16, bands=4, threshold=0.2):
    rpb = k // bands
    band_keys = ", ".join(
        _PH.format(e="(" + " || ',' || ".join(
            f"m{b * rpb + r}::VARCHAR" for r in range(rpb)) + ")")
        + f" AS bk{b}" for b in range(bands))
    return f"""{_minhash_sig_sql(k)},
bk AS (SELECT doc_id, {band_keys} FROM sig),
entries AS (
  SELECT doc_id, u.band, u.key FROM bk,
  LATERAL (SELECT * FROM (VALUES {", ".join(f"({b}, bk{b})" for b in range(bands))})
           AS v(band, key)) u),
cand AS (
  SELECT DISTINCT a.doc_id AS id_test, b.doc_id AS id_train
  FROM entries a JOIN entries b
    ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0)
SELECT id_test, id_train,
       round(len(list_intersect(x.s, y.s))::DOUBLE
             / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0),
             6) AS jaccard
FROM cand
JOIN sh x ON x.doc_id = id_test
JOIN sh y ON y.doc_id = id_train
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0)
      >= {threshold}
"""


@query("crosscorpus_leakage", _crosscorpus_sql())
def q_crosscorpus_leakage(spark, sf_dir):
    """Train/test near-duplicate LEAKAGE audit: MinHash-LSH join BETWEEN
    two corpora (held-out = odd doc_id vs train = even doc_id), verified
    with exact Jaccard ≥ 0.2 — catches paraphrase-level contamination
    that exact n-gram decontamination (``text_decontaminate``) misses.
    Cost is |A|+|B| signature passes + a banded equi-join, never
    |A|x|B|."""
    d = read_table(spark, sf_dir, "documents")
    test = d.where(F.col("doc_id") % 2 == 1)
    train = d.where(F.col("doc_id") % 2 == 0)
    out = D.minhash_lsh_pairs_between(test, train, "text", "doc_id",
                                      k=16, bands=4, n=3, threshold=0.2)
    return out.select(F.col("id_a").alias("id_test"),
                      F.col("id_b").alias("id_train"),
                      r6(F.col("jaccard"), "jaccard"))


@query("dedup_cluster_sizes", f"""
SELECT size, count(*) AS n_clusters FROM (
  SELECT cluster_id, count(*) AS size FROM ({_clusters_sql()}) GROUP BY 1)
GROUP BY 1
""")
def q_dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size distribution — the report every dedup run
    produces (how much of the corpus is duplicated, and how deeply).
    Two tiny aggregations over the verified cluster labels."""
    d = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                                threshold=0.2)
    labels = D.dedup_clusters(d, pairs, "doc_id")
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(F.count("*").alias("n_clusters"))


@query("embedding_centroids", """
WITH x AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT label, u.i AS dim, v[u.i] AS val
      FROM x, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) u)
SELECT label, dim, round(avg(val), 6) AS centroid_val,
       count(*) AS n_vectors
FROM e GROUP BY 1, 2
""")
def q_embedding_centroids(spark, sf_dir):
    """Per-label class centroids in long form (label, dim, mean
    component) — the per-cluster profile used to audit semantic dedup
    and embedding drift.  posexplode + one aggregation: partial
    (map-side) means make the shuffle carry labels x dims rows, never
    vectors."""
    e = read_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("dim0", "val"))
    return (exploded.groupBy("label", (F.col("dim0") + 1).alias("dim"))
            .agg(F.round(F.avg("val"), 6).alias("centroid_val"),
                 F.count("*").alias("n_vectors")))


def _pq_sql(M=8, ds=8, K=16, k=5):
    """Oracle replays PQ encode + ADC with the identical IEEE summation
    order (explicit left-associated chains, cf. similarity._sq_chain)."""
    chain = " + ".join(
        f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))"
        for i in range(ds))
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ms AS (SELECT unnest(generate_series(0, {M-1})) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS cv
       FROM c x, ms WHERE x.vec_id < {K}),
sl AS (SELECT x.vec_id, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS sv
       FROM c x, ms),
enc AS (SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
        FROM sl s JOIN cb b ON s.m = b.m),
codes AS (SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, j) AS rn
    FROM enc) t
  WHERE rn = 1),
adc AS (SELECT q.vec_id AS query_id, cx.vec_id AS nn_id,
               sum(q.dist) AS approx
        FROM codes cx JOIN enc q ON q.m = cx.m AND q.j = cx.code
        WHERE q.vec_id < 10 AND cx.vec_id != q.vec_id
        GROUP BY 1, 2)
SELECT query_id, nn_id, approx_l2, rank FROM (
  SELECT query_id, nn_id, round(approx, 6) AS approx_l2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(approx, 6), nn_id) AS rank
  FROM adc) t
WHERE rank <= {k}
"""


@query("ann_pq_topk", _pq_sql())
def q_ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN serving path, fully hash-verified:
    codebooks are injected deterministically (subvector slices of the
    first 16 corpus embeddings — a bounded 16-row collect, same split as
    ``ann_ivf_served_topk``), so subspace encoding, the per-query ADC
    lookup tables, and the approximate-L2 top-5 are all value-checked.
    PQ compresses 64 floats to 8 bytes per vector — the memory-traffic
    half of billion-scale ANN; only Lloyd training (``train_pq_codebooks``)
    stays outside the oracle."""
    e = read_table(spark, sf_dir, "embeddings")
    cent_rows = (e.where(F.col("vec_id") < 16).orderBy("vec_id")
                 .select("embedding").collect())
    M, ds = 8, 8
    books = [[[float(x) for x in r.embedding[m * ds:(m + 1) * ds]]
              for r in cent_rows] for m in range(M)]
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.pq_topk(e, queries, books, k=5)


def _ivfpq_sql(M=8, ds=8, K=16, k=5, nprobe=4, n_queries=10):
    """Composite IVF-PQ oracle: the served-IVF assignment/probe CTEs
    (centroids = first 16 embeddings) composed with the PQ encode/ADC
    CTEs (codebooks = subvector slices of the same rows) — both halves
    identical to the already-verified ``ann_ivf_served_topk`` /
    ``ann_pq_topk`` replays, joined on the probe lists."""
    chain = " + ".join(
        f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))"
        for i in range(ds))
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS MATERIALIZED (
  SELECT vec_id AS cid, v AS cv,
         list_inner_product(v, v) / 2.0 AS half_cc
  FROM c WHERE vec_id < {K}),
assign AS (  -- nearest coarse centroid per corpus vector
  SELECT vec_id AS nn_id, cid
  FROM c CROSS JOIN cent
  QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY list_inner_product(v, cv) - half_cc DESC, cid) = 1),
ms AS (SELECT unnest(generate_series(0, {M-1})) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS cv
       FROM c x, ms WHERE x.vec_id < {K}),
sl AS (SELECT x.vec_id, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS sv
       FROM c x, ms),
enc AS MATERIALIZED (
  SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
  FROM sl s JOIN cb b ON s.m = b.m),
codes AS MATERIALIZED (SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, j) AS rn
    FROM enc) t
  WHERE rn = 1),
probes AS (  -- each query probes its {nprobe} nearest inverted lists
  SELECT vec_id AS query_id, cid
  FROM c CROSS JOIN cent
  WHERE vec_id < {n_queries}
  QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY list_inner_product(v, cv) - half_cc DESC, cid)
      <= {nprobe}),
adc AS (  -- ADC over probe-list candidates only
  SELECT p.query_id, a.nn_id, sum(qe.dist) AS approx
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN codes cx ON cx.vec_id = a.nn_id
  JOIN enc qe ON qe.vec_id = p.query_id
             AND qe.m = cx.m AND qe.j = cx.code
  WHERE a.nn_id != p.query_id
  GROUP BY 1, 2)
SELECT query_id, nn_id, approx_l2, rank FROM (
  SELECT query_id, nn_id, round(approx, 6) AS approx_l2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(approx, 6), nn_id) AS rank
  FROM adc) t
WHERE rank <= {k}
"""


@query("ann_ivfpq_topk", _ivfpq_sql())
def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composite ANN — the production index shape for 100 TB
    embedding corpora (FAISS IVFPQ): coarse probe lists bound the
    candidate scan, PQ ADC lookups bound the per-candidate arithmetic.
    Models injected deterministically (centroids = first 16 embeddings,
    codebooks = their subvector slices — the same bounded collects the
    individually-verified ``ann_ivf_served_topk`` / ``ann_pq_topk``
    use), so list assignment, probe selection, PQ encoding, and ADC
    ranking are ALL value-hash-verified end to end; recall vs brute
    force is asserted in tests/test_similarity.py."""
    e = read_table(spark, sf_dir, "embeddings")
    cent_rows = (e.where(F.col("vec_id") < 16).orderBy("vec_id")
                 .select("embedding").collect())
    centroids = [[float(x) for x in r.embedding] for r in cent_rows]
    M, ds = 8, 8
    books = [[[float(x) for x in r.embedding[m * ds:(m + 1) * ds]]
              for r in cent_rows] for m in range(M)]
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.ivfpq_topk(e, queries, books, k=5, n_centroids=16,
                        nprobe=4, centroids=centroids)


@query("leakage_safe_split", f"""
WITH lab AS (SELECT doc_id, cluster_id FROM ({_clusters_sql()}))
SELECT doc_id, cluster_id,
       CASE WHEN ({_PH.format(e="cluster_id::VARCHAR")} % 10) < 8
            THEN 'train' ELSE 'heldout' END AS split
FROM lab
""")
def q_leakage_safe_split(spark, sf_dir):
    """Cluster-aware train/heldout split: the split key is the
    near-dup CLUSTER id, not the document id, so every member of a
    duplicate cluster lands on the same side — the standard remedy for
    the contamination ``crosscorpus_leakage`` detects.  Deterministic
    (portable hash of the canonical label), ~80/20 in expectation, and
    a map-only expression on top of the verified cluster labels."""
    from orange3_timeseries_spark.operators.hashing import phash

    d = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                                threshold=0.2)
    labels = D.dedup_clusters(d, pairs, "doc_id")
    split = F.when(
        phash(F.col("cluster_id").cast("string")) % 10 < 8,
        F.lit("train")).otherwise(F.lit("heldout"))
    return labels.select("doc_id", "cluster_id", split.alias("split"))


def _cms_sql(width=1024, depth=3, topn=10):
    from orange3_timeseries_spark.operators.hashing import phash_seeded_sql

    vals = ", ".join(
        f"({i}, ({phash_seeded_sql('t', i)}) % {width})"
        for i in range(depth))
    return f"""
WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
e AS (SELECT t, u.r, u.p FROM tok,
      LATERAL (SELECT * FROM (VALUES {vals}) AS v(r, p)) u),
tab AS (SELECT r, p, count(*) AS cnt FROM e GROUP BY 1, 2),
top AS (SELECT t, count(*) AS n_exact FROM tok GROUP BY 1
        ORDER BY n_exact DESC, t LIMIT {topn}),
pe AS (SELECT top.t, u.r, u.p FROM top,
       LATERAL (SELECT * FROM (VALUES {vals}) AS v(r, p)) u),
est AS (SELECT pe.t, min(coalesce(tab.cnt, 0)) AS cms_count
        FROM pe LEFT JOIN tab USING (r, p) GROUP BY 1)
SELECT top.t AS token, top.n_exact, est.cms_count
FROM top JOIN est ON est.t = top.t
"""


@query("heavy_hitters_cms", _cms_sql())
def q_heavy_hitters_cms(spark, sf_dir):
    """Corpus heavy hitters through a count-min sketch: the exact top-10
    tokens next to their CMS point estimates (1024x3 counters) — the
    oracle replays counters and min-query exactly.  CMS never
    undercounts; at 100 TB the counter table is a fixed depth·width rows
    per group however large the corpus, and tables merge by summing."""
    from orange3_timeseries_spark.operators.sketch import (
        cms_estimate,
        cms_tables,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(T.tokens_expr(F.col("text"))).alias("token"))
    tab = cms_tables(toks, "token", width=1024, depth=3)
    # orderBy+limit compiles to TakeOrderedAndProject — parallel partial
    # top-k per partition, never a single-task global sort
    top = (toks.groupBy("token").agg(F.count("*").alias("n_exact"))
           .orderBy(F.col("n_exact").desc(), F.col("token").asc())
           .limit(10))
    est = cms_estimate(tab, top.select("token"), "token",
                       width=1024, depth=3)
    return top.join(est, "token").select("token", "n_exact", "cms_count")


@query("sample_weighted_topn", f"""
WITH t AS (SELECT doc_id, source, n_chars,
                  pow(({_PH.format(e="doc_id::VARCHAR")} + 1) / 1152921504606846976.0,
                      1.0 / n_chars) AS prio
           FROM documents),
r AS (SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY prio DESC, doc_id) AS rn
      FROM t)
SELECT doc_id, source, n_chars FROM r WHERE rn <= 5
""")
def q_sample_weighted_topn(spark, sf_dir):
    """Weight-proportional sampling without replacement
    (Efraimidis-Spirakis priorities on the portable hash): top-5 docs
    per source with inclusion odds proportional to length — longer docs
    preferred but not guaranteed, reproducible everywhere.  The oracle
    replays priorities and ranking."""
    from orange3_timeseries_spark.operators.sampling import (
        weighted_sample,
    )

    d = read_table(spark, sf_dir, "documents")
    out = weighted_sample(d, "source", "doc_id", "n_chars", 5)
    return out.select("doc_id", "source", "n_chars")


@query("corpus_diff_cleaning", f"""
WITH old AS (SELECT doc_id, md5(text) AS da FROM documents
             WHERE doc_id % 11 != 0),
new AS (SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9\\s]', ' ', 'g'),
                        '\\s+', ' ', 'g'))) AS db
        FROM documents WHERE len({_TOKS}) >= 50)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN new.db IS NULL THEN 'removed'
            WHEN old.da IS NULL THEN 'added'
            WHEN old.da != new.db THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
""")
def q_corpus_diff_cleaning(spark, sf_dir):
    """Snapshot diff auditing a cleaning stage: the previous crawl
    (docs with doc_id % 11 != 0, raw text) vs the cleaned current crawl
    (all docs passing the 50-word gate, normalized text) — per doc:
    added / removed / changed / unchanged.  Digest-only full-outer
    join; payloads never shuffle."""
    d = read_table(spark, sf_dir, "documents")
    old = d.where(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    new = (d.where(T.token_count_expr(F.col("text")) >= 50)
           .select("doc_id",
                   T.normalize_text_expr(F.col("text")).alias("text")))
    return D.corpus_diff(old, new, "doc_id", "text")


_SCORE_SQL = f"""
(least(len({_TOKS}) / 50.0, 1.0)
 + (CASE WHEN (length(regexp_replace(text, '\\s+', '', 'g'))
               / nullif(len({_TOKS})::DOUBLE, 0.0)) >= 3
          AND (length(regexp_replace(text, '\\s+', '', 'g'))
               / nullif(len({_TOKS})::DOUBLE, 0.0)) <= 10
         THEN 1.0 ELSE 0.5 END)
 + least((len(list_filter({_TOKS}, x -> x IN ({_STOP_LIST})))
          / nullif(len({_TOKS})::DOUBLE, 0.0)) * 5, 1.0)
 + greatest(0.0, 1.0 - ((length(text)
         - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
        / nullif(length(text)::DOUBLE, 0.0)) * 5)) / 4
"""


@query("quality_calibrated_filter", f"""
WITH s AS (SELECT doc_id, lang, {_SCORE_SQL} AS score FROM documents),
t AS (SELECT lang, quantile_cont(score, 0.2) AS thr FROM s GROUP BY 1)
SELECT s.doc_id, s.lang, round(s.score, 6) AS score
FROM s JOIN t ON s.lang = t.lang
WHERE s.score >= t.thr
""")
def q_quality_calibrated_filter(spark, sf_dir):
    """Per-language percentile-calibrated quality gate: keep docs at or
    above their language's 20th-percentile composite score — adaptive
    thresholds instead of one global constant (what corpus curation
    actually does across languages of very different surface statistics).
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` share
    the linear-interpolation definition, so the cut is value-replayed
    exactly."""
    d = read_table(spark, sf_dir, "documents")
    out = T.calibrated_quality_filter(d, "text", "doc_id", "lang",
                                      pct=0.2)
    return out.select("doc_id", "lang", r6(F.col("score"), "score"))


def _curation_pipeline_sql():
    """Composed oracle for the full curation pipeline: every stage's
    verified SQL building block re-rooted from ``documents`` onto the
    previous stage's survivors (string-level re-rooting is exact — each
    block reads its input relation in exactly the spots replaced)."""
    gopher = f"len({_TOKS}) BETWEEN 50 AND 100000"
    norm = ("trim(regexp_replace(regexp_replace(lower(text), "
            "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))")
    pairs = _minhash_pairs_sql().replace("FROM documents", "FROM base")
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY {norm} ORDER BY doc_id) AS rn
    FROM documents WHERE {gopher}) t
  WHERE rn = 1),
p AS ({pairs}),
e AS (SELECT id_a AS s, id_b AS d FROM p
      UNION SELECT id_b, id_a FROM p),
cc(id, lab) AS (
  SELECT doc_id, doc_id FROM base
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s),
lab AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM cc GROUP BY id),
kept AS (SELECT base.doc_id, base.text
         FROM base JOIN lab USING (doc_id)
         WHERE lab.cluster_id = base.doc_id),
w AS (SELECT doc_id, len({_TOKS}) AS nt FROM kept),
r AS (SELECT doc_id, nt,
             row_number() OVER (ORDER BY nt DESC, doc_id) - 1 AS i
      FROM w),
s AS (SELECT CASE WHEN (i % 8) < 4 THEN (i % 8)
                  ELSE 7 - (i % 8) END AS shard, nt
      FROM r)
SELECT shard::INT AS shard, count(*) AS n_docs,
       sum(nt)::BIGINT AS total_weight
FROM s GROUP BY 1
"""


@query("pipeline_curate_corpus", _curation_pipeline_sql())
def q_pipeline_curate_corpus(spark, sf_dir):
    """The END-TO-END curation pipeline as one lazy DAG: Gopher
    word-count gate → exact dedup on normalized text (min-id keep) →
    MinHash-LSH near-dup corpus (canonical per cluster) →
    token-balanced snake sharding, returning the final shard manifest.
    One value-hash covers the composition of four verified stages —
    the manifest is wrong if ANY stage drops or keeps a different
    document.  Catalyst plans the whole chain as one job; nothing is
    materialized between stages."""
    from orange3_timeseries_spark.operators.sharding import (
        balanced_shards,
        shard_manifest,
    )

    d = read_table(spark, sf_dir, "documents")
    gated = d.where(
        T.token_count_expr(F.col("text")).between(50, 100000))
    normed = gated.select(
        "doc_id", "text",
        T.normalize_text_expr(F.col("text")).alias("__norm__"))
    exact_kept = D.exact_dedup_filter(normed, "__norm__", "doc_id") \
        .select("doc_id", "text")
    pairs = D.minhash_lsh_pairs(exact_kept, "text", "doc_id",
                                k=16, bands=4, n=3, threshold=0.2)
    kept = D.dedup_corpus(exact_kept, pairs, "doc_id")
    weighted = kept.select(
        "doc_id", T.token_count_expr(F.col("text")).alias("nt"))
    assigned = balanced_shards(weighted, "doc_id", "nt", 4)
    return shard_manifest(assigned, "shard", "nt") \
        .select("shard", "n_docs", "total_weight")


def _emb_pipeline_sql(M=8, ds=8, K=16):
    chain = " + ".join(
        f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))"
        for i in range(ds))
    return f"""
WITH RECURSIVE ep AS ({_EMB_PAIRS_SQL}),
e AS (SELECT id_a AS s, id_b AS d FROM ep
      UNION SELECT id_b, id_a FROM ep),
cc(id, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, cc.lab FROM cc JOIN e ON cc.id = e.s),
lab AS (SELECT id AS vec_id, min(lab) AS cluster_id FROM cc GROUP BY id),
kept AS (SELECT emb.vec_id, emb.embedding::DOUBLE[] AS v
         FROM embeddings emb JOIN lab USING (vec_id)
         WHERE lab.cluster_id = emb.vec_id),
ms AS (SELECT unnest(generate_series(0, {M-1})) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.embedding::DOUBLE[],
                         ms.m*{ds}+1, ms.m*{ds}+{ds}) AS cv
       FROM embeddings x, ms WHERE x.vec_id < {K}),
sl AS (SELECT k.vec_id, ms.m,
              list_slice(k.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS sv
       FROM kept k, ms),
enc AS (SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
        FROM sl s JOIN cb b ON s.m = b.m),
codes AS (SELECT vec_id, m, j AS code FROM (
    SELECT vec_id, m, j,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist, j) AS rn
    FROM enc) t
  WHERE rn = 1)
SELECT vec_id, string_agg(code::VARCHAR, '-' ORDER BY m) AS code_str
FROM codes GROUP BY 1
"""


@query("pipeline_embedding_index", _emb_pipeline_sql())
def q_pipeline_embedding_index(spark, sf_dir):
    """The embedding-side pipeline composed end to end: semantic dedup
    (cosine near-dup clusters, canonical keep) → product-quantization
    encoding of the surviving vectors (codebooks injected from the
    first 16 corpus embeddings) — the 'build the compressed serving
    index from the deduplicated corpus' path, one value hash over both
    stages.  Single-modality (embeddings only), so the sf-dependent
    documents/embeddings coverage gap audited by
    `coverage_audit_embeddings` cannot drop rows here."""
    e = read_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(e, threshold=0.35)
    kept = D.dedup_corpus(e, pairs, "vec_id")
    cent_rows = (e.where(F.col("vec_id") < 16).orderBy("vec_id")
                 .select("embedding").collect())
    M, ds = 8, 8
    books = [[[float(x) for x in r.embedding[m * ds:(m + 1) * ds]]
              for r in cent_rows] for m in range(M)]
    codes = S.pq_encode(kept.select("vec_id", "embedding"), books)
    return codes.select(
        "vec_id",
        F.concat_ws("-", F.transform(F.col("pq_code"),
                                     lambda c: c.cast("string")))
        .alias("code_str"))


@query("duplication_rate_by_source", f"""
WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
g AS (SELECT source,
             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7))
                       AS i) u
      WHERE len(toks) >= 8)
SELECT source,
       count(*) AS n_grams,
       count(DISTINCT gram) AS n_distinct,
       round(1.0 - count(DISTINCT gram)::DOUBLE / count(*), 6)
           AS dup_rate
FROM g GROUP BY 1
""")
def q_duplication_rate_by_source(spark, sf_dir):
    """Corpus duplication rate per source — the dataset-card metric:
    fraction of 8-gram occurrences that repeat an earlier occurrence
    within the source.  Two-phase count-distinct aggregation over
    exploded grams; entirely shuffle-bounded by (source, gram)
    cardinality."""
    d = read_table(spark, sf_dir, "documents")
    toks = T.tokens_expr(F.col("text"))
    g = (d.withColumn("__toks__", toks)
         .where(F.size(F.col("__toks__")) >= 8)
         .select("source",
                 F.explode(F.transform(
                     F.sequence(F.lit(1), F.size(F.col("__toks__")) - 7),
                     lambda i: F.concat_ws(" ", F.slice(F.col("__toks__"),
                                                        i, 8))))
                 .alias("gram")))
    return (g.groupBy("source")
            .agg(F.count("*").alias("n_grams"),
                 F.countDistinct("gram").alias("n_distinct"))
            .select("source", "n_grams", "n_distinct",
                    F.round(1.0 - F.col("n_distinct").cast("double")
                            / F.col("n_grams"), 6).alias("dup_rate")))


@query("dataset_card_by_source", f"""
WITH t AS (SELECT source, lang, md5(text) AS dg,
                  len({_TOKS}) AS nt,
                  {_SCORE_SQL} AS score
           FROM documents)
SELECT source, count(*) AS n_docs,
       sum(nt)::BIGINT AS n_tokens,
       round(avg(score), 6) AS mean_quality,
       count(DISTINCT lang) AS n_langs,
       round(1.0 - count(DISTINCT dg)::DOUBLE / count(*), 6)
           AS dup_doc_rate
FROM t GROUP BY 1
""")
def q_dataset_card_by_source(spark, sf_dir):
    """The per-source DATASET CARD in one aggregation pass: document
    and token counts, mean composite quality, language breadth, and the
    within-source exact-duplicate rate — the summary table a corpus
    release ships.  Digests and scores are scan-side expressions; the
    shuffle carries one row per (source, distinct-key)."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "source", "lang",
        F.md5(F.col("text")).alias("dg"),
        T.token_count_expr(F.col("text")).alias("nt"),
        T.quality_score_expr(F.col("text")).alias("score"))
    return (t.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("nt").cast("long").alias("n_tokens"),
                 F.round(F.avg("score"), 6).alias("mean_quality"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.round(1.0 - F.countDistinct("dg").cast("double")
                         / F.count("*"), 6).alias("dup_doc_rate")))


@query("dedup_agreement", f"""
WITH tp AS ({_minhash_pairs_sql()}),
ep AS ({_EMB_PAIRS_SQL}),
t2 AS (SELECT id_a, id_b FROM tp),
e2 AS (SELECT id_a, id_b FROM ep),
j AS (SELECT coalesce(t2.id_a, e2.id_a) AS id_a,
             coalesce(t2.id_b, e2.id_b) AS id_b,
             t2.id_a IS NOT NULL AS in_text,
             e2.id_a IS NOT NULL AS in_emb
      FROM t2 FULL OUTER JOIN e2
        ON t2.id_a = e2.id_a AND t2.id_b = e2.id_b)
SELECT count(*) FILTER (WHERE in_text AND in_emb) AS n_both,
       count(*) FILTER (WHERE in_text AND NOT in_emb) AS n_text_only,
       count(*) FILTER (WHERE in_emb AND NOT in_text) AS n_emb_only
FROM j
""")
def q_dedup_agreement(spark, sf_dir):
    """Cross-modality dedup QA: how the MinHash text near-dup pairs and
    the embedding cosine near-dup pairs agree (both / text-only /
    embedding-only) over the doc_id = vec_id join — the audit that
    tells a curation run whether its lexical and semantic dedup stages
    see the same duplicates.  Two skinny pair sets, one full-outer
    join, one row out."""
    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    tp = D.minhash_lsh_pairs(d, "text", "doc_id", k=16, bands=4, n=3,
                             threshold=0.2).select("id_a", "id_b")
    ep = S.embedding_neardup_pairs(e, threshold=0.35) \
        .select("id_a", "id_b")
    j = tp.withColumn("in_text", F.lit(True)).join(
        ep.withColumn("in_emb", F.lit(True)),
        ["id_a", "id_b"], "full_outer")
    return j.agg(
        F.count(F.when(F.col("in_text") & F.col("in_emb"), 1))
        .alias("n_both"),
        F.count(F.when(F.col("in_text") & F.col("in_emb").isNull(), 1))
        .alias("n_text_only"),
        F.count(F.when(F.col("in_emb") & F.col("in_text").isNull(), 1))
        .alias("n_emb_only"))


# ----------------------------------------------------------------- BPE tier
def _bpe_train_sql(n_merges=16, max_vocab=50_000, final=None):
    """Unrolled BPE training replay: capped word-count table, then per
    merge round (i) adjacent-POSITION pair counting from the symbol
    lists, (ii) best pair by (count desc, pair asc), (iii) greedy
    left-to-right merge via literal ``replace`` over the WRAPPED symbol
    representation (chr(31)-delimited, no shared characters between
    neighboring pairs — see operators/bpe.py) — the exact contract the
    engine implements.  ``final`` selects the output shape (merge list
    vs per-doc token counts)."""
    S = chr(31)
    stages = [f"""wc AS MATERIALIZED (
  SELECT w, count(*) AS cnt FROM (
    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                              x -> x != '' AND NOT contains(x, '{S}')))
        AS w
    FROM documents) t
  GROUP BY w ORDER BY cnt DESC, w ASC LIMIT {max_vocab}),
v0 AS MATERIALIZED (
  SELECT w, cnt, regexp_replace(w, '(.)', '{S}\\1{S}', 'g') AS s
  FROM wc)"""]
    for t in range(n_merges):
        stages.append(f"""pc{t} AS MATERIALIZED (
  SELECT l[i] AS x, l[i + 1] AS y, sum(cnt) AS c
  FROM (SELECT cnt, string_split(trim(s, '{S}'), '{S}{S}') AS l
        FROM v{t}) q,
       LATERAL unnest(generate_series(1, len(l) - 1)) g(i)
  WHERE len(l) > 1
  GROUP BY 1, 2),
best{t} AS MATERIALIZED (
  SELECT x, y FROM pc{t} ORDER BY c DESC, x ASC, y ASC LIMIT 1),
v{t + 1} AS MATERIALIZED (
  SELECT w, cnt,
         replace(s, '{S}' || b.x || '{S}{S}' || b.y || '{S}',
                 '{S}' || b.x || b.y || '{S}') AS s
  FROM v{t} CROSS JOIN best{t} b)""")
    body = ",\n".join(stages)
    if final == "merges":
        sel = "\nUNION ALL ".join(
            f"SELECT {t + 1} AS merge_rank, x AS lft, y AS rgt FROM best{t}"
            for t in range(n_merges))
        return f"WITH {body}\n{sel}"
    prefix = f"""WITH {body},
tok AS (SELECT w,
               ((len(s) - len(replace(s, '{S}', ''))) // 2)::INT
                   AS n_tok
        FROM v{n_merges}),
docw AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x != '')) AS w
  FROM documents)"""
    if final == "fertility":
        unm = ("CASE WHEN len(d.w) > 1 AND coalesce(t.n_tok, len(d.w))"
               " = len(d.w) THEN 1 ELSE 0 END")
        return f"""{prefix}
SELECT d.doc_id,
       count(*)::BIGINT AS n_words,
       sum(coalesce(t.n_tok, len(d.w)))::BIGINT AS n_tokens,
       sum({unm})::BIGINT AS n_unmerged,
       round(sum(coalesce(t.n_tok, len(d.w)))::DOUBLE
             / count(*)::DOUBLE, 6) AS fertility,
       round(sum({unm})::DOUBLE
             / nullif(sum(CASE WHEN len(d.w) > 1 THEN 1 ELSE 0 END),
                      0)::DOUBLE, 6) AS unmerged_ratio
FROM docw d LEFT JOIN tok t USING (w)
GROUP BY d.doc_id"""
    return f"""{prefix}
SELECT d.doc_id, sum(coalesce(t.n_tok, len(d.w)))::BIGINT AS n_tokens
FROM docw d LEFT JOIN tok t USING (w)
GROUP BY d.doc_id"""


@query("bpe_train_merges", _bpe_train_sql(final="merges"))
def q_bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING on the corpus (Sennrich et al. 2016): the
    16 highest-frequency adjacent-symbol merges, learned from the
    distributed word-count table (the only corpus-sized pass) with the
    merge loop on the bounded capped vocabulary.  The oracle replays
    every round — position pair counts, (count desc, pair asc)
    tie-break, greedy non-overlapping merge — as unrolled CTEs."""
    from orange3_timeseries_spark.operators.bpe import train_bpe

    d = read_table(spark, sf_dir, "documents")
    merges = train_bpe(d, "text", n_merges=16)
    return local_df(
        spark,
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, lft string, rgt string")


@query("bpe_doc_token_counts", _bpe_train_sql())
def q_bpe_doc_token_counts(spark, sf_dir):
    """Per-document BPE token counts under the corpus-trained 16-merge
    tokenizer: the merge chain applies as pure-Catalyst literal
    ``replace`` expressions over the BOUNDED vocabulary, which joins
    back (broadcast) to the exploded corpus words — encoding cost
    O(vocab) + one corpus-sized join, no Python in the hot path.  The
    oracle re-derives the merges itself and replays the same
    word→token-count join."""
    from orange3_timeseries_spark.operators.bpe import (
        bpe_doc_token_counts,
        train_bpe,
        word_count_table,
    )

    d = read_table(spark, sf_dir, "documents")
    # ONE corpus-sized pass: the capped word-count table is pinned and
    # shared by the trainer (driver merge loop) and the encoder (the
    # Catalyst replace chain + broadcast join)
    wc = word_count_table(d, "text").localCheckpoint()
    merges = train_bpe(d, "text", n_merges=16, word_counts=wc)
    return bpe_doc_token_counts(d, "doc_id", "text", merges,
                                word_counts=wc)


# ------------------------------------------------- quality classifier tier
def _irls_sql(iters=6, ridge=1e-3, final="coef"):
    """Unrolled IRLS replay for the logistic quality classifier: per
    round the per-doc linear predictor (explicit left-to-right
    association, clamped to ±30), sigmoid weights (1e-12 floor),
    working response, the 5x5 weighted normal equations aggregated over
    the corpus, ridge added on the diagonal, and a Gaussian-elimination
    solve rounded to 7 decimals — exactly
    ``operators/classifier.logistic_train_irls``.  Features are the
    Gopher metrics (integer-ratio arithmetic → bit-identical across
    engines); the label is the combined gopher_pass rule."""
    from orange3_timeseries_spark.queries_models import _gauss_sql

    k = 5
    stages = [f"""t AS MATERIALIZED (
  SELECT doc_id, {_TOKS} AS toks FROM documents),
feat AS MATERIALIZED (
  SELECT doc_id,
         1.0::DOUBLE AS x0,
         (len(toks) / 100.0)::DOUBLE AS x1,
         coalesce(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                  / nullif(len(toks), 0), 0.0) AS x2,
         coalesce(len(list_filter(toks,
                       x -> regexp_matches(x, '[a-z]')))::DOUBLE
                  / nullif(len(toks), 0), 0.0) AS x3,
         (len(list_intersect(list_distinct(toks), [{_GOPHER_STOPS}]))
          / 10.0)::DOUBLE AS x4,
         CASE WHEN len(toks) BETWEEN 50 AND 100000
               AND (list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                    / nullif(len(toks), 0)) BETWEEN 3.0 AND 10.0
               AND (len(list_filter(toks,
                         x -> regexp_matches(x, '[a-z]')))::DOUBLE
                    / nullif(len(toks), 0)) >= 0.8
               AND len(list_intersect(list_distinct(toks),
                                      [{_GOPHER_STOPS}])) >= 2
              THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y
  FROM t),
cb0 AS MATERIALIZED (
  SELECT unnest(generate_series(0, {k - 1})) AS i, 0.0::DOUBLE AS v)"""]
    prev_beta = "cb0"
    for r in range(iters):
        wide = ", ".join(
            f"max(CASE WHEN i = {i} THEN v END) AS b{i}"
            for i in range(k))
        eta = " + ".join(f"b.b{i} * f.x{i}" for i in range(k))
        sums = []
        for i in range(k):
            for j in range(i, k):
                extra = f" + {ridge!r}" if i == j else ""
                sums.append(f"sum(w * x{i} * x{j}){extra} AS s_{i}_{j}")
            sums.append(f"sum(w * x{i} * z) AS r_{i}")
        unpiv = "\n  UNION ALL ".join(
            [f"SELECT 1 AS gk, {i} AS i, {j} AS j, s_{min(i, j)}_{max(i, j)} AS a FROM agg{r}"
             for i in range(k) for j in range(k)]
            + [f"SELECT 1 AS gk, {i} AS i, {k} AS j, r_{i} AS a FROM agg{r}"
               for i in range(k)])
        stages.append(f"""bw{r} AS MATERIALIZED (
  SELECT {wide} FROM {prev_beta}),
it{r} AS MATERIALIZED (
  SELECT f.*, 
         1.0 / (1.0 + exp(-(greatest(-30.0, least(30.0, {eta}))))) AS p,
         greatest(-30.0, least(30.0, {eta})) AS eta
  FROM feat f CROSS JOIN bw{r} b),
it2_{r} AS MATERIALIZED (
  SELECT *, greatest(p * (1.0 - p), 1e-12) AS w,
         eta + (y - p) / greatest(p * (1.0 - p), 1e-12) AS z
  FROM it{r}),
agg{r} AS MATERIALIZED (
  SELECT {", ".join(sums)} FROM it2_{r}),
aug{r} AS MATERIALIZED (
  {unpiv})""")
        stages.append(",\n".join(_gauss_sql(f"c{r + 1}", k, f"aug{r}", 7,
                                            key="gk")))
        prev_beta = f"betac{r + 1}"
    body = ",\n".join(stages)
    if final == "coef":
        return f"""WITH {body}
SELECT CAST(i AS INT) AS coef_idx, round(v, 6) AS coef
FROM {prev_beta}"""
    wide = ", ".join(f"max(CASE WHEN i = {i} THEN v END) AS b{i}"
                     for i in range(k))
    eta = " + ".join(f"b.b{i} * f.x{i}" for i in range(k))
    return f"""WITH {body},
bwf AS (SELECT {wide} FROM {prev_beta})
SELECT f.doc_id,
       round(1.0 / (1.0 + exp(-(greatest(-30.0, least(30.0, {eta}))))),
             6) AS score,
       (1.0 / (1.0 + exp(-(greatest(-30.0, least(30.0, {eta})))))
        >= 0.5) AS predicted_pass,
       f.y >= 0.5 AS gopher_pass
FROM feat f CROSS JOIN bwf b"""


def _classifier_parts(spark, sf_dir):
    from orange3_timeseries_spark.operators.text import (
        GOPHER_STOPWORDS,
        tokens_expr,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    n = F.size(toks)
    mean_len = (F.aggregate(toks, F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x)).cast("double")
                / F.nullif(n.cast("double"), F.lit(0.0)))
    alpha = (F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
             .cast("double") / F.nullif(n.cast("double"), F.lit(0.0)))
    stops = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    feats = {
        "x1": (n / F.lit(100.0)).cast("double"),
        "x2": F.coalesce(mean_len, F.lit(0.0)),
        "x3": F.coalesce(alpha, F.lit(0.0)),
        "x4": (stops / F.lit(10.0)).cast("double"),
    }
    label = (n.between(50, 100_000) & mean_len.between(3.0, 10.0)
             & (alpha >= 0.8) & (stops >= 2)).cast("double")
    return d, feats, label


@query("quality_classifier_coefs", _irls_sql(final="coef"))
def q_quality_classifier_coefs(spark, sf_dir):
    """TRAIN a logistic quality classifier on the corpus (IRLS, 6
    rounds): features are the Gopher metrics, the label is the combined
    gopher_pass rule, so the model learns a soft, calibrated version of
    the hard rules (the standard distillation trick for quality
    classifiers at corpus scale).  Each round is one distributed
    aggregation of the weighted normal equations; the oracle replays
    ALL rounds — per-doc sigmoid weights, the 5x5 system, ridge,
    elimination solve, 7-dp coefficient rounding."""
    from orange3_timeseries_spark.operators.classifier import (
        logistic_train_irls,
    )

    d, feats, label = _classifier_parts(spark, sf_dir)
    beta = logistic_train_irls(d, feats, label)
    return local_df(
        spark,
        [(i, round(b, 6)) for i, b in enumerate(beta)],
        "coef_idx int, coef double")


@query("quality_classifier_scores", _irls_sql(final="scores"))
def q_quality_classifier_scores(spark, sf_dir):
    """SCORE every document with the corpus-trained quality classifier:
    a pure Catalyst sigmoid expression (coefficients ride the plan), so
    serving is map-only on the scan — plus the hard-rule label for
    audit.  The oracle re-trains independently and replays the scoring
    expression."""
    from orange3_timeseries_spark.operators.classifier import (
        logistic_score_expr,
        logistic_train_irls,
    )

    d, feats, label = _classifier_parts(spark, sf_dir)
    beta = logistic_train_irls(d, feats, label)
    score = logistic_score_expr(feats, beta)
    return d.select(
        "doc_id",
        r6(score, "score"),
        (score >= 0.5).alias("predicted_pass"),
        (label >= 0.5).alias("gopher_pass"))


@query("warc_roundtrip", """
SELECT doc_id, length(text) AS n_chars, source
FROM documents
""")
def q_warc_roundtrip(spark, sf_dir):
    """WARC ingest round-trip: the documents corpus is written as
    spec-conformant WARC resource records (one .warc file per
    partition), read back through the binaryFile + record-parser path,
    and re-keyed from the WARC-Target-URI — the crawl-ingest step-0 of
    a training pipeline, value-hash-verified against the original
    table.  Source rides the URI path, so the URI construction and
    parse are both under the hash."""
    import shutil
    import tempfile

    from orange3_timeseries_spark.sources.warc import read_warc, write_warc

    d = read_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="warc_rt_")
    try:
        url = F.concat(F.lit("corpus://"), F.col("source"), F.lit("/"),
                       F.col("doc_id"))
        write_warc(d.select(url.alias("url"), "text").repartition(8),
                   tmp, "url", "text")
        back = read_warc(spark, tmp)
        part = F.split(F.regexp_replace("url", "^corpus://", ""), "/")
        out = back.select(
            F.element_at(part, 2).cast("long").alias("doc_id"),
            F.length("content").alias("n_chars"),
            F.element_at(part, 1).alias("source"))
        # force the read before the temp dir dies: the result is small
        # (skinny columns), so a localCheckpoint pins it
        return out.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("url_dedup_canonical", """
WITH g AS (SELECT doc_id // 2 AS k, min(doc_id) AS keep_id,
                  count(*) AS n_variants
           FROM documents GROUP BY 1)
SELECT 'http://corpus.example/doc/' || k || '?a=1&b=' || (k % 7)
           AS canonical_url,
       n_variants, keep_id
FROM g
""")
def q_url_dedup_canonical(spark, sf_dir):
    """URL-level dedup, the cheapest crawl-dedup tier: every document
    pair (2k, 2k+1) gets the SAME page under two spellings — one clean,
    one messy (uppercase scheme/host, www. prefix, explicit :80,
    tracking params, fragment, shuffled query order) — and
    canonicalization must collapse them.  The oracle states the
    expected canonical form directly from the id arithmetic, so every
    rule (case, www, default port, utm/fragment strip, query sort) is
    value-hash-verified end to end."""
    from orange3_timeseries_spark.operators.urls import url_dedup

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    k = (F.col("doc_id") / 2).cast("long")
    clean = F.concat(F.lit("http://corpus.example/doc/"), k,
                     F.lit("?b="), (k % 7).cast("string"),
                     F.lit("&a=1"))
    messy = F.concat(F.lit("HTTP://WWW.Corpus.Example:80/doc/"), k,
                     F.lit("?utm_source=feed&a=1&b="),
                     (k % 7).cast("string"), F.lit("#sec"))
    urls = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, clean).otherwise(messy)
        .alias("url"))
    return url_dedup(urls, "url", "doc_id")


# ------------------------------------------------- n-gram LM quality tier
_LM_TOKS = ("list_filter(string_split(trim(regexp_replace(regexp_replace("
            "lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), "
            "' '), t -> t != '')")


@query("lm_perplexity_by_doc", f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_LM_TOKS} AS ts FROM documents),
pairs AS MATERIALIZED (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1))
                      AS i) g),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(ts) AS w FROM toks) t GROUP BY 1),
v AS (SELECT count(*) AS V FROM uni),
bi AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
lp AS (
  SELECT p.doc_id,
         ln((coalesce(b.c2, 0) + 0.5) / (u.c1 + 0.5 * v.V)) AS lp
  FROM pairs p
  LEFT JOIN bi b USING (w1, w2)
  JOIN uni u ON u.w = p.w1
  CROSS JOIN v),
agg AS (SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_lp
        FROM lp GROUP BY 1)
SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
       round(a.avg_lp, 6) AS avg_logp,
       round(exp(-a.avg_lp), 6) AS ppl
FROM documents d LEFT JOIN agg a USING (doc_id)
""")
def q_lm_perplexity_by_doc(spark, sf_dir):
    """Bigram-LM perplexity per document — the KenLM-style quality gate
    (CCNet / Gopher / FineWeb score documents against a reference LM
    and drop the high-perplexity tail), self-trained on the corpus with
    add-0.5 smoothing.  Training is two map-combinable gram counts,
    scoring one join per gram table and a groupBy back to the document
    — no external LM, everything Catalyst.  The oracle retrains the
    identical counts and replays the smoothed log-prob algebra."""
    from orange3_timeseries_spark.operators.lm import bigram_perplexity

    d = read_table(spark, sf_dir, "documents")
    out = bigram_perplexity(d, "doc_id", "text", k=0.5)
    return out.select("doc_id", "n_bigrams",
                      r6(F.col("avg_logp"), "avg_logp"),
                      r6(F.col("ppl"), "ppl"))


@query("skew_profile_event_type", """
WITH counts AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
stats AS (SELECT sum(cnt) AS tot, max(cnt) AS mx, count(*) AS nk
          FROM counts),
top AS (
  SELECT event_type, cnt,
         row_number() OVER (ORDER BY cnt DESC, event_type) AS rank
  FROM counts QUALIFY rank <= 5)
SELECT t.event_type, t.cnt, t.rank,
       round(t.cnt::DOUBLE / s.tot, 6) AS share,
       s.nk AS n_keys,
       round(s.mx / (s.tot::DOUBLE / s.nk), 6) AS skew_ratio,
       CAST(least(64, ceil(s.mx / greatest(floor(s.tot / 32.0), 1)))
            AS INT) AS salts_recommended
FROM top t CROSS JOIN stats s
""")
def q_skew_profile_event_type(spark, sf_dir):
    """Join-key skew profile on ``events.event_type`` — the planning
    artifact read before choosing broadcast / salting / AQE for a
    100 TB join: top-5 hottest keys with corpus share, global key
    cardinality, skew ratio, and the :func:`skew_salt_count`
    recommendation at 32 slots.  One map-combinable groupBy over the
    key (distinct keys shuffle, never rows); oracle replays counts,
    shares, and the salt formula."""
    from orange3_timeseries_spark.operators.partitioning import (
        skew_profile,
    )

    d = read_table(spark, sf_dir, "events")
    out = skew_profile(d, "event_type", top_n=5, parallelism=32)
    return out.select("event_type", "cnt", "rank",
                      r6(F.col("share"), "share"), "n_keys",
                      r6(F.col("skew_ratio"), "skew_ratio"),
                      "salts_recommended")


def _psi_sql(n=10, eps=1e-4):
    qlist = ", ".join(f"quantile_cont(v, {k / n})" for k in range(1, n))
    return f"""
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
           FROM events),
r AS (SELECT value::DOUBLE AS v FROM events, b
      WHERE epoch_us(ts) <= mid AND value IS NOT NULL),
c AS (SELECT value::DOUBLE AS v FROM events, b
      WHERE epoch_us(ts) > mid AND value IS NOT NULL),
e AS (SELECT [{qlist}] AS edges FROM r),
rb AS (SELECT 1 + len(list_filter(e.edges, x -> v > x)) AS bucket,
              count(*) AS cnt
       FROM r, e GROUP BY 1),
cb AS (SELECT 1 + len(list_filter(e.edges, x -> v > x)) AS bucket,
              count(*) AS cnt
       FROM c, e GROUP BY 1),
buckets AS (SELECT unnest(generate_series(1, {n}))::INT AS bucket),
shares AS (
  SELECT b.bucket,
         coalesce(rb.cnt::DOUBLE / (SELECT sum(cnt) FROM rb), 0.0)
             AS p_ref,
         coalesce(cb.cnt::DOUBLE / (SELECT sum(cnt) FROM cb), 0.0)
             AS p_cur
  FROM buckets b
  LEFT JOIN rb ON rb.bucket = b.bucket
  LEFT JOIN cb ON cb.bucket = b.bucket),
terms AS (
  SELECT bucket, p_ref, p_cur,
         (greatest(p_ref, {eps}) - greatest(p_cur, {eps}))
             * ln(greatest(p_ref, {eps}) / greatest(p_cur, {eps}))
             AS contrib
  FROM shares)
SELECT bucket, round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       round(contrib, 6) AS contrib,
       round((SELECT sum(contrib) FROM terms), 6) AS psi
FROM terms
"""


@query("drift_psi_events", _psi_sql())
def q_drift_psi_events(spark, sf_dir):
    """Population Stability Index between the first and second time
    halves of the events stream — the standard drift gate between data
    snapshots (PSI < 0.1 stable, > 0.25 action).  Reference-quantile
    buckets ride the plan as a broadcast 1-row array (no driver
    collect); per-bucket shares are map-combinable counts; the oracle
    replays edges, bucketing, smoothing, and the decomposition."""
    from orange3_timeseries_spark.operators.drift import psi_drift

    d = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = d.agg(((F.min(us) + F.max(us)) / F.lit(2)).cast("long")
                   .alias("__mid__"))
    base = d.crossJoin(F.broadcast(bounds))
    ref = base.where(us <= F.col("__mid__"))
    cur = base.where(us > F.col("__mid__"))
    out = psi_drift(ref, cur, "value", n_buckets=10)
    return out.select("bucket", r6(F.col("p_ref"), "p_ref"),
                      r6(F.col("p_cur"), "p_cur"),
                      r6(F.col("contrib"), "contrib"),
                      r6(F.col("psi"), "psi"))


@query("chunk_documents_corpus", """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS toks
  FROM documents),
b AS (
  SELECT doc_id, toks, len(toks) AS n,
         1 + CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS INT)
             AS n_chunks
  FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, n_chunks, toks,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM b)
SELECT doc_id, chunk_id::INT AS chunk_id, n_chunks,
       (chunk_id * 48)::INT AS chunk_start,
       len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
           AS chunk_tokens,
       array_to_string(list_slice(toks, chunk_id * 48 + 1,
                                  chunk_id * 48 + 64), ' ')
           AS chunk_text
FROM c
""")
def q_chunk_documents_corpus(spark, sf_dir):
    """Context-window chunking of the corpus (64-token windows, 16
    overlap): the RAG/SFT preprocessing step that fans every long
    document into overlapping windows — a map-only explode on the scan,
    no shuffle, no Python.  The oracle replays tokenization, the chunk
    count arithmetic, and the reconstructed chunk text verbatim."""
    from orange3_timeseries_spark.operators.chunking import (
        chunk_documents,
    )

    d = read_table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", size=64, overlap=16)


@query("bucketed_join_user_value", """
WITH agg AS (
  SELECT user_id, count(*) AS n_events,
         round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1),
dim AS (
  SELECT user_id, min(event_type) AS first_type FROM events GROUP BY 1)
SELECT a.user_id, a.n_events, a.sum_value, d.first_type
FROM agg a JOIN dim d USING (user_id)
""")
def q_bucketed_join_user_value(spark, sf_dir):
    """The bucketed-table co-location primitive under the value-hash
    gate: an events aggregate and a per-user dim are BOTH written as
    user_id-bucketed catalog tables, then equi-joined — Catalyst
    recognizes the matching bucket layout and plans the join with ZERO
    Exchange on either side (asserted in-plan here, not just in
    tests), the property that makes every later per-user join in a
    100 TB pipeline shuffle-free after one write.  Result values
    hash-match the plain-join oracle; temp tables are dropped after an
    eager materialization."""
    import uuid as _uuid

    from orange3_timeseries_spark.sources.writers import write_bucketed

    d = read_table(spark, sf_dir, "events")
    agg = (d.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value")))
    dim = (d.groupBy("user_id")
           .agg(F.min("event_type").alias("first_type")))
    suffix = _uuid.uuid4().hex[:8]
    ta, td = f"bq_agg_{suffix}", f"bq_dim_{suffix}"
    # broadcast would WIN on this small dim (and a BroadcastExchange is
    # still an Exchange) — disable it so the plan demonstrates the
    # co-located sort-merge join bucketing buys at fact-x-fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(agg, ta, "user_id", 8)
        write_bucketed(dim, td, "user_id", 8)
        joined = spark.table(ta).join(spark.table(td), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, \
            "bucketed join must be shuffle-free"
        return joined.select("user_id", "n_events", "sum_value",
                             "first_type").localCheckpoint()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {td}")


@query("profile_documents_by_source", """
SELECT source, count(*) AS n,
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
       count(DISTINCT n_chars) AS n_distinct,
       round(avg(n_chars), 6) AS mean, round(stddev(n_chars), 6) AS std,
       round(min(n_chars), 6) AS vmin, round(max(n_chars), 6) AS vmax,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75
FROM documents GROUP BY 1
""")
def q_profile_documents_by_source(spark, sf_dir):
    """Per-source corpus length profile (exact quartiles) — the
    data-card / curation-dashboard stats a corpus slice ships with;
    same frequency-weighted exact-percentile plan as the lineitem
    profiler, grouped by the slice key."""
    from orange3_timeseries_spark.operators.profile import (
        profile_grouped,
    )

    d = read_table(spark, sf_dir, "documents")
    out = profile_grouped(d, "n_chars", ["source"])
    return out.select("source", "n", "n_null", "n_distinct",
                      r6(F.col("mean"), "mean"), r6(F.col("std"), "std"),
                      r6(F.col("vmin"), "vmin"), r6(F.col("vmax"), "vmax"),
                      r6(F.col("p25"), "p25"), r6(F.col("p50"), "p50"),
                      r6(F.col("p75"), "p75"))


@query("zipf_profile_corpus", """
WITH toks AS (
  SELECT unnest(list_filter(string_split(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
             '\\s+', ' ', 'g')), ' '), t -> t != '')) AS w
  FROM documents),
freq AS (SELECT w, count(*) AS f FROM toks GROUP BY 1),
ranked AS (
  SELECT w, f, row_number() OVER (ORDER BY f DESC, w) AS r
  FROM freq QUALIFY r <= 200),
lg AS (SELECT r, ln(r::DOUBLE) AS lr, ln(f::DOUBLE) AS lf FROM ranked),
s AS (
  SELECT count(*)::DOUBLE AS n, round(sum(lr), 7) AS sx,
         round(sum(lf), 7) AS sy, round(sum(lr * lr), 7) AS sxx,
         round(sum(lr * lf), 7) AS sxy
  FROM lg)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept
FROM s
""")
def q_zipf_profile_corpus(spark, sf_dir):
    """Zipf rank-frequency profile of the corpus: OLS slope of
    ln(freq) on ln(rank) over the top-200 tokens — natural language
    sits near -1; templated/boilerplate or synthetic corpora drift
    away, making the slope a cheap corpus-health metric next to the
    perplexity gate.  One token count, a top-k window, closed-form
    OLS on rounded sums."""
    from pyspark.sql import Window

    from orange3_timeseries_spark.operators.lm import lm_tokens_expr

    d = read_table(spark, sf_dir, "documents")
    freq = (d.select(F.explode(lm_tokens_expr(F.col("text")))
                     .alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("f")))
    ranked = (freq.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.col("f").desc(), F.col("w"))))
        .where(F.col("r") <= 200))
    lg = ranked.select(F.log(F.col("r").cast("double")).alias("lr"),
                       F.log(F.col("f").cast("double")).alias("lf"))
    s = lg.agg(F.count(F.lit(1)).cast("double").alias("n"),
               F.round(F.sum("lr"), 7).alias("sx"),
               F.round(F.sum("lf"), 7).alias("sy"),
               F.round(F.sum(F.col("lr") * F.col("lr")), 7).alias("sxx"),
               F.round(F.sum(F.col("lr") * F.col("lf")), 7).alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(n.cast("long").alias("n_ranks"),
                    r6(slope, "zipf_slope"),
                    r6((sy - slope * sx) / n, "intercept"))


@query("pipeline_curate_chunks", f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_LM_TOKS} AS ts FROM documents),
pairs AS MATERIALIZED (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1))
                      AS i) g),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(ts) AS w FROM toks) t GROUP BY 1),
v AS (SELECT count(*) AS V FROM uni),
bi AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
lp AS (
  SELECT p.doc_id,
         ln((coalesce(b.c2, 0) + 0.5) / (u.c1 + 0.5 * v.V)) AS lp
  FROM pairs p
  LEFT JOIN bi b USING (w1, w2)
  JOIN uni u ON u.w = p.w1
  CROSS JOIN v),
ppl AS (SELECT doc_id, count(*) AS nb, exp(-avg(lp)) AS ppl
        FROM lp GROUP BY 1 HAVING count(*) >= 20),
gate AS (  -- keep the best 90% by perplexity RANK (no float cutoff)
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY ppl, doc_id) AS rk,
           count(*) OVER () AS cnt
    FROM ppl) t
  WHERE rk <= (cnt * 9) // 10),
normed AS (
  SELECT d.doc_id, d.text,
         trim(regexp_replace(regexp_replace(lower(d.text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
  FROM documents d JOIN gate USING (doc_id)),
survivors AS (  -- exact dedup on normalized text, min-id keep
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(norm)
                              ORDER BY doc_id) AS rn
    FROM normed) t
  WHERE rn = 1),
ct AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS wt
  FROM survivors),
cb AS (
  SELECT doc_id, wt, len(wt) AS n,
         1 + CAST(ceil(greatest(len(wt) - 64, 0) / 48.0) AS INT)
             AS n_chunks
  FROM ct WHERE len(wt) > 0)
SELECT doc_id, chunk_id::INT AS chunk_id, n_chunks,
       len(list_slice(wt, chunk_id * 48 + 1, chunk_id * 48 + 64))
           AS chunk_tokens
FROM (SELECT doc_id, n_chunks, wt,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_id
      FROM cb) c
""")
def q_pipeline_curate_chunks(spark, sf_dir):
    """The ROUND-6 curation pipeline as one lazy DAG: self-trained
    bigram-LM perplexity gate (keep the best 90% by perplexity RANK —
    rank arithmetic, no float threshold, so the cut is
    engine-portable) → exact dedup on normalized text → context-window
    chunking (64/16) of the survivors.  One value-hash covers the
    composition: a wrong keep/drop/chunk in ANY stage breaks it.
    Catalyst plans the chain as one job."""
    from pyspark.sql import Window

    from orange3_timeseries_spark.operators.chunking import (
        chunk_documents,
    )
    from orange3_timeseries_spark.operators.lm import bigram_perplexity

    d = read_table(spark, sf_dir, "documents")
    scored = bigram_perplexity(d, "doc_id", "text", k=0.5)
    ranked = (scored.where(F.col("n_bigrams") >= 20)
              .select("doc_id",
                      F.row_number().over(
                          Window.orderBy(F.col("ppl"), F.col("doc_id")))
                      .alias("__rk__"),
                      F.count(F.lit(1)).over(
                          Window.partitionBy()).alias("__cnt__")))
    gate = ranked.where(
        F.col("__rk__") <= F.floor(F.col("__cnt__") * 9 / 10)) \
        .select("doc_id")
    gated = d.join(gate, "doc_id")
    normed = gated.select(
        "doc_id", "text",
        T.normalize_text_expr(F.col("text")).alias("__norm__"))
    survivors = D.exact_dedup_filter(normed, "__norm__", "doc_id") \
        .select("doc_id", "text")
    return chunk_documents(survivors, "doc_id", "text",
                           size=64, overlap=16) \
        .select("doc_id", "chunk_id", "n_chunks", "chunk_tokens")


# --------------------------------------------------- round-7 curation tier
@query("sample_temperature_mix", f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
a AS (SELECT source, n,
             round(200 * sqrt(n) / sum(sqrt(n)) OVER (), 6) AS ideal
      FROM counts),
b AS (SELECT source, n, ideal, floor(ideal)::BIGINT AS base,
             ideal - floor(ideal) AS rem
      FROM a),
c AS (SELECT source, n, base, rem,
             200 - sum(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM b),
tgt AS (SELECT source, n AS n_source,
               least(n, base + CASE WHEN rk <= leftover
                                    THEN 1 ELSE 0 END) AS target
        FROM c),
ranked AS (
  SELECT d.doc_id, d.source, t.n_source, t.target,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY {_PH_DOC}, d.doc_id) AS rn
  FROM documents d JOIN tgt t USING (source))
SELECT doc_id, source, n_source, target FROM ranked WHERE rn <= target
""")
def q_sample_temperature_mix(spark, sf_dir):
    """Temperature-T=2 (alpha=0.5) corpus remix to an exact 200-doc
    budget: per-source targets ``200·√n_s/Σ√n`` apportioned by largest
    remainder (Hamilton), selection in deterministic hash order — the
    multilingual-LM rebalancing step, fully in-plan (no driver collect,
    one corpus shuffle).  ``sqrt`` is IEEE-exact on both engines; ideal
    counts round 6 dp before floor/remainder (apportionment firewall)."""
    from orange3_timeseries_spark.operators.sampling import (
        temperature_mix,
    )

    d = read_table(spark, sf_dir, "documents")
    out = temperature_mix(d, "source", "doc_id", budget=200, alpha=0.5)
    return out.select("doc_id", "source", "n_source", "target")


@query("ngram_novelty_by_doc", f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES}) AS g FROM documents),
fst AS (SELECT g, min(doc_id) AS fid FROM sh GROUP BY 1),
per AS (SELECT s.doc_id,
               count(*)::BIGINT AS n_shingles,
               sum(CASE WHEN f.fid = s.doc_id
                        THEN 1 ELSE 0 END)::BIGINT AS n_novel
        FROM sh s JOIN fst f USING (g) GROUP BY 1)
SELECT d.doc_id,
       coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(p.n_novel, 0)::BIGINT AS n_novel,
       CASE WHEN coalesce(p.n_shingles, 0) > 0
            THEN round(p.n_novel / p.n_shingles::DOUBLE, 6)
       END AS novelty
FROM documents d LEFT JOIN per p USING (doc_id)
""")
def q_ngram_novelty_by_doc(spark, sf_dir):
    """Per-document 3-gram novelty: the share of a doc's distinct word
    trigrams that first appear (lowest doc_id) in that document — the
    aggregate redundancy/memorization dial of corpus curation, the
    complement of pairwise dedup.  One shingle-keyed map-combining
    min(id) shuffle; short docs keep a row with zero shingles."""
    from orange3_timeseries_spark.operators.dedup import ngram_novelty

    d = read_table(spark, sf_dir, "documents")
    return ngram_novelty(d, "text", "doc_id", n=3)


# --------------------------------------------------- round-7 semantic tier
def _semdedup_sql(tau=0.4, n_centroids=16, sample=2048, iters=10):
    body = ",\n".join(_lloyd_assign_stages(n_centroids, sample, iters))
    return f"""WITH {body},
pairs AS (
  SELECT a.nn_id AS id_a, b.nn_id AS id_b
  FROM assignf a JOIN assignf b
    ON a.cid = b.cid AND a.nn_id < b.nn_id
  WHERE list_inner_product(a.cvec, a.cvec) > 0
    AND list_inner_product(b.cvec, b.cvec) > 0
    AND round(list_cosine_similarity(a.cvec, b.cvec), 6) >= {tau!r}),
drops AS (SELECT DISTINCT id_b FROM pairs)
SELECT a.nn_id AS vec_id, a.cid AS centroid_id,
       (d.id_b IS NULL) AS is_kept
FROM assignf a LEFT JOIN drops d ON a.nn_id = d.id_b
"""


@query("semdedup_flags", _semdedup_sql())
def q_semdedup_flags(spark, sf_dir):
    """SemDeDup semantic deduplication (Abbas et al. 2023): Lloyd-
    cluster the embedding space (the same content-deterministic trainer
    the IVF index uses), then within each cluster drop every vector
    with a lower-id neighbor at cosine ≥ 0.4 — pair cost is Σ|cluster|²,
    never N².  The oracle replays the full unrolled Lloyd training plus
    the within-cluster pair sweep."""
    e = read_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup_flags(e, n_centroids=16, tau=0.4)


def _range_search_sql(radius=0.3, n_centroids=16, sample=2048,
                      iters=10, nprobe=4, n_queries=10):
    stages = _lloyd_assign_stages(n_centroids, sample, iters)
    stages.append(f"""q AS (SELECT vec_id AS query_id, v AS qv FROM c
      WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv, cid
  FROM q CROSS JOIN centf
  QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY list_inner_product(qv, cv) - half_cc DESC,
               cid) <= {nprobe}),
cand AS (
  SELECT p.query_id, a.nn_id,
         round(list_cosine_similarity(a.cvec, p.qv), 6) AS cosine
  FROM probes p JOIN assignf a ON a.cid = p.cid
  WHERE p.query_id != a.nn_id)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT query_id, nn_id, cosine FROM cand WHERE cosine >= {radius!r}"""


@query("ann_range_search", _range_search_sql())
def q_ann_range_search(spark, sf_dir):
    """IVF RANGE search — every neighbor with cosine ≥ 0.3 within the
    probed lists (top-k's sibling for radius workloads: dedup sweeps,
    "everything this similar" audits).  Same trained-IVF plan as
    ``ann_ivf_topk`` with the rank window replaced by a pushable
    filter; the oracle replays training, probing, and the radius cut."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return S.ivf_range_search(e, queries, radius=0.3, n_centroids=16,
                              nprobe=4)


def _pca_power_sql(iters=8, dim=64):
    import math

    v0 = repr(round(1.0 / math.sqrt(dim), 6))
    stages = [f"""c AS (SELECT vec_id, embedding::DOUBLE[] AS x
              FROM embeddings),
u AS (SELECT vec_id, unnest(x) AS val, generate_subscripts(x, 1) AS d
      FROM c),
mv AS MATERIALIZED (SELECT list(m ORDER BY d) AS m FROM (
  SELECT d, round(avg(val), 6) AS m FROM u GROUP BY d) t),
xc AS MATERIALIZED (
  SELECT vec_id, list_transform(range(1, len(x) + 1),
                                i -> x[i] - m[i]) AS xc
  FROM c CROSS JOIN mv),
v0 AS (SELECT list_transform(range(1, {dim} + 1), i -> {v0}) AS v)"""]
    for t in range(1, iters + 1):
        stages.append(f"""d{t} AS (
  SELECT vec_id, xc, list_inner_product(xc, v) AS dd
  FROM xc CROSS JOIN v{t - 1}),
s{t} AS MATERIALIZED (SELECT list(sv ORDER BY i) AS sv FROM (
  SELECT i, round(sum(xc[i] * dd), 6) AS sv
  FROM d{t}, LATERAL unnest(generate_series(1, len(xc))) g(i)
  GROUP BY i) t),
v{t} AS (SELECT list_transform(
    sv, y -> round(y / sqrt(list_inner_product(sv, sv)), 6)) AS v
  FROM s{t})""")
    stages.append(f"""piv AS (
  SELECT v[i] AS pv
  FROM v{iters}, LATERAL unnest(generate_series(1, {dim})) g(i)
  ORDER BY abs(v[i]) DESC, i LIMIT 1),
vf AS (SELECT CASE WHEN pv < 0 THEN list_transform(v, y -> -y)
              ELSE v END AS v
       FROM v{iters} CROSS JOIN piv),
dds AS (SELECT list_inner_product(xc, v) AS dd FROM xc CROSS JOIN vf),
lam AS (SELECT round(sum(dd * dd) / count(*), 6) AS lam FROM dds),
tot AS (SELECT round(sum(vv), 6) AS tot FROM (
  SELECT var_pop(val) AS vv FROM u GROUP BY d) t)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT i AS dim, v[i] AS loading, lam AS eigenvalue,
       round(lam / tot, 6) AS var_share
FROM vf, LATERAL unnest(generate_series(1, {dim})) g(i), lam, tot"""


@query("pca_top_component", _pca_power_sql())
def q_pca_top_component(spark, sf_dir):
    """Top principal component of the mean-centered embedding cloud by
    8-round power iteration — the whitening/compression primitive of an
    embedding pipeline.  Every round is one distributed pass (Catalyst
    dot-product fold + 64-key map-combining per-dimension sums); the
    driver holds only the 64-float iterate.  6-dp rounding of means,
    sums, and iterates pins both engines to bit-identical vectors; the
    oracle unrolls all 8 rounds as CTEs."""
    e = read_table(spark, sf_dir, "embeddings")
    v, lam, share, _m = S.pca_top_component(e, "embedding", iters=8)
    return local_df(
        spark,
        [(i + 1, float(v[i]), float(lam),
          float(share) if share is not None else None)
         for i in range(len(v))],
        "dim bigint, loading double, eigenvalue double, var_share double")


# ------------------------------------------------------ round-7 drift tier
@query("drift_ks_events", """
WITH r AS (SELECT event_type, value::DOUBLE AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
c AS (SELECT event_type, v,
             sum(CASE WHEN rn <= n // 2 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN rn >  n // 2 THEN 1 ELSE 0 END) AS c2
      FROM r WHERE v IS NOT NULL GROUP BY 1, 2),
run AS (SELECT event_type, v,
               sum(c1) OVER w AS r1, sum(c2) OVER w AS r2,
               sum(c1) OVER p AS n1, sum(c2) OVER p AS n2
        FROM c
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS UNBOUNDED PRECEDING),
               p AS (PARTITION BY event_type)),
agg AS (SELECT event_type,
               max(abs(r1::DOUBLE * n2 - r2::DOUBLE * n1)) AS mx,
               max(n1)::BIGINT AS n_ref, max(n2)::BIGINT AS n_cur
        FROM run GROUP BY 1),
stat AS (SELECT event_type, n_ref, n_cur,
                mx / (n_ref::DOUBLE * n_cur) AS d,
                n_ref::DOUBLE * n_cur
                    / (n_ref + n_cur) AS ne
         FROM agg),
pv AS (SELECT event_type, n_ref, n_cur, d,
              (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d AS lam
       FROM stat)
SELECT event_type, n_ref, n_cur, round(d, 6) AS ks_stat,
       round(CASE WHEN lam < 0.2 THEN 1.0 ELSE least(1.0, greatest(0.0,
             2 * exp(-2 * lam * lam) - 2 * exp(-8 * lam * lam) + 2 * exp(-18 * lam * lam) - 2 * exp(-32 * lam * lam) + 2 * exp(-50 * lam * lam) - 2 * exp(-72 * lam * lam) + 2 * exp(-98 * lam * lam) - 2 * exp(-128 * lam * lam) + 2 * exp(-162 * lam * lam) - 2 * exp(-200 * lam * lam) + 2 * exp(-242 * lam * lam) - 2 * exp(-288 * lam * lam) + 2 * exp(-338 * lam * lam) - 2 * exp(-392 * lam * lam) + 2 * exp(-450 * lam * lam) - 2 * exp(-512 * lam * lam) + 2 * exp(-578 * lam * lam) - 2 * exp(-648 * lam * lam) + 2 * exp(-722 * lam * lam) - 2 * exp(-800 * lam * lam))) END, 6) AS p_value,
       round(CASE WHEN lam < 0.2 THEN 1.0 ELSE least(1.0, greatest(0.0,
             2 * exp(-2 * lam * lam) - 2 * exp(-8 * lam * lam) + 2 * exp(-18 * lam * lam) - 2 * exp(-32 * lam * lam) + 2 * exp(-50 * lam * lam) - 2 * exp(-72 * lam * lam) + 2 * exp(-98 * lam * lam) - 2 * exp(-128 * lam * lam) + 2 * exp(-162 * lam * lam) - 2 * exp(-200 * lam * lam) + 2 * exp(-242 * lam * lam) - 2 * exp(-288 * lam * lam) + 2 * exp(-338 * lam * lam) - 2 * exp(-392 * lam * lam) + 2 * exp(-450 * lam * lam) - 2 * exp(-512 * lam * lam) + 2 * exp(-578 * lam * lam) - 2 * exp(-648 * lam * lam) + 2 * exp(-722 * lam * lam) - 2 * exp(-800 * lam * lam))) END, 6) < 0.05 AS drifted
FROM pv
""")
def q_drift_ks_events(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov drift gate per event type:
    the first half of each type's timeline (by time rank) is the
    reference, the second half the current window.  D maximizes on the
    INTEGER numerator |r1*n2 - r2*n1| (bit-exact on any engine); the
    asymptotic p-value uses Stephens' lambda correction with a 20-term
    Kolmogorov series, and the drift verdict compares the ROUNDED
    p-value so exp() ulps cannot flip it."""
    from orange3_timeseries_spark.operators.drift import ks_drift
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    ranked = (ev.withColumn("__rn__", F.row_number().over(w))
              .withColumn("__n__",
                          F.count(F.lit(1))
                          .over(W.partitionBy("event_type"))))
    ref = ranked.where(F.col("__rn__") <= F.floor(F.col("__n__") / 2))
    cur = ranked.where(F.col("__rn__") > F.floor(F.col("__n__") / 2))
    return ks_drift(ref, cur, "value", ["event_type"])


def _pca_scores_sql(iters=8, dim=64):
    base = _pca_power_sql(iters, dim)
    # reuse the power-iteration CTE body; swap the final projection for
    # a per-vector score against the sign-fixed component
    head, _, _tail = base.rpartition("\nSELECT i AS dim")
    return f"""{head}
SELECT c.vec_id, round(list_inner_product(x.xc, vf.v), 6) AS score
FROM c JOIN xc x USING (vec_id) CROSS JOIN vf
"""


@query("pca_scores", _pca_scores_sql())
def q_pca_scores(spark, sf_dir):
    """Per-vector projection onto the corpus' top principal component
    (the trained whitening/compression axis from
    ``pca_top_component``): score = (x − mean)·v, the 1-D embedding a
    curriculum or diversity sampler orders by.  Scoring is a pure
    Catalyst fold over the broadcast component — map-only, exchanges=0
    on the corpus side."""
    e = read_table(spark, sf_dir, "embeddings")
    v, _lam, _share, m = S.pca_top_component(e, "embedding", iters=8)
    m_lit = F.array(*[F.lit(float(y)) for y in m])
    v_lit = F.array(*[F.lit(float(y)) for y in v])
    x = F.col("embedding").cast("array<double>")
    xc = F.zip_with(x, m_lit, lambda a, b: a - b)
    score = F.aggregate(F.zip_with(xc, v_lit, lambda a, b: a * b),
                        F.lit(0.0), lambda acc, y: acc + y)
    return e.select("vec_id", F.round(score, 6).alias("score"))



def _curate_semantic_sql(tau=0.4):
    """r7 capstone oracle: the bigram-perplexity RANK gate (identical
    CTEs to ``pipeline_curate_chunks``) composed with the SemDeDup
    flags (identical unrolled-Lloyd CTEs to ``semdedup_flags``) and a
    per-source rollup of the surviving corpus — one value hash over the
    three-stage composition."""
    lloyd = ",\n".join(_lloyd_assign_stages())
    return f"""WITH toks AS MATERIALIZED (
  SELECT doc_id, {_LM_TOKS} AS ts FROM documents),
pairs AS MATERIALIZED (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1))
                      AS i) g),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(ts) AS w FROM toks) t GROUP BY 1),
v AS (SELECT count(*) AS V FROM uni),
bi AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
lp AS (
  SELECT p.doc_id,
         ln((coalesce(b.c2, 0) + 0.5) / (u.c1 + 0.5 * v.V)) AS lp
  FROM pairs p
  LEFT JOIN bi b USING (w1, w2)
  JOIN uni u ON u.w = p.w1
  CROSS JOIN v),
ppl AS (SELECT doc_id, count(*) AS nb, exp(-avg(lp)) AS ppl
        FROM lp GROUP BY 1 HAVING count(*) >= 20),
gate AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY ppl, doc_id) AS rk,
           count(*) OVER () AS cnt
    FROM ppl) t
  WHERE rk <= (cnt * 9) // 10),
{lloyd},
sempairs AS (
  SELECT a.nn_id AS id_a, b.nn_id AS id_b
  FROM assignf a JOIN assignf b
    ON a.cid = b.cid AND a.nn_id < b.nn_id
  WHERE list_inner_product(a.cvec, a.cvec) > 0
    AND list_inner_product(b.cvec, b.cvec) > 0
    AND round(list_cosine_similarity(a.cvec, b.cvec), 6) >= {tau!r}),
semdrops AS (SELECT DISTINCT id_b FROM sempairs),
kept AS (
  SELECT g.doc_id FROM gate g
  LEFT JOIN semdrops s ON s.id_b = g.doc_id
  WHERE s.id_b IS NULL)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS total_chars,
       sum(len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                           x -> x != '')))::BIGINT AS total_tokens
FROM documents d JOIN kept USING (doc_id)
GROUP BY 1"""


@query("pipeline_curate_semantic", _curate_semantic_sql())
def q_pipeline_curate_semantic(spark, sf_dir):
    """The ROUND-7 curation capstone as one DAG: self-trained
    perplexity RANK gate (keep the best 90%) -> SemDeDup semantic
    deduplication over the aligned embedding table (Lloyd clusters +
    within-cluster cosine drops, per-cluster GEMM kernel) -> per-source
    corpus rollup (docs / chars / tokens).  One value hash covers the
    composition: a wrong keep in EITHER gate or a wrong cluster
    assignment moves a source's totals.  Text and embeddings join on
    the shared id — the standard "score text, dedup in embedding
    space" two-modality pipeline.  The join-coverage contract this
    pipeline relies on (embeddings ⊆ documents; documents-side
    coverage may be partial, 0.4 at sf0.1) is measured by
    `coverage_audit_embeddings` (operators/audit.py:coverage_audit)
    and asserted executable in tests/test_audit.py — hence the
    anti-join below instead of an inner join."""
    from pyspark.sql import Window

    from orange3_timeseries_spark.operators.lm import bigram_perplexity

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    scored = bigram_perplexity(d, "doc_id", "text", k=0.5)
    ranked = (scored.where(F.col("n_bigrams") >= 20)
              .select("doc_id",
                      F.row_number().over(
                          Window.orderBy(F.col("ppl"), F.col("doc_id")))
                      .alias("__rk__"),
                      F.count(F.lit(1)).over(
                          Window.partitionBy()).alias("__cnt__")))
    gate = ranked.where(
        F.col("__rk__") <= F.floor(F.col("__cnt__") * 9 / 10))         .select("doc_id")
    # anti-join against the VERIFIED drops, not inner-join against the
    # keeps: a doc with no embedding row cannot be judged a near-dup,
    # so it passes the semantic gate untouched (at sf0.1 the embeddings
    # table covers only a subset of documents — an inner join would
    # silently discard every unembedded doc)
    sem_drops = (S.semantic_dedup_flags(e, n_centroids=16, tau=0.4)
                 .where(~F.col("is_kept"))
                 .select(F.col("vec_id").alias("doc_id")))
    kept = gate.join(sem_drops, "doc_id", "left_anti")
    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                           lambda x: x != ""))
    return (d.join(kept, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum(toks).cast("long").alias("total_tokens")))


@query("profile_embeddings", """
WITH u AS (SELECT unnest(embedding::DOUBLE[]) AS val,
                  generate_subscripts(embedding, 1) AS dim
           FROM embeddings)
SELECT dim::INT AS dim, count(*)::BIGINT AS n,
       round(avg(val), 6) AS mean,
       round(stddev_pop(val), 6) AS std,
       round(min(val), 6) AS vmin, round(max(val), 6) AS vmax
FROM u GROUP BY 1
""")
def q_profile_embeddings(spark, sf_dir):
    """Per-DIMENSION embedding health profile (mean/std/min/max per
    coordinate) — the collapse/scale diagnostic an embedding pipeline
    checks before indexing (a dead or exploding dimension shows up
    here).  One posexplode + 64-key map-combining aggregate; at 100 TB
    the shuffle moves 64 partial rows per task, nothing else."""
    e = read_table(spark, sf_dir, "embeddings")
    u = e.select(F.posexplode(F.col("embedding").cast("array<double>"))
                 .alias("d0", "val"))
    return (u.groupBy((F.col("d0") + 1).cast("int").alias("dim"))
            .agg(F.count(F.lit(1)).alias("n"),
                 r6(F.avg("val"), "mean"),
                 r6(F.stddev_pop("val"), "std"),
                 r6(F.min("val"), "vmin"),
                 r6(F.max("val"), "vmax")))


def _semdedup_rate_sql(tau=0.4, n_centroids=16, sample=2048, iters=10):
    body = ",\n".join(_lloyd_assign_stages(n_centroids, sample, iters))
    return f"""WITH {body},
pairs AS (
  SELECT a.nn_id AS id_a, b.nn_id AS id_b
  FROM assignf a JOIN assignf b
    ON a.cid = b.cid AND a.nn_id < b.nn_id
  WHERE list_inner_product(a.cvec, a.cvec) > 0
    AND list_inner_product(b.cvec, b.cvec) > 0
    AND round(list_cosine_similarity(a.cvec, b.cvec), 6) >= {tau!r}),
drops AS (SELECT DISTINCT id_b FROM pairs)
SELECT e.label, count(*)::BIGINT AS n,
       sum(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_kept,
       round(1.0 - sum(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 6) AS dup_rate
FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.id_b
GROUP BY 1
"""


@query("semdedup_rate_by_label", _semdedup_rate_sql())
def q_semdedup_rate_by_label(spark, sf_dir):
    """Semantic-duplication RATE per label slice: SemDeDup flags rolled
    up by the embedding table's class label — the per-domain redundancy
    dashboard (which slice of the corpus is semantically bloated).
    Reuses the full unrolled-Lloyd + pair-sweep oracle; the rollup is
    one broadcast join + map-combining aggregate."""
    e = read_table(spark, sf_dir, "embeddings")
    flags = S.semantic_dedup_flags(e, n_centroids=16, tau=0.4)
    j = e.select("vec_id", "label").join(
        F.broadcast(flags.select("vec_id", "is_kept")), "vec_id")
    kept = F.sum(F.col("is_kept").cast("int")).cast("long")
    return (j.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 kept.alias("n_kept"),
                 F.round(F.lit(1.0)
                         - kept / F.count(F.lit(1)).cast("double"), 6)
                 .alias("dup_rate")))


def _ann_recall_sql(k=5, n_queries=10, n_centroids=16, sample=2048,
                    iters=10, nprobe=4):
    stages = _lloyd_assign_stages(n_centroids, sample, iters)
    stages.append(f"""q AS (SELECT vec_id AS query_id, v AS qv FROM c
      WHERE vec_id < {n_queries}),
bf AS (
  SELECT query_id, nn_id FROM (
    SELECT q.query_id, cc.vec_id AS nn_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(cc.v, q.qv), 6)
                        DESC, cc.vec_id) AS rnk
    FROM q JOIN c cc ON cc.vec_id != q.query_id) t
  WHERE rnk <= {k}),
probes AS (
  SELECT query_id, qv, cid
  FROM q CROSS JOIN centf
  QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY list_inner_product(qv, cv) - half_cc DESC,
               cid) <= {nprobe}),
ivf AS (
  SELECT query_id, nn_id FROM (
    SELECT p.query_id, a.nn_id,
           row_number() OVER (PARTITION BY p.query_id
               ORDER BY round(list_cosine_similarity(a.cvec, p.qv), 6)
                        DESC, a.nn_id) AS rnk
    FROM probes p JOIN assignf a ON a.cid = p.cid
    WHERE p.query_id != a.nn_id) t
  WHERE rnk <= {k})""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT b.query_id,
       sum(CASE WHEN i.nn_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_hits,
       round(sum(CASE WHEN i.nn_id IS NOT NULL THEN 1 ELSE 0 END)
             / {float(k)!r}, 6) AS recall
FROM bf b LEFT JOIN ivf i USING (query_id, nn_id)
GROUP BY 1"""


@query("ann_recall_report", _ann_recall_sql())
def q_ann_recall_report(spark, sf_dir):
    """Index-quality monitoring: per-query recall@5 of the TRAINED IVF
    index against exact brute force — the dashboard number an ANN
    deployment tracks when retuning nprobe/centroids.  The oracle
    composes the exact top-5 (full scored rank) with the complete
    unrolled-Lloyd serving replay, so a recall regression in EITHER
    path breaks the hash.  At 100 TB the brute-force side runs on a
    bounded evaluation query set, never the corpus."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    bf = S.brute_force_topk(e, queries, k=5).select("query_id", "nn_id")
    ivf = (S.ivf_topk(e, queries, k=5, n_centroids=16, nprobe=4)
           .select("query_id", "nn_id")
           .withColumn("__hit__", F.lit(1)))
    j = bf.join(F.broadcast(ivf), ["query_id", "nn_id"], "left")
    return (j.groupBy("query_id")
            .agg(F.sum(F.coalesce("__hit__", F.lit(0))).cast("long")
                 .alias("n_hits"),
                 F.round(F.sum(F.coalesce("__hit__", F.lit(0)))
                         / F.lit(5.0), 6).alias("recall")))


@query("js_divergence_by_source", f"""
WITH tok AS (SELECT source, unnest({_TOKS}) AS i FROM documents),
gc AS (SELECT i, count(*) AS gcnt FROM tok GROUP BY 1),
topk AS (SELECT i, gcnt FROM (
    SELECT i, gcnt, row_number() OVER (ORDER BY gcnt DESC, i ASC) AS rk
    FROM gc) t WHERE rk <= 100),
gt AS (SELECT sum(gcnt)::DOUBLE AS g FROM topk),
per AS (SELECT source, i, count(*) AS c
        FROM tok JOIN topk USING (i) GROUP BY 1, 2),
skel AS (SELECT s.source, t.i, t.gcnt
         FROM (SELECT DISTINCT source FROM tok) s, topk t),
fl AS (SELECT skel.source, skel.i, skel.gcnt, coalesce(per.c, 0) AS c
       FROM skel LEFT JOIN per
         ON skel.source = per.source AND skel.i = per.i),
tot AS (SELECT source, sum(c)::DOUBLE AS st FROM fl GROUP BY 1),
pq AS (SELECT fl.source, st,
              CASE WHEN st > 0 THEN c / st ELSE 0.0 END AS p,
              gcnt / g AS q
       FROM fl JOIN tot ON fl.source = tot.source CROSS JOIN gt),
terms AS (SELECT source, st,
                 0.5 * (CASE WHEN p > 0
                             THEN p * ln(p / ((p + q) / 2.0))
                             ELSE 0.0 END)
                 + 0.5 * (q * ln(q / ((p + q) / 2.0))) AS term
          FROM pq),
agg AS (SELECT source, max(st) AS st, round(sum(term), 6) AS js
        FROM terms GROUP BY 1)
SELECT source, st::BIGINT AS n_in_support, js AS js_divergence,
       round(sqrt(greatest(js, 0.0)), 6) AS js_distance
FROM agg
""")
def q_js_divergence_by_source(spark, sf_dir):
    """Jensen-Shannon divergence of each source's token distribution
    against the pooled corpus over the global top-100 token support —
    the 'which source drifted from the mix' audit between crawl
    snapshots.  Counts are exact integers; only the ≤100-term final sum
    is rounded (6 dp), and √JS roots the rounded value on both engines.
    Plan: two map-combining counts + a broadcast K-item support — no
    driver state, group count unbounded (operators/drift.py)."""
    from orange3_timeseries_spark.operators.drift import js_divergence
    from orange3_timeseries_spark.operators.text import tokens_expr

    d = read_table(spark, sf_dir, "documents")
    occ = d.select("source",
                   F.explode(tokens_expr(F.col("text"))).alias("token"))
    return js_divergence(occ, "source", "token", top_k=100)


@query("label_centroid_cosine", """
WITH x AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT label, u.i AS dim, v[u.i] AS val
      FROM x, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) u),
c AS (SELECT label, dim, round(avg(val), 7) AS cv FROM e GROUP BY 1, 2),
n AS (SELECT label, round(sum(cv * cv), 7) AS nsq FROM c GROUP BY 1),
p AS (SELECT a.label AS label_a, b.label AS label_b,
             round(sum(a.cv * b.cv), 7) AS dot
      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2)
SELECT label_a, label_b,
       round(dot / sqrt(na.nsq * nb.nsq), 6) AS cosine
FROM p JOIN n na ON p.label_a = na.label
JOIN n nb ON p.label_b = nb.label
""")
def q_label_centroid_cosine(spark, sf_dir):
    """Pairwise cosine between per-label embedding centroids — the
    class-geometry companion to ``embedding_centroids`` /
    ``semdedup_rate_by_label``: near-1 off-diagonal cosines mean two
    classes have collapsed and semantic dedup will cross-fire.  The
    vector table is touched once (posexplode + partial means); the
    pairwise stage runs on the labels × dims centroid table.  Centroid
    components, norms, and dots all round before the final division
    (operators/similarity.py:centroid_cosine)."""
    e = read_table(spark, sf_dir, "embeddings")
    return S.centroid_cosine(e, "embedding", "label")


@query("text_entropy_by_doc", f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
c AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c)::DOUBLE AS n, count(*)::BIGINT AS types
      FROM c GROUP BY 1),
e AS (SELECT c.doc_id,
             round(-sum((c / n.n) * ln(c / n.n)), 6) AS entropy
      FROM c JOIN n ON c.doc_id = n.doc_id GROUP BY 1)
SELECT n.doc_id, n.n::BIGINT AS n_tokens, n.types AS n_types,
       CASE WHEN e.entropy = 0 THEN 0.0 ELSE e.entropy END AS entropy,
       round(n.types / n.n, 6) AS type_token_ratio
FROM n JOIN e ON n.doc_id = e.doc_id
""")
def q_text_entropy_by_doc(spark, sf_dir):
    """Per-document token Shannon entropy + type-token ratio — the
    lexical-diversity quality signals (low entropy ⇒ boilerplate,
    TTR → 0 ⇒ keyword stuffing) complementing the Gopher rules and the
    repetition detector.  Exact integer count ratios; the per-doc term
    sum rounds 6 dp (operators/text.py:token_entropy)."""
    d = read_table(spark, sf_dir, "documents")
    return T.token_entropy(d, "text", "doc_id")


@query("bigram_pmi_top50", f"""
WITH x AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, u.i AS pos, toks[u.i] AS t
        FROM x, LATERAL (SELECT unnest(generate_series(1, len(toks)))
                         AS i) u),
bg AS (SELECT a.t AS ta, b.t AS tb
       FROM tok a JOIN tok b
         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
cb AS (SELECT ta, tb, count(*) AS cxy FROM bg GROUP BY 1, 2),
cu AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT count(*)::DOUBLE AS tt FROM tok),
btot AS (SELECT count(*)::DOUBLE AS bt FROM bg),
p AS (SELECT ta, tb, cxy,
             round(ln((cxy / bt)
                      / ((ca.c / tt) * (cb2.c / tt))), 6) AS pmi
      FROM cb
      JOIN cu ca ON cb.ta = ca.t
      JOIN cu cb2 ON cb.tb = cb2.t
      CROSS JOIN tot CROSS JOIN btot
      WHERE cxy >= 5)
SELECT ta AS tok_a, tb AS tok_b, cxy::BIGINT AS pair_count, pmi
FROM p ORDER BY pmi DESC, ta, tb LIMIT 50
""")
def q_bigram_pmi_top50(spark, sf_dir):
    """Top-50 bigram collocations by PMI (pair floor 5) — the phrase-
    mining signal feeding tokenizer seeding and n-gram novelty.  PMI is
    scalar arithmetic on exact integer counts (identical doubles both
    engines); the top-K cut orders by (rounded pmi desc, tokens asc)
    so the selected SET is deterministic
    (operators/text.py:bigram_pmi)."""
    d = read_table(spark, sf_dir, "documents")
    return T.bigram_pmi(d, "text")


@query("compaction_plan_docs", """
WITH o AS (
  SELECT source, doc_id,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars
             AS bin_offset
  FROM documents)
SELECT source, doc_id, bin_offset::BIGINT AS bin_offset,
       CAST(floor(bin_offset / 4000) AS INT) AS bin_id
FROM o
""")
def q_compaction_plan_docs(spark, sf_dir):
    '''Small-file compaction plan per partition directory: pack docs
    into ~4000-byte output bins by the Delta/Iceberg OPTIMIZE rule
    (size-descending order, bin = the target-size slot the item's
    starting offset falls in).  Pure BIGINT cumsum per directory — one
    planner window per partition dir, no global sort, no driver state
    (operators/sharding.py:compaction_plan).'''
    from orange3_timeseries_spark.operators.sharding import compaction_plan

    d = read_table(spark, sf_dir, "documents")
    return compaction_plan(d, "doc_id", "n_chars", ["source"],
                           target_size=4000)


@query("bpe_fertility_by_doc", _bpe_train_sql(final="fertility"))
def q_bpe_fertility_by_doc(spark, sf_dir):
    '''Per-document tokenizer fit under the corpus-trained 16-merge
    BPE: fertility (tokens per word — near 1 = vocabulary covers the
    text), the unmerged multi-char word count (the OOV-ish tail the
    merges never touched), and its ratio.  Same exchanges=2 broadcast
    plan as bpe_doc_token_counts; the oracle re-derives the merges and
    replays the per-word token-count join with the same integer
    ratios (operators/bpe.py:bpe_fertility).'''
    from orange3_timeseries_spark.operators.bpe import (
        bpe_fertility,
        train_bpe,
        word_count_table,
    )

    d = read_table(spark, sf_dir, "documents")
    wc = word_count_table(d, "text").localCheckpoint()
    merges = train_bpe(d, "text", n_merges=16, word_counts=wc)
    return bpe_fertility(d, "doc_id", "text", merges, word_counts=wc)


def _kcenter_sql(k=8, where="TRUE"):
    """Unrolled Gonzalez greedy k-center replay: seed = lowest id, then
    per step the farthest point (max min-cosine-distance to the
    selected set, rounded 6 dp, lowest id ties), with each step's dot
    products and squared norms rounded 7 dp exactly as the engine does;
    ``where`` injects the deterministic hash-sample pre-filter of the
    sampled variant (operators/similarity.py:kcenter_select)."""
    stages = [f"""x AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE {where}),
el AS MATERIALIZED (
  SELECT vec_id, u.i AS dim, v[u.i] AS val
  FROM x, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) u),
nq AS MATERIALIZED (
  SELECT vec_id, round(sum(val * val), 7) AS nsq FROM el GROUP BY 1
  HAVING round(sum(val * val), 7) > 0),
c1 AS MATERIALIZED (SELECT min(vec_id) AS cid FROM nq),
md1 AS MATERIALIZED (
  SELECT e.vec_id,
         round(1 - round(sum(e.val * ce.val), 7)
               / sqrt(any_value(ne.nsq) * any_value(nc.nsq)), 6) AS dist
  FROM el e
  JOIN c1 ON TRUE
  JOIN el ce ON ce.vec_id = c1.cid AND ce.dim = e.dim
  JOIN nq ne ON ne.vec_id = e.vec_id
  JOIN nq nc ON nc.vec_id = c1.cid
  GROUP BY e.vec_id)"""]
    excl = ["(SELECT cid FROM c1)"]
    for t in range(1, k):
        not_in = " AND ".join(f"vec_id != {e}" for e in excl)
        stages.append(f"""m{t} AS MATERIALIZED (
  SELECT vec_id, dist FROM md{t}
  WHERE {not_in}
  ORDER BY dist DESC, vec_id ASC LIMIT 1)""")
        excl.append(f"(SELECT vec_id FROM m{t})")
        if t < k - 1:
            stages.append(f"""d{t + 1} AS MATERIALIZED (
  SELECT e.vec_id,
         round(1 - round(sum(e.val * ce.val), 7)
               / sqrt(any_value(ne.nsq) * any_value(nc.nsq)), 6) AS dist
  FROM el e
  JOIN m{t} ON TRUE
  JOIN el ce ON ce.vec_id = m{t}.vec_id AND ce.dim = e.dim
  JOIN nq ne ON ne.vec_id = e.vec_id
  JOIN nq nc ON nc.vec_id = m{t}.vec_id
  GROUP BY e.vec_id),
md{t + 1} AS MATERIALIZED (
  SELECT md.vec_id, least(md.dist, d.dist) AS dist
  FROM md{t} md JOIN d{t + 1} d USING (vec_id))""")
    body = ",\n".join(stages)
    sel = ["SELECT 1 AS sel_order, cid AS vec_id,"
           " CAST(NULL AS DOUBLE) AS sel_dist FROM c1"]
    sel += [f"SELECT {t + 1}, vec_id, dist FROM m{t}"
            for t in range(1, k)]
    return f"WITH {body}\n" + "\nUNION ALL ".join(sel)


@query("kcenter_diversity_sample", _kcenter_sql())
def q_kcenter_diversity_sample(spark, sf_dir):
    '''Greedy k-center (Gonzalez) diversity selection over the
    embedding table — the coreset primitive of data curation: 8
    maximally-spread exemplars with the coverage-radius curve
    (each pick's min cosine-distance to the already-selected set).
    K persisted-projection scans + TakeOrdered(1) per step, driver
    state = K center rows; the oracle unrolls all 8 greedy steps
    (operators/similarity.py:kcenter_select).'''
    e = read_table(spark, sf_dir, "embeddings")
    return S.kcenter_select(e, "embedding", "vec_id", k=8)


@query("hll_overlap_sources", f"""
WITH tok AS (SELECT source, unnest({_TOKS}) AS w FROM documents),
h AS (SELECT source, {_PH.format(e='w')} AS h FROM tok),
b AS (SELECT source, (h % 256)::INT AS reg,
             CASE WHEN (h >> 8) = 0 THEN 53
                  ELSE bit_count(((h >> 8) & -(h >> 8)) - 1) + 1
             END AS rho
      FROM h),
r AS (SELECT source, reg, max(rho) AS max_rho FROM b GROUP BY 1, 2),
a1 AS (SELECT source, sum(1.0 / (1::BIGINT << max_rho)) AS s,
              (256 - count(*))::DOUBLE AS zeros
       FROM r GROUP BY 1),
e1 AS (SELECT source,
              round(CASE WHEN (47072.71267120224 / (s + zeros)) <= 640.0
                              AND zeros > 0
                         THEN 256.0 * ln(256.0 / zeros)
                         ELSE 47072.71267120224 / (s + zeros)
                    END, 6) AS est
       FROM a1),
p AS (SELECT a.source AS group_a, b.source AS group_b,
             a.est AS est_a, b.est AS est_b
      FROM e1 a JOIN e1 b ON a.source < b.source),
ur AS (SELECT p.group_a, p.group_b, r.reg, max(r.max_rho) AS max_rho
       FROM p JOIN r ON r.source = p.group_a OR r.source = p.group_b
       GROUP BY 1, 2, 3),
a2 AS (SELECT group_a, group_b,
              sum(1.0 / (1::BIGINT << max_rho)) AS s,
              (256 - count(*))::DOUBLE AS zeros
       FROM ur GROUP BY 1, 2),
e2 AS (SELECT group_a, group_b,
              round(CASE WHEN (47072.71267120224 / (s + zeros)) <= 640.0
                              AND zeros > 0
                         THEN 256.0 * ln(256.0 / zeros)
                         ELSE 47072.71267120224 / (s + zeros)
                    END, 6) AS est_union
       FROM a2),
o AS (SELECT p.group_a, p.group_b, p.est_a, p.est_b, e2.est_union,
             round(greatest(p.est_a + p.est_b - e2.est_union, 0.0), 6)
                 AS overlap_est
      FROM p JOIN e2 ON p.group_a = e2.group_a
                     AND p.group_b = e2.group_b)
SELECT group_a, group_b, est_a, est_b, est_union, overlap_est,
       round(overlap_est / est_union, 6) AS jaccard_est
FROM o
""")
def q_hll_overlap_sources(spark, sf_dir):
    '''Pairwise distinct-TOKEN overlap between sources by HLL
    inclusion-exclusion (est(A)+est(B)-est(A∪B) over merged registers)
    — the sketch-tier vocabulary-overlap dashboard next to
    js_divergence_by_source: the corpus is hashed ONCE, the pair stage
    runs on sources² × 256 register rows, never on tokens
    (operators/sketch.py:hll_overlap).'''
    from orange3_timeseries_spark.operators.sketch import hll_overlap

    d = read_table(spark, sf_dir, "documents")
    tok = d.select("source",
                   F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                     r"\s+")).alias("w"))
    return hll_overlap(tok, "w", "source", p=8)


@query("gini_by_source", """
WITH b AS (
  SELECT source, n_chars::BIGINT AS s FROM documents
  WHERE n_chars IS NOT NULL AND n_chars >= 0),
r AS (
  SELECT source, s,
         row_number() OVER (PARTITION BY source ORDER BY s) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM b),
g AS (
  SELECT source, max(n)::BIGINT AS n_items, sum(s)::BIGINT AS total_size,
         sum((2 * i - n - 1) * s)::BIGINT AS w
  FROM r GROUP BY 1)
SELECT source, n_items, total_size,
       CASE WHEN total_size > 0
            THEN round(w::DOUBLE / (n_items::DOUBLE * total_size::DOUBLE),
                       6)
       END AS gini
FROM g WHERE n_items >= 2
""")
def q_gini_by_source(spark, sf_dir):
    '''Gini coefficient of per-document byte mass within each source --
    the corpus-balance audit a mixing stage reads before weighting
    sources (a source whose mass is one mega-document is not diverse,
    whatever its row count; companion to sample_temperature_mix and
    skew_profile).  All-BIGINT sorted-rank arithmetic, bit-exact on
    any engine (operators/profile.py:gini_concentration).'''
    from orange3_timeseries_spark.operators.profile import (
        gini_concentration,
    )

    d = read_table(spark, sf_dir, "documents")
    return gini_concentration(d, "n_chars", ["source"])


@query("readability_by_doc", """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents),
c AS (
  SELECT doc_id,
         len(toks) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1) AS s,
         list_sum(list_transform(toks,
             x -> greatest(len(regexp_extract_all(x, '[aeiouy]+', 0)),
                           1)))::BIGINT AS syl
  FROM t)
SELECT doc_id, w::BIGINT AS n_words, s::BIGINT AS n_sentences,
       syl AS n_syllables,
       round(206.835 - 1.015 * (w::DOUBLE / s::DOUBLE)
                     - 84.6 * (syl::DOUBLE / w::DOUBLE), 6) AS flesch
FROM c WHERE w > 0
""")
def q_readability_by_doc(spark, sf_dir):
    '''Flesch reading-ease per document (vowel-group syllable
    heuristic, terminal-punctuation sentence runs) -- the classic
    readability gate beside the Gopher rules: clean-but-unreadable
    docs (parts catalogs, minified fragments) score deeply negative.
    Pure Catalyst regexp + integer arithmetic, map-only
    (operators/text.py:readability).'''
    d = read_table(spark, sf_dir, "documents")
    return T.readability(d, "text", "doc_id")


def _jl_sql():
    cols = []
    for t in range(8):
        cols.append(f"""
       list_sum(list_transform(embedding, (e, i) ->
         CAST(round(e::DOUBLE * 1000000.0) AS BIGINT)
         * ((((1103515245 * ({4096 * t} + (i - 1)) + 12345)
              % 2147483648) >> 16) % 3 - 1)))::BIGINT::DOUBLE
         * (sqrt(3.0 / 16.0) / 1000000.0) AS p{t}""")
    return ("SELECT vec_id," + ",".join(cols)
            + "\nFROM embeddings WHERE embedding IS NOT NULL")


@query("jl_projection_embeddings", _jl_sql())
def q_jl_projection_embeddings(spark, sf_dir):
    '''Johnson-Lindenstrauss random projection of the 64-d embeddings
    to 8 dims via a deterministic hash-derived Achlioptas sign matrix
    -- the zero-state embedding compressor ahead of LSH bucketing or
    coarse clustering.  Exact BIGINT micro-unit dot products times one
    literal scale: bit-identical cross-engine, map-only, zero shuffle
    (operators/similarity.py:jl_project).'''
    emb = read_table(spark, sf_dir, "embeddings") \
        .where(F.col("embedding").isNotNull())
    return S.jl_project(emb, "embedding", ["vec_id"], out_dim=8)


@query("jl_projection_gemm", _jl_sql())
def q_jl_projection_gemm(spark, sf_dir):
    '''jl_project(engine='gemm'): the SAME hash-derived LCG sign matrix
    and integer quantization as one vectorized NumPy int64 GEMM per
    Arrow batch (mapInPandas) -- the ~100x-throughput route when JL is
    the hot path rather than a verifiable prep step.  Exact int64
    arithmetic in both paths, so this shares the Catalyst variant's
    oracle VERBATIM: the full value hash proves the two engines are
    value-identical (operators/similarity.py:_jl_project_gemm).'''
    emb = read_table(spark, sf_dir, "embeddings") \
        .where(F.col("embedding").isNotNull())
    return S.jl_project(emb, "embedding", ["vec_id"], out_dim=8,
                        engine="gemm")


#: phash(vec_id) < 0.5 * 2^60 — sampling.hash_sample's threshold form
_KC_SAMPLE_WHERE = ("(('0x' || substr(md5(vec_id::VARCHAR), 1, 15))"
                    f"::BIGINT) < {1 << 59}")


@query("kcenter_sampled_diversity", _kcenter_sql(k=6,
                                                 where=_KC_SAMPLE_WHERE))
def q_kcenter_sampled_diversity(spark, sf_dir):
    '''Greedy k-center over a DETERMINISTIC 50% hash-sample of the
    embedding table (kcenter_select(sample=0.5)) -- the
    coreset-of-a-sample construction that makes the K full scans
    affordable at corpus scale: each scan reads half the data, and the
    hash-sample is a pure function of the ids (partitioning- and
    engine-independent), so the selection replays exactly in SQL
    (operators/similarity.py:kcenter_select).'''
    e = read_table(spark, sf_dir, "embeddings")
    return S.kcenter_select(e, "embedding", "vec_id", k=6, sample=0.5)


_EN_MARKERS = "'the','and','of','to','a','in','is','it'"


@query("langid_auc_by_source", f"""
WITH t AS (
  SELECT doc_id, source, lang = 'en' AS y, {_TOKS} AS toks
  FROM documents),
s AS (
  SELECT source, y,
         CAST(floor((len(list_filter(toks,
                x -> x IN ({_EN_MARKERS}))) * 1000000)::DOUBLE
              / len(toks)::DOUBLE) AS BIGINT) AS su
  FROM t WHERE len(toks) > 0 AND y IS NOT NULL),
r AS (
  SELECT source, y,
         2 * rank() OVER (PARTITION BY source ORDER BY su)
           + (count(*) OVER (PARTITION BY source, su) - 1) AS rk2
  FROM s),
g AS (
  SELECT source, count(*)::BIGINT AS n,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS npos,
         sum(CASE WHEN y THEN rk2 END)::BIGINT AS s2
  FROM r GROUP BY 1)
SELECT source, npos AS n_pos, (n - npos)::BIGINT AS n_neg,
       round((s2::DOUBLE / 2.0 - (npos * (npos + 1))::DOUBLE / 2.0)
             / (npos * (n - npos))::DOUBLE, 6) AS auc
FROM g WHERE npos > 0 AND n - npos > 0
""")
def q_langid_auc_by_source(spark, sf_dir):
    '''Exact rank-based ROC-AUC of the English-marker-fraction score
    against the gold lang label, per source -- the generic scorer-
    evaluation harness (Mann-Whitney AUC with average-rank ties)
    applied to the language-ID signal.  The score is an exact
    integer-unit column (floor of marker-hits per million tokens), so
    ranks, sums, and the AUC ratio are bit-identical cross-engine
    (operators/classifier.py:rank_auc).'''
    from orange3_timeseries_spark.operators.classifier import rank_auc
    from orange3_timeseries_spark.operators.text import (
        LANG_MARKERS,
        tokens_expr,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    n = F.size(toks)
    su = F.floor((hits.cast("bigint") * 1000000).cast("double")
                 / n.cast("double")).cast("bigint")
    s = (d.where(n > 0)
         .select("source", su.alias("su"),
                 (F.col("lang") == "en").alias("y")))
    return rank_auc(s, "su", "y", ["source"])


@query("langid_calibration", f"""
WITH t AS (
  SELECT doc_id, lang = 'en' AS y, {_TOKS} AS toks
  FROM documents),
s AS (
  SELECT y,
         CAST(floor((len(list_filter(toks,
                x -> x IN ({_EN_MARKERS}))) * 1000000)::DOUBLE
              / len(toks)::DOUBLE) AS BIGINT) AS su
  FROM t WHERE len(toks) > 0 AND y IS NOT NULL),
b AS (
  SELECT least(floor(su::DOUBLE / 100000.0), 9)::INT AS bin, su,
         CASE WHEN y THEN 1 ELSE 0 END AS pos
  FROM s),
g AS (
  SELECT bin, count(*)::BIGINT AS n, sum(pos)::BIGINT AS npos,
         sum(su)::BIGINT AS sus
  FROM b GROUP BY 1)
SELECT bin, n AS n_rows,
       sus::DOUBLE / (n * 1000000)::DOUBLE AS mean_pred,
       npos::DOUBLE / n::DOUBLE AS obs_rate,
       npos::DOUBLE / n::DOUBLE
         - sus::DOUBLE / (n * 1000000)::DOUBLE AS gap
FROM g
""")
def q_langid_calibration(spark, sf_dir):
    '''Reliability diagram of the English-marker-fraction score: per
    score decile, mean predicted fraction vs observed P(lang=en) and
    the gap -- is the marker fraction usable as a probability before
    it gates a corpus split?  Bins cut on the integer units (never
    floor(float*10)); all ratios are single divisions of exact BIGINT
    sums (operators/classifier.py:calibration_bins).'''
    from orange3_timeseries_spark.operators.classifier import (
        calibration_bins,
    )
    from orange3_timeseries_spark.operators.text import (
        LANG_MARKERS,
        tokens_expr,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    n = F.size(toks)
    su = F.floor((hits.cast("bigint") * 1000000).cast("double")
                 / n.cast("double")).cast("bigint")
    s = (d.where(n > 0)
         .select(su.alias("su"), (F.col("lang") == "en").alias("y")))
    return calibration_bins(s, "su", "y")


@query("pipeline_source_dashboard", """
WITH t AS MATERIALIZED (
  SELECT doc_id, source, lang, n_chars::BIGINT AS n_chars,
         md5(text) AS digest,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
         text
  FROM documents),
r AS (
  SELECT source,
         len(toks) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1) AS s,
         list_sum(list_transform(toks,
             x -> greatest(len(regexp_extract_all(x, '[aeiouy]+', 0)),
                           1)))::BIGINT AS syl
  FROM t WHERE len(toks) > 0),
f AS (
  SELECT source,
         round(206.835 - 1.015 * (w::DOUBLE / s::DOUBLE)
                       - 84.6 * (syl::DOUBLE / w::DOUBLE), 6) AS fl
  FROM r),
fm AS (
  SELECT source,
         list_sort(list(fl))[CAST(floor((count(*) + 1) / 2) AS INT)]
           AS med_flesch
  FROM f GROUP BY 1),
agg AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS total_chars,
         sum(coalesce(len(toks), 0))::BIGINT AS total_tokens,
         count(DISTINCT digest)::BIGINT AS n_distinct_texts,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en
  FROM t GROUP BY 1),
gb AS (
  SELECT source, n_chars AS sz,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM t WHERE n_chars IS NOT NULL AND n_chars >= 0),
gini AS (
  SELECT source,
         CASE WHEN sum(sz) > 0
              THEN round(sum((2 * i - n - 1) * sz)::DOUBLE
                         / (max(n)::DOUBLE * sum(sz)::DOUBLE), 6)
         END AS gini
  FROM gb GROUP BY 1)
SELECT a.source, a.n_docs, a.total_chars,
       a.total_tokens::DOUBLE / a.n_docs::DOUBLE AS mean_tokens,
       round(1.0 - a.n_distinct_texts::DOUBLE / a.n_docs::DOUBLE, 6)
         AS exact_dup_rate,
       round(a.n_en::DOUBLE / a.n_docs::DOUBLE, 6) AS en_share,
       fm.med_flesch, g.gini
FROM agg a
JOIN fm ON a.source = fm.source
JOIN gini g ON a.source = g.source
""")
def q_pipeline_source_dashboard(spark, sf_dir):
    '''The r7d capstone: a per-source corpus-quality dashboard
    composing five operator families under ONE value hash -- document
    counts and byte/token mass, exact-duplicate rate (md5 digests),
    English share, the lower-median Flesch readability ELEMENT (an
    actual document's score -- never a mean of rounded floats, the
    divergence class COVERAGE.md documents), and the Gini byte-mass
    concentration.  The table a curation run reads FIRST: which
    sources are redundant, unreadable, non-English, or dominated by a
    single mega-document.  All ratios are single divisions of exact
    BIGINT counts; every fragment reuses an already-oracled operator
    (readability, gini_concentration, exact_dedup, language share).'''
    from orange3_timeseries_spark.operators.profile import (
        gini_concentration,
    )
    from orange3_timeseries_spark.operators.text import (
        readability,
        tokens_expr,
    )
    from orange3_timeseries_spark.operators.trend import _lower_median

    d = read_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    doc = d.select(
        "doc_id", "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("digest"),
        F.greatest(F.size(toks), F.lit(0)).cast("bigint")
        .alias("n_toks"),
        (F.col("lang") == "en").cast("int").alias("is_en"))
    fl = readability(d, "text", "doc_id") \
        .join(d.select("doc_id", "source"), "doc_id")
    fm = fl.groupBy("source").agg(
        _lower_median(F.sort_array(F.collect_list("flesch")))
        .alias("med_flesch"))
    agg = doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_toks").alias("__toks__"),
        F.countDistinct("digest").cast("bigint").alias("__nd__"),
        F.sum("is_en").cast("bigint").alias("__en__"))
    gini = gini_concentration(doc, "n_chars", ["source"],
                              min_n=1).select("source", "gini")
    out = (agg.join(fm, "source").join(gini, "source"))
    return out.select(
        "source", "n_docs", "total_chars",
        (F.col("__toks__").cast("double")
         / F.col("n_docs").cast("double")).alias("mean_tokens"),
        F.round(F.lit(1.0) - F.col("__nd__").cast("double")
                / F.col("n_docs").cast("double"), 6)
        .alias("exact_dup_rate"),
        F.round(F.col("__en__").cast("double")
                / F.col("n_docs").cast("double"), 6).alias("en_share"),
        "med_flesch", "gini")


@query("langid_confusion", f"""
SELECT labeled_lang AS gold, pred_lang AS pred, count(*)::BIGINT AS n
FROM ({_lang_sql().strip()})
GROUP BY 1, 2
""")
def q_langid_confusion(spark, sf_dir):
    '''Confusion matrix of the stopword-marker language-ID heuristic
    against the gold lang label -- the standard multiclass evaluation
    view (which languages leak into which predictions, where 'und'
    swallows real text).  Pure count aggregation over the already-
    oracled scorer projection.'''
    d = read_table(spark, sf_dir, "documents")
    s = d.select(F.col("lang").alias("gold"),
                 T.language_id_expr(F.col("text")).alias("pred"))
    return s.groupBy("gold", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))


@query("langid_class_metrics", f"""
WITH s AS ({_lang_sql().strip()}),
g AS (SELECT labeled_lang AS cls, count(*)::BIGINT AS n_gold
      FROM s GROUP BY 1),
p AS (SELECT pred_lang AS cls, count(*)::BIGINT AS n_pred
      FROM s GROUP BY 1),
t AS (SELECT labeled_lang AS cls, count(*)::BIGINT AS tp
      FROM s WHERE labeled_lang = pred_lang GROUP BY 1)
SELECT g.cls, g.n_gold,
       coalesce(p.n_pred, 0)::BIGINT AS n_pred,
       coalesce(t.tp, 0)::BIGINT AS tp,
       CASE WHEN coalesce(p.n_pred, 0) > 0
            THEN round(coalesce(t.tp, 0)::DOUBLE / p.n_pred::DOUBLE, 6)
       END AS precision,
       round(coalesce(t.tp, 0)::DOUBLE / g.n_gold::DOUBLE, 6) AS recall,
       round(2.0 * coalesce(t.tp, 0)::DOUBLE
             / (g.n_gold + coalesce(p.n_pred, 0))::DOUBLE, 6) AS f1
FROM g LEFT JOIN p ON g.cls = p.cls LEFT JOIN t ON g.cls = t.cls
""")
def q_langid_class_metrics(spark, sf_dir):
    '''Per-class precision / recall / F1 of the language-ID heuristic
    (gold classes as rows).  F1 uses the single-division identity
    ``2·tp/(n_gold + n_pred)`` -- one ratio of exact BIGINTs, never a
    compound of two rounded ratios.'''
    d = read_table(spark, sf_dir, "documents")
    # ONE scan of the expensive scorer expression: the (gold, pred)
    # confusion rollup, then three cheap class-dimension rollups on it
    conf = (d.select(F.col("lang").alias("gold"),
                     T.language_id_expr(F.col("text")).alias("pred"))
            .groupBy("gold", "pred")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .localCheckpoint(eager=True))
    g = conf.groupBy(F.col("gold").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("n_gold"))
    p = conf.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("n_pred"))
    t = (conf.where(F.col("gold") == F.col("pred"))
         .groupBy(F.col("gold").alias("cls"))
         .agg(F.sum("n").cast("bigint").alias("tp")))
    j = (g.join(p, "cls", "left").join(t, "cls", "left")
         .select("cls", "n_gold",
                 F.coalesce("n_pred", F.lit(0)).cast("bigint")
                 .alias("n_pred"),
                 F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp")))
    prec = F.when(F.col("n_pred") > 0,
                  F.round(F.col("tp").cast("double")
                          / F.col("n_pred").cast("double"), 6))
    rec = F.round(F.col("tp").cast("double")
                  / F.col("n_gold").cast("double"), 6)
    f1 = F.round(F.lit(2.0) * F.col("tp").cast("double")
                 / (F.col("n_gold") + F.col("n_pred")).cast("double"), 6)
    return j.select("cls", "n_gold", "n_pred", "tp",
                    prec.alias("precision"), rec.alias("recall"),
                    f1.alias("f1"))


@query("top_share_by_source", """
WITH r AS (
  SELECT source, n_chars::BIGINT AS sz,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0)
SELECT source, max(n)::BIGINT AS n_docs,
       ((max(n) + 9) // 10)::BIGINT AS top_k,
       sum(CASE WHEN i <= (n + 9) // 10 THEN sz ELSE 0 END)::BIGINT
         AS top_mass,
       sum(sz)::BIGINT AS total_mass,
       CASE WHEN sum(sz) > 0
            THEN round(sum(CASE WHEN i <= (n + 9) // 10 THEN sz
                           ELSE 0 END)::DOUBLE / sum(sz)::DOUBLE, 6)
       END AS top_decile_share
FROM r GROUP BY 1
""")
def q_top_share_by_source(spark, sf_dir):
    '''Lorenz top-decile mass share per source: what fraction of the
    byte mass sits in the largest 10% of documents -- the pointwise
    companion to gini_by_source a mixing stage reads to spot
    mega-document domination.  Integer rank cut (ceil(n/10) largest by
    size with doc_id tiebreak), exact BIGINT mass sums, one
    division.'''
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    sz = F.col("n_chars").cast("bigint")
    b = (d.where(sz.isNotNull() & (sz >= 0))
         .select("source", "doc_id", sz.alias("sz")))
    w = Window.partitionBy("source").orderBy(F.col("sz").desc(),
                                             "doc_id")
    cw = Window.partitionBy("source")
    b = (b.withColumn("__i__", F.row_number().over(w).cast("bigint"))
         .withColumn("__n__", F.count(F.lit(1)).over(cw).cast("bigint")))
    k = F.floor((F.col("__n__") + 9) / 10).cast("bigint")
    b = b.withColumn("__k__", k)
    g = b.groupBy("source").agg(
        F.max("__n__").alias("n_docs"),
        F.max("__k__").alias("top_k"),
        F.sum(F.when(F.col("__i__") <= F.col("__k__"), F.col("sz"))
              .otherwise(F.lit(0))).alias("top_mass"),
        F.sum("sz").alias("total_mass"))
    return g.select(
        "source", "n_docs", "top_k", "top_mass", "total_mass",
        F.when(F.col("total_mass") > 0,
               F.round(F.col("top_mass").cast("double")
                       / F.col("total_mass").cast("double"), 6))
        .alias("top_decile_share"))


@query("paragraph_dedup_corpus", """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*', 0) AS l
  FROM documents),
e AS (
  SELECT doc_id, i - 1 AS pos, l[i] AS seg
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) u),
b AS (
  SELECT doc_id, pos, seg, lower(trim(seg)) AS k
  FROM e WHERE length(trim(seg)) > 0),
m AS (
  SELECT doc_id, pos, seg, k,
         CASE WHEN length(k) < 20 THEN TRUE
              ELSE row_number() OVER (PARTITION BY k
                                      ORDER BY doc_id, pos) = 1
         END AS keep
  FROM b)
SELECT doc_id, count(*)::BIGINT AS n_segments,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE
             / count(*)::DOUBLE, 6) AS kept_ratio,
       string_agg(CASE WHEN keep THEN trim(seg) END, ' '
                  ORDER BY pos) AS kept_text
FROM m GROUP BY 1
""")
def q_paragraph_dedup_corpus(spark, sf_dir):
    '''CCNet-style segment-level exact dedup (the RefinedWeb first
    pass): each distinct normalized sentence-segment survives only at
    its corpus-wide first occurrence (min doc, then min position);
    short segments pass through.  Emits per-doc survival stats AND the
    rebuilt text, all value-hashed — the sub-document dedup modality
    doc-level exact/minhash passes cannot express
    (operators/dedup.py:paragraph_dedup).'''
    d = read_table(spark, sf_dir, "documents")
    return D.paragraph_dedup(d, "text", "doc_id")


# ---------------------------------------------------------------- BM25 tier
# The shared BM25 scoring chain (ONE definition of the idf/weight float
# association — every BM25-backed oracle formats this, so a scoring
# change cannot silently fork between the retrieval tier and the hybrid
# fusion oracle).  Placeholders: {t} corpus token expr, {q} query token
# expr, {qwhere} extra query-set filter ('' for the whole src0 slice).
_BM25_CORE = """d AS (SELECT doc_id, {t} AS toks FROM documents
       WHERE source <> 'src0'),
q AS (SELECT doc_id AS query_id, unnest(list_distinct({q})) AS __tok__
      FROM documents WHERE source = 'src0'{qwhere}),
post AS (SELECT doc_id, len(toks)::INT AS dl, unnest(toks) AS __tok__ FROM d),
tf AS (SELECT doc_id, __tok__, dl, count(*)::BIGINT AS tf
       FROM post GROUP BY 1, 2, 3),
qtok AS (SELECT DISTINCT __tok__ FROM q),
hit AS (SELECT t.*, count(*) OVER (PARTITION BY __tok__)::BIGINT AS df
        FROM tf t JOIN qtok USING (__tok__)),
stats AS (SELECT count(*)::BIGINT AS n, sum(len(toks))::BIGINT AS sdl FROM d),
terms AS (
  SELECT q.query_id, h.doc_id,
         CAST(round(
           ln(((s.n - h.df)::DOUBLE + 0.5) / (h.df::DOUBLE + 0.5) + 1.0)
           * ((h.tf::DOUBLE * 2.2)
              / (h.tf::DOUBLE
                 + 1.2 * (0.25 + 0.75 * (h.dl::DOUBLE
                                         / (s.sdl::DOUBLE / s.n::DOUBLE)))))
           * 1e6) AS BIGINT) AS units
  FROM hit h CROSS JOIN stats s JOIN q ON q.__tok__ = h.__tok__),
per_doc AS (SELECT query_id, doc_id, sum(units)::BIGINT AS units,
                   count(*)::BIGINT AS n_terms
            FROM terms GROUP BY 1, 2)"""

_BM25_SQL = ("WITH " + _BM25_CORE + """,
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY units DESC, doc_id) AS rk
           FROM per_doc)
SELECT query_id, doc_id, CAST(rk AS INT) AS rank,
       units::DOUBLE / 1e6 AS score, n_terms
FROM ranked WHERE rk <= {k}
""")


@query("bm25_topk_queries", _BM25_SQL.format(
    t=_TOKS, q=f"list_slice({_TOKS}, 1, 6)", k=5, qwhere=""))
def q_bm25_topk_queries(spark, sf_dir):
    """BM25 top-5 retrieval: 6-token keyword queries drawn from the
    'src0' slice rank the rest of the corpus (the retrieval primitive
    behind decontamination-by-retrieval / quality-slicing).  Inverted
    index = postings DataFrame; query tokens broadcast-pruned into the
    postings BEFORE df/idf; per-term scores rounded once to integer
    micro-units and summed exactly, so the (units DESC, doc_id ASC)
    ranking is an integer compare no engine can reassociate
    (operators/retrieval.py)."""
    from orange3_timeseries_spark.operators.retrieval import bm25_topk

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(T.tokens_expr(F.col("text")), 1, 6),
                               " ").alias("text")))
    return bm25_topk(d.where(F.col("source") != "src0"), qs, top_k=5)


@query("bm25_decontam_retrieval", _BM25_SQL.format(
    t=_TOKS, q=_TOKS, k=3, qwhere=""))
def q_bm25_decontam_retrieval(spark, sf_dir):
    """Decontamination-by-retrieval: every full 'src0' document (the
    stand-in eval benchmark) retrieves its top-3 BM25 neighbors from
    the training corpus — the ranked complement to the exact 13-gram
    gate (`text_decontaminate`), catching paraphrase-level overlap that
    exact n-grams miss.  Same operator, full-text queries."""
    from orange3_timeseries_spark.operators.retrieval import bm25_topk

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"), "text"))
    return bm25_topk(d.where(F.col("source") != "src0"), qs, top_k=3)


@query("rrf_hybrid_retrieval", "WITH qids AS (\n"
       """  SELECT d.doc_id FROM documents d JOIN embeddings e
    ON e.vec_id = d.doc_id
  WHERE d.source = 'src0' AND d.doc_id < 500),\n"""
       + _BM25_CORE.format(
           t=_TOKS, q=_TOKS,
           qwhere="\n        AND doc_id IN (SELECT doc_id FROM qids)")
       + """,
bmr AS (SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY units DESC, doc_id) AS ra
        FROM per_doc QUALIFY ra <= 20),
c AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v
      FROM embeddings e JOIN documents d2
        ON d2.doc_id = e.vec_id AND d2.source <> 'src0'),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id IN (SELECT doc_id FROM qids)),
emr AS (SELECT query_id, nn_id, rb FROM (
  SELECT qv.query_id, c.vec_id AS nn_id,
         row_number() OVER (PARTITION BY qv.query_id
                            ORDER BY round(list_cosine_similarity(c.v,
                                                                  qv.qv), 6)
                                     DESC, c.vec_id) AS rb
  FROM c, qv WHERE c.vec_id != qv.query_id) t WHERE rb <= 20),
f AS (SELECT coalesce(b.query_id, e2.query_id) AS query_id,
             coalesce(b.doc_id, e2.nn_id) AS doc_id,
             CAST(b.ra AS INT) AS rank_1, CAST(e2.rb AS INT) AS rank_2,
             coalesce(1.0 / (60.0 + b.ra), 0.0)
               + coalesce(1.0 / (60.0 + e2.rb), 0.0) AS score
      FROM bmr b FULL JOIN emr e2
        ON e2.query_id = b.query_id AND e2.nn_id = b.doc_id)
SELECT query_id, doc_id, rank_1, rank_2, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT)
           AS rrf_rank
FROM f
QUALIFY rrf_rank <= 5
""")
def q_rrf_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion: every embedded
    'src0' document (doc_id < 500) queries the training corpus through
    BOTH rankers — BM25 over full text (top-20) and exact cosine over
    embeddings (top-20) — and RRF (k=60) fuses the two rank lists into
    a final top-5 (operators/retrieval.py:rrf_fuse).  Rank fusion is
    the calibration-free hybrid combiner; the fused score is a fixed
    two-term sum of exact reciprocals of INTEGER ranks, bit-identical
    cross-engine, shipped unrounded."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_topk, rrf_fuse,
    )

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    qd = (d.where((F.col("source") == "src0") & (F.col("doc_id") < 500))
          .join(e.select(F.col("vec_id").alias("doc_id")), "doc_id"))
    corpus = d.where(F.col("source") != "src0")
    bm = bm25_topk(corpus,
                   qd.select(F.col("doc_id").alias("query_id"), "text"),
                   top_k=20).select("query_id", "doc_id", "rank")
    ec = e.join(corpus.select(F.col("doc_id").alias("vec_id")), "vec_id")
    eq = (e.join(qd.select(F.col("doc_id").alias("vec_id")), "vec_id")
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    ann = S.brute_force_topk(ec, eq, k=20).select(
        "query_id", F.col("nn_id").alias("doc_id"), "rank")
    return rrf_fuse([bm, ann], k=60, top_k=5)


@query("retrieval_eval_bm25_vs_ann", "WITH qids AS (\n"
       """  SELECT d.doc_id FROM documents d JOIN embeddings e
    ON e.vec_id = d.doc_id
  WHERE d.source = 'src0' AND d.doc_id < 500),\n"""
       + _BM25_CORE.format(
           t=_TOKS, q=_TOKS,
           qwhere="\n        AND doc_id IN (SELECT doc_id FROM qids)")
       + """,
bmr AS (SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY units DESC, doc_id) AS rk
        FROM per_doc QUALIFY rk <= 10),
c AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v
      FROM embeddings e JOIN documents d2
        ON d2.doc_id = e.vec_id AND d2.source <> 'src0'),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id IN (SELECT doc_id FROM qids)),
qr AS (SELECT query_id, nn_id FROM (
  SELECT qv.query_id, c.vec_id AS nn_id,
         row_number() OVER (PARTITION BY qv.query_id
                            ORDER BY round(list_cosine_similarity(c.v,
                                                                  qv.qv), 6)
                                     DESC, c.vec_id) AS rb
  FROM c, qv WHERE c.vec_id != qv.query_id) t WHERE rb <= 5),
nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM qr GROUP BY 1),
hits AS (SELECT b.query_id, b.rk FROM bmr b
         JOIN qr ON qr.query_id = b.query_id AND qr.nn_id = b.doc_id),
agg AS (SELECT query_id, count(*)::BIGINT AS n_hits,
               sum(CAST(round(1000000.0 / log2(rk + 1)) AS BIGINT))::BIGINT
                   AS dcg,
               min(rk) AS minrk
        FROM hits GROUP BY 1)
SELECT n.query_id, n.n_rel,
       coalesce(a.n_hits, 0)::BIGINT AS n_hits,
       coalesce(a.n_hits, 0)::DOUBLE / n.n_rel::DOUBLE AS recall_at_k,
       coalesce(1.0 / a.minrk, 0.0) AS mrr,
       coalesce(a.dcg, 0)::DOUBLE /
       list_sum(list_transform(range(1, least(n.n_rel, 10) + 1),
                i -> CAST(round(1000000.0 / log2(i + 1)) AS BIGINT)))::DOUBLE
           AS ndcg_at_k
FROM nrel n LEFT JOIN agg a USING (query_id)
""")
def q_retrieval_eval_bm25_vs_ann(spark, sf_dir):
    """Retrieval-quality evaluation (recall@10 / MRR / binary nDCG@10,
    operators/retrieval.py:retrieval_eval): every embedded 'src0'
    document queries the training corpus through BM25 (top-10), judged
    against its exact-cosine top-5 semantic neighbors as the binary
    relevance set — the lexical-vs-semantic agreement audit a hybrid
    retrieval stack (``rrf_hybrid_retrieval``) reads before trusting
    either ranker alone.  Per-rank DCG gains are quantized ONCE to
    integer micro-units and summed exactly (order-free); recall / MRR
    / nDCG are single exact divisions emitted unrounded.  Every judged
    query gets a row — zero-hit queries score 0, never drop."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_topk,
        retrieval_eval,
    )

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    qd = (d.where((F.col("source") == "src0") & (F.col("doc_id") < 500))
          .join(e.select(F.col("vec_id").alias("doc_id")), "doc_id"))
    corpus = d.where(F.col("source") != "src0")
    bm = bm25_topk(corpus,
                   qd.select(F.col("doc_id").alias("query_id"), "text"),
                   top_k=10)
    ec = e.join(corpus.select(F.col("doc_id").alias("vec_id")), "vec_id")
    eq = (e.join(qd.select(F.col("doc_id").alias("vec_id")), "vec_id")
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    qr = S.brute_force_topk(ec, eq, k=5).select(
        "query_id", F.col("nn_id").alias("doc_id"))
    return retrieval_eval(bm, qr, k=10)


# ------------------------------------------------------- coverage audit
@query("coverage_audit_embeddings", """
WITH l AS (SELECT doc_id AS k, count(*) AS n FROM documents
           WHERE doc_id IS NOT NULL GROUP BY 1),
r AS (SELECT vec_id AS k, count(*) AS n FROM embeddings
      WHERE vec_id IS NOT NULL GROUP BY 1),
j AS (SELECT l.n AS nl, r.n AS nr
      FROM l FULL OUTER JOIN r ON l.k = r.k),
a AS (SELECT
        coalesce(sum(nl), 0)::BIGINT AS lr,
        count(CASE WHEN nl IS NOT NULL THEN 1 END)::BIGINT AS lk,
        coalesce(sum(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                          THEN nl END), 0)::BIGINT AS lmr,
        count(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                   THEN 1 END)::BIGINT AS lmk,
        coalesce(sum(nr), 0)::BIGINT AS rr,
        count(CASE WHEN nr IS NOT NULL THEN 1 END)::BIGINT AS rk,
        coalesce(sum(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                          THEN nr END), 0)::BIGINT AS rmr,
        count(CASE WHEN nl IS NOT NULL AND nr IS NOT NULL
                   THEN 1 END)::BIGINT AS rmk,
        (SELECT count(*) FROM documents
         WHERE doc_id IS NULL)::BIGINT AS lnull,
        (SELECT count(*) FROM embeddings
         WHERE vec_id IS NULL)::BIGINT AS rnull
      FROM j)
SELECT 'documents' AS side, lr + lnull AS n_rows,
       lnull AS null_key_rows, lk AS n_keys,
       lmr AS matched_rows, lmk AS matched_keys,
       CASE WHEN lr + lnull > 0
            THEN lmr::DOUBLE / (lr + lnull) END AS row_share,
       CASE WHEN lk > 0 THEN lmk::DOUBLE / lk END AS key_share
FROM a
UNION ALL
SELECT 'embeddings', rr + rnull, rnull, rk, rmr, rmk,
       CASE WHEN rr + rnull > 0
            THEN rmr::DOUBLE / (rr + rnull) END,
       CASE WHEN rk > 0 THEN rmk::DOUBLE / rk END
FROM a
""")
def q_coverage_audit_embeddings(spark, sf_dir):
    '''Join-coverage audit of documents vs embeddings on
    doc_id = vec_id (operators/audit.py:coverage_audit) — the reusable
    form of the round-9 silent-drop bug class: sf0.1 embeddings cover
    only 2000/5000 documents, so any docs⋈embeddings inner join
    (pipeline_curate_semantic, pipeline_embedding_index,
    rrf_hybrid_retrieval query gating) silently discards 60% of the
    corpus unless the pipeline anti-joins the verified drops.  The two
    output rows report exactly the shares those pipelines must assert;
    shares are single exact-integer divisions, emitted unrounded.'''
    from orange3_timeseries_spark.operators.audit import coverage_audit

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    return coverage_audit(d, e, "doc_id", "vec_id",
                          labels=("documents", "embeddings"))


@query("bm25_registry_topk", _BM25_SQL.format(
    t=_TOKS, q=f"list_slice({_TOKS}, 1, 6)", k=5, qwhere=""))
def q_bm25_registry_topk(spark, sf_dir):
    """The PERSISTED-INDEX serve path under the SAME full replay oracle
    as ``bm25_topk_queries``: build the full-corpus inverted index once
    (postings + per-token df + (N, Σdl) stats as bucket-partitioned
    parquet state tables), WRITE it, READ IT BACK, and serve the very
    same 6-token queries from the loaded index — no corpus rescan, no
    tf re-aggregation, parquet partitions pruned to the query tokens'
    buckets.  Hash-green here proves the persisted state is sufficient
    and the serve-time scoring is bit-faithful to the live path (both
    route through the shared `_bm25_score_topk` kernel;
    operators/retrieval.py).  The retrieval analogue of
    ``arima_registry_forecast_by_user``."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk_from_index,
        read_bm25_index,
        write_bm25_index,
    )
    from orange3_timeseries_spark.operators.text import tokens_expr

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6),
                               " ").alias("text")))
    idx = bm25_build_index(d.where(F.col("source") != "src0"))
    path = _fresh_state_path("bm25", sf_dir)
    write_bm25_index(idx, path)
    return bm25_topk_from_index(read_bm25_index(spark, path), qs,
                                top_k=5)


@query("bm25_incremental_topk", _BM25_SQL.format(
    t=_TOKS, q=f"list_slice({_TOKS}, 1, 6)", k=5, qwhere=""))
def q_bm25_incremental_topk(spark, sf_dir):
    """Index MAINTENANCE under the same full replay oracle: build the
    inverted index over half the training corpus (even doc_id), MERGE
    the other half in as an incremental ingest (delta-only tf
    aggregation + BIGINT df/stats addition — no rebuild), persist the
    merged index, read it back, and serve.  Hash-equal to the live
    full-corpus query proves merged state == rebuilt state exactly
    (operators/retrieval.py:bm25_merge_index) — the daily-crawl-drop
    ingest path at 100 TB."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_build_index,
        bm25_merge_index,
        bm25_topk_from_index,
        read_bm25_index,
        write_bm25_index,
    )
    from orange3_timeseries_spark.operators.text import tokens_expr

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6),
                               " ").alias("text")))
    corpus = d.where(F.col("source") != "src0")
    base = bm25_build_index(corpus.where(F.col("doc_id") % 2 == 0))
    merged = bm25_merge_index(base,
                              corpus.where(F.col("doc_id") % 2 != 0))
    path = _fresh_state_path("bm25_inc", sf_dir)
    write_bm25_index(merged, path)
    return bm25_topk_from_index(read_bm25_index(spark, path), qs,
                                top_k=5)


from orange3_timeseries_spark.queries import ORACLE_SQL as _OS_R10  # noqa: E402


def _ann_seed_centroids(e):
    """The deterministic ANN model seed every registry/incremental
    query shares with its live sibling: the first 16 corpus embeddings
    (a bounded 16-row collect) as coarse centroids."""
    rows = (e.where(F.col("vec_id") < 16).orderBy("vec_id")
            .select("embedding").collect())
    return [[float(x) for x in r.embedding] for r in rows]


def _ann_seed_books(e, M=8, ds=8):
    """PQ codebooks as subvector slices of the SAME seed rows the IVF
    centroids use (one recipe, sliced) — ``ann_pq_topk``'s oracle
    replays exactly this."""
    rows = _ann_seed_centroids(e)
    return [[r[m * ds:(m + 1) * ds] for r in rows] for m in range(M)]


def _ann_seed_queries(e):
    return (e.where(F.col("vec_id") < 10)
            .select(F.col("vec_id").alias("query_id"), "embedding"))


def _fresh_state_path(prefix, sf_dir):
    """Index state path keyed by (pid, sf), CLEARED before use: the
    versioned store (operators/index_store.py) allocates a fresh
    ``v=<n>`` per write instead of overwriting, so without the clear a
    re-run in a long-lived process would accumulate one full index
    generation per run.  The rmtree keeps the old invariants: re-runs
    start empty (no /tmp growth per process) and a held lazy DataFrame
    from another SF keeps reading ITS index (different tag, untouched)
    — exactly the semantics the pre-versioning overwrite provided."""
    import os
    import shutil
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_{prefix}_{os.getpid()}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    return path


@query("ann_ivf_registry_topk", _OS_R10["ann_ivf_served_topk"])
def q_ann_ivf_registry_topk(spark, sf_dir):
    """The IVF PERSISTED-INDEX path under the SAME full value-hash
    oracle as ``ann_ivf_served_topk``: inject the deterministic
    centroids, assign the whole corpus ONCE into inverted lists, WRITE
    the (centroids, lists) state tables as centroid-partitioned
    parquet, READ THEM BACK, and serve the probes from the loaded
    lists — no corpus rescan, no re-assignment, the lists scan pruned
    to the probed cells.  Hash-green proves the persisted assignment +
    centroid state is sufficient and serve-time scoring is
    bit-faithful to the live path (operators/similarity.py:
    _ivf_probe_score_topk shared kernel) — the ANN sibling of
    ``bm25_registry_topk``."""
    e = read_table(spark, sf_dir, "embeddings")
    idx = S.ivf_build_index(e, centroids=_ann_seed_centroids(e))
    path = _fresh_state_path("ivf", sf_dir)
    S.write_ivf_index(idx, path)
    return S.ivf_topk_from_index(S.read_ivf_index(spark, path),
                                 _ann_seed_queries(e), k=5, nprobe=4)


def _lsh_probe_sql(k=16, bands=4, threshold=0.2):
    """The ``_crosscorpus_sql`` replay with the registry split: index =
    doc_id % 10 <= 8 (built on <= 6, merged 7-8), probe batch =
    doc_id % 10 = 9.  Banding, signatures and the exact-Jaccard verify
    replay the identical portable-hash pipeline, so a hash match proves
    the persisted band entries collide on exactly the pairs a live
    cross-corpus run finds."""
    rpb = k // bands
    band_keys = ", ".join(
        _PH.format(e="(" + " || ',' || ".join(
            f"m{b * rpb + r}::VARCHAR" for r in range(rpb)) + ")")
        + f" AS bk{b}" for b in range(bands))
    return f"""{_minhash_sig_sql(k)},
bk AS (SELECT doc_id, {band_keys} FROM sig),
entries AS (
  SELECT doc_id, u.band, u.key FROM bk,
  LATERAL (SELECT * FROM (VALUES {", ".join(f"({b}, bk{b})" for b in range(bands))})
           AS v(band, key)) u),
cand AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_index
  FROM entries a JOIN entries b
    ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <= 8)
SELECT id_new, id_index,
       round(len(list_intersect(x.s, y.s))::DOUBLE
             / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0),
             6) AS jaccard
FROM cand
JOIN sh x ON x.doc_id = id_new
JOIN sh y ON y.doc_id = id_index
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / nullif(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 0)
      >= {threshold}
"""


@query("dedup_lsh_registry_probe", _lsh_probe_sql())
def q_dedup_lsh_registry_probe(spark, sf_dir):
    """The DEDUP-AT-INGEST serve path under a full replay oracle:
    build the MinHash-LSH band index over 70% of the corpus
    (doc_id % 10 <= 6), MERGE two more deciles in as incremental
    ingests (band entries are per-doc independent, so merged state ==
    rebuilt state row-for-row), WRITE the (entries, docs, params)
    state tables as bucket-partitioned parquet, READ THEM BACK, and
    probe the final decile against the loaded index — no corpus
    re-signature, the entries scan pruned to the probe's band-key
    buckets, exact-Jaccard verification only on colliding candidates
    (operators/dedup.py:lsh_probe_index).  Hash-green proves the
    persisted band entries + indexed text are sufficient state and the
    probe collides on exactly the pairs the live
    ``minhash_lsh_pairs_between`` run finds — the dedup sibling of
    ``bm25_registry_topk`` / ``ann_ivf_registry_topk``."""
    d = read_table(spark, sf_dir, "documents")
    dec = F.col("doc_id") % 10
    idx = D.lsh_build_index(d.where(dec <= 6))
    idx = D.lsh_merge_index(idx, d.where(dec == 7))
    idx = D.lsh_merge_index(idx, d.where(dec == 8))
    path = _fresh_state_path("lsh", sf_dir)
    D.write_lsh_index(idx, path)
    out = D.lsh_probe_index(D.read_lsh_index(spark, path),
                            d.where(dec == 9), threshold=0.2)
    return out.select("id_new", "id_index", r6(F.col("jaccard"),
                                               "jaccard"))


@query("ann_pq_registry_topk", _OS_R10["ann_pq_topk"])
def q_ann_pq_registry_topk(spark, sf_dir):
    """The PQ PERSISTED-INDEX path under the SAME full value-hash
    oracle as ``ann_pq_topk``: inject the deterministic codebooks,
    encode the whole corpus ONCE (the Arrow-batched mapInPandas pass),
    WRITE the (codes, codebooks) state tables, READ THEM BACK, and
    serve the ADC top-5 from the loaded codes — no corpus rescan, no
    re-encode, the serve scan reads 8 ints per vector instead of 64
    floats.  Hash-green proves the persisted codes + codebooks are
    sufficient state and serve-time ADC is bit-faithful to the live
    path (operators/similarity.py:_pq_adc_topk shared kernel) —
    completing the ANN serving matrix alongside
    ``ann_ivf_registry_topk``."""
    e = read_table(spark, sf_dir, "embeddings")
    idx = S.pq_build_index(e, codebooks=_ann_seed_books(e))
    path = _fresh_state_path("pq", sf_dir)
    S.write_pq_index(idx, path)
    return S.pq_topk_from_index(S.read_pq_index(spark, path),
                                _ann_seed_queries(e), k=5)


@query("ann_ivf_incremental_topk", _OS_R10["ann_ivf_served_topk"])
def q_ann_ivf_incremental_topk(spark, sf_dir):
    """IVF index MAINTENANCE under the same full value-hash oracle:
    build the inverted lists over half the corpus (even vec_id), MERGE
    the other half in as an incremental ingest (assignment depends
    only on the frozen centroids, so the merge is one delta assignment
    pass + append — operators/similarity.py:ivf_merge_index), persist,
    read back, and serve.  Hash-equal to the live one-shot query
    proves merged state == rebuilt state exactly — the
    vector-ingest sibling of ``bm25_incremental_topk``."""
    e = read_table(spark, sf_dir, "embeddings")
    base = S.ivf_build_index(e.where(F.col("vec_id") % 2 == 0),
                             centroids=_ann_seed_centroids(e))
    merged = S.ivf_merge_index(base, e.where(F.col("vec_id") % 2 != 0))
    path = _fresh_state_path("ivf_inc", sf_dir)
    S.write_ivf_index(merged, path)
    return S.ivf_topk_from_index(S.read_ivf_index(spark, path),
                                 _ann_seed_queries(e), k=5, nprobe=4)


@query("ann_pq_incremental_topk", _OS_R10["ann_pq_topk"])
def q_ann_pq_incremental_topk(spark, sf_dir):
    """PQ index MAINTENANCE under the same full value-hash oracle:
    encode half the corpus (even vec_id), MERGE the other half in
    (codes depend only on the frozen codebooks — one delta encode pass
    + append; operators/similarity.py:pq_merge_index), persist, read
    back, and serve ADC top-5.  Hash-equal to the live one-shot query
    proves merged state == rebuilt state exactly."""
    e = read_table(spark, sf_dir, "embeddings")
    base = S.pq_build_index(e.where(F.col("vec_id") % 2 == 0),
                            codebooks=_ann_seed_books(e))
    merged = S.pq_merge_index(base, e.where(F.col("vec_id") % 2 != 0))
    path = _fresh_state_path("pq_inc", sf_dir)
    S.write_pq_index(merged, path)
    return S.pq_topk_from_index(S.read_pq_index(spark, path),
                                _ann_seed_queries(e), k=5)


# ------------------------------------------ versioned index lifecycles
@query("bm25_lifecycle_topk", _BM25_SQL.format(
    t=_TOKS, q=f"list_slice({_TOKS}, 1, 6)", k=5, qwhere=""))
def q_bm25_lifecycle_topk(spark, sf_dir):
    """The COMPLETE versioned-index lifecycle on ONE logical path,
    under the same full replay oracle as ``bm25_registry_topk``:
    build the index over a third of the training corpus and WRITE
    (generation v=1 + atomic ``_CURRENT`` pointer swap,
    operators/index_store.py); READ it back and MERGE the second third
    in, writing the merged state to the SAME logical path (v=2 — the
    read→merge→write cycle the pointer scheme exists to support:
    the merged write streams from v=1's parquet into v=2);
    fast-ingest APPEND the final third in place (delta-only IO,
    ``bm25_append_index``); COMPACT (v=3 — canonical single-generation
    state re-derived from postings, per-bucket file count reset); and
    serve the 6-token queries from the result.  Hash-equal to the
    live full-corpus query proves every lifecycle step is exact:
    merged == appended == compacted == rebuilt."""
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_append_index,
        bm25_build_index,
        bm25_merge_index,
        bm25_topk_from_index,
        compact_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )
    from orange3_timeseries_spark.operators.text import tokens_expr

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6),
                               " ").alias("text")))
    corpus = d.where(F.col("source") != "src0")
    third = F.col("doc_id") % 3
    path = _fresh_state_path("bm25_lc", sf_dir)
    write_bm25_index(bm25_build_index(corpus.where(third == 0)), path)
    merged = bm25_merge_index(read_bm25_index(spark, path),
                              corpus.where(third == 1))
    write_bm25_index(merged, path)              # same logical path: v=2
    bm25_append_index(spark, path, corpus.where(third == 2))
    compact_bm25_index(spark, path)             # v=3
    return bm25_topk_from_index(read_bm25_index(spark, path), qs,
                                top_k=5)


@query("ann_ivf_lifecycle_topk", _OS_R10["ann_ivf_served_topk"])
def q_ann_ivf_lifecycle_topk(spark, sf_dir):
    """The IVF versioned lifecycle on one logical path under the live
    query's full value-hash oracle: build over a third of the corpus →
    versioned WRITE (v=1) → READ + MERGE the second third → WRITE to
    the SAME path (v=2) → fast-ingest APPEND the final third
    (delta-only assignment under the persisted rule) → COMPACT (v=3) →
    serve.  Hash-equal to the live one-shot query proves
    merged == appended == compacted == rebuilt for the vector-ingest
    path."""
    e = read_table(spark, sf_dir, "embeddings")
    third = F.col("vec_id") % 3
    path = _fresh_state_path("ivf_lc", sf_dir)
    S.write_ivf_index(
        S.ivf_build_index(e.where(third == 0),
                          centroids=_ann_seed_centroids(e)), path)
    merged = S.ivf_merge_index(S.read_ivf_index(spark, path),
                               e.where(third == 1))
    S.write_ivf_index(merged, path)
    S.ivf_append_index(spark, path, e.where(third == 2))
    S.compact_ivf_index(spark, path)
    return S.ivf_topk_from_index(S.read_ivf_index(spark, path),
                                 _ann_seed_queries(e), k=5, nprobe=4)


@query("ann_pq_lifecycle_topk", _OS_R10["ann_pq_topk"])
def q_ann_pq_lifecycle_topk(spark, sf_dir):
    """The PQ versioned lifecycle on one logical path under the live
    query's full value-hash oracle: encode a third → versioned WRITE
    (v=1) → READ + MERGE the second third → WRITE to the SAME path
    (v=2) → fast-ingest APPEND the final third (delta-only encode
    against the persisted frozen codebooks) → COMPACT (v=3) → serve
    ADC top-5.  Hash-equal to the live query proves
    merged == appended == compacted == rebuilt."""
    e = read_table(spark, sf_dir, "embeddings")
    third = F.col("vec_id") % 3
    path = _fresh_state_path("pq_lc", sf_dir)
    S.write_pq_index(
        S.pq_build_index(e.where(third == 0),
                         codebooks=_ann_seed_books(e)), path)
    merged = S.pq_merge_index(S.read_pq_index(spark, path),
                              e.where(third == 1))
    S.write_pq_index(merged, path)
    S.pq_append_index(spark, path, e.where(third == 2))
    S.compact_pq_index(spark, path)
    return S.pq_topk_from_index(S.read_pq_index(spark, path),
                                _ann_seed_queries(e), k=5)


@query("dedup_lsh_lifecycle_probe", _lsh_probe_sql())
def q_dedup_lsh_lifecycle_probe(spark, sf_dir):
    """The LSH versioned lifecycle on one logical path under the same
    replay oracle as ``dedup_lsh_registry_probe`` (index = deciles
    0-8, probe = decile 9): build over deciles 0-5 → versioned WRITE
    (v=1) → READ + MERGE decile 6 → WRITE to the SAME path (v=2) →
    fast-ingest APPEND deciles 7 and 8 (two in-place delta ingests —
    the probe-then-append cadence of a dedup-at-ingest service) →
    COMPACT (v=3) → probe decile 9 from the loaded index.  Hash-equal
    to the registry query's oracle proves every lifecycle step
    preserves exactly the persisted band-entry + doc state a rebuild
    produces."""
    d = read_table(spark, sf_dir, "documents")
    dec = F.col("doc_id") % 10
    path = _fresh_state_path("lsh_lc", sf_dir)
    D.write_lsh_index(D.lsh_build_index(d.where(dec <= 5)), path)
    merged = D.lsh_merge_index(D.read_lsh_index(spark, path),
                               d.where(dec == 6))
    D.write_lsh_index(merged, path)
    D.lsh_append_index(spark, path, d.where(dec == 7))
    D.lsh_append_index(spark, path, d.where(dec == 8))
    D.compact_lsh_index(spark, path)
    out = D.lsh_probe_index(D.read_lsh_index(spark, path),
                            d.where(dec == 9), threshold=0.2)
    return out.select("id_new", "id_index", r6(F.col("jaccard"),
                                               "jaccard"))


@query("ann_ivf_drift_by_cell", """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS cv,
                list_inner_product(v, v) / 2.0 AS half_cc
         FROM c WHERE vec_id < 16),
assign AS (  -- frozen-rule assignment: argmax(x.c - |c|^2/2), tie -> cid
  SELECT vec_id, v, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_inner_product(v, cv) - half_cc
                                     DESC, centroid_id) AS rnk
  FROM c CROSS JOIN cent QUALIFY rnk = 1),
scored AS (
  SELECT a.vec_id, a.centroid_id,
         CAST(round(round(list_cosine_similarity(a.v, ct.cv), 6)
                    * 1000000.0) AS BIGINT) AS cu
  FROM assign a JOIN cent ct USING (centroid_id)),
b AS (SELECT centroid_id, count(*)::BIGINT AS n_index,
             sum(cu)::BIGINT AS cui
      FROM scored WHERE vec_id % 2 = 0 GROUP BY 1),
nw AS (SELECT centroid_id, count(*)::BIGINT AS n_new,
              sum(cu)::BIGINT AS cun
       FROM scored WHERE vec_id % 2 = 1 GROUP BY 1),
j AS (SELECT ct.centroid_id, b.n_index, b.cui, nw.n_new, nw.cun
      FROM cent ct LEFT JOIN b USING (centroid_id)
      LEFT JOIN nw USING (centroid_id))
SELECT centroid_id,
       coalesce(n_index, 0)::BIGINT AS n_index,
       coalesce(n_new, 0)::BIGINT AS n_new,
       coalesce(n_new, 0)::DOUBLE
         / (SELECT sum(coalesce(n_new, 0)) FROM j)::DOUBLE AS new_share,
       (cui::DOUBLE / n_index::DOUBLE) / 1000000.0 AS mean_cos_index,
       (cun::DOUBLE / n_new::DOUBLE) / 1000000.0 AS mean_cos_new,
       (cun::DOUBLE / n_new::DOUBLE) / 1000000.0
         - (cui::DOUBLE / n_index::DOUBLE) / 1000000.0 AS cos_drift
FROM j
""")
def q_ann_ivf_drift_by_cell(spark, sf_dir):
    """Centroid-drift monitor over the persisted IVF index
    (operators/similarity.py:ivf_drift_stats) — the retrain signal the
    frozen-centroid merge/append lifecycle needs: the index persists
    over half the corpus (even vec_id, the deterministic seed
    centroids), the other half arrives as the ingest batch, and each
    cell reports batch occupancy share plus mean
    vector→assigned-centroid cosine for the indexed vs arriving
    population (``cos_drift`` negative = the batch fits its cells
    worse — retrain when it crosses threshold; cells the batch
    abandons keep a NULL-mean row).  Per-vector cosines round once to
    6 dp and quantize to micro-units; per-cell sums are exact BIGINTs;
    the oracle replays the frozen assignment rule, the quantization
    AND the division trees exactly."""
    e = read_table(spark, sf_dir, "embeddings")
    idx = S.ivf_build_index(e.where(F.col("vec_id") % 2 == 0),
                            centroids=_ann_seed_centroids(e))
    path = _fresh_state_path("ivf_drift", sf_dir)
    S.write_ivf_index(idx, path)
    return S.ivf_drift_stats(S.read_ivf_index(spark, path),
                             e.where(F.col("vec_id") % 2 != 0))


@query("dedup_simhash_registry_probe", _SIMHASH48_SIG + """,
entries AS (
  SELECT doc_id, sig, u.band, u.key FROM sig,
  LATERAL (SELECT * FROM (VALUES (0, (sig >> 0) & 4095),
                                 (1, (sig >> 12) & 4095),
                                 (2, (sig >> 24) & 4095),
                                 (3, (sig >> 36) & 4095)) AS v(band, key)) u)
SELECT DISTINCT b.doc_id AS id_new, a.doc_id AS id_index,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM entries a JOIN entries b
  ON a.band = b.band AND a.key = b.key
WHERE b.doc_id % 10 = 9 AND a.doc_id % 10 <= 8
  AND bit_count(xor(a.sig, b.sig)) <= 3
""")
def q_dedup_simhash_registry_probe(spark, sf_dir):
    """The PERSISTED SimHash dedup index under a full replay oracle —
    the Hamming sibling of ``dedup_lsh_registry_probe``, closing the
    last registry gap (every near-dup family now has a persisted
    build→write→read→probe→merge→append→compact path).  Lifecycle:
    build 48-bit signatures over deciles 0-5, versioned WRITE, READ +
    MERGE decile 6, WRITE to the SAME path, APPEND deciles 7-8 in
    place, COMPACT, then probe decile 9 against the loaded index —
    delta-only signing, entries scan pruned to the probe's band-key
    buckets, inline ``bit_count`` Hamming verify on the carried
    signatures (no second state table: the signature IS the
    verification state, unlike LSH whose exact-Jaccard verify needs
    the indexed text).  The oracle replays signatures, banding,
    blocking AND verification over the same split
    (operators/dedup.py:SimHashIndex)."""
    d = read_table(spark, sf_dir, "documents")
    dec = F.col("doc_id") % 10
    path = _fresh_state_path("simhash_lc", sf_dir)
    D.write_simhash_index(D.simhash_build_index(d.where(dec <= 5)),
                          path)
    merged = D.simhash_merge_index(D.read_simhash_index(spark, path),
                                   d.where(dec == 6))
    D.write_simhash_index(merged, path)
    D.simhash_append_index(spark, path, d.where(dec == 7))
    D.simhash_append_index(spark, path, d.where(dec == 8))
    D.compact_simhash_index(spark, path)
    out = D.simhash_probe_index(D.read_simhash_index(spark, path),
                                d.where(dec == 9), max_distance=3)
    return out.select("id_new", "id_index",
                      F.col("hamming").cast("int").alias("hamming"))


@query("dsir_weights_by_doc", f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, coalesce(lang = 'en', false) AS is_target,
         {_LM_TOKS} AS ts
  FROM documents),
occ AS MATERIALIZED (
  SELECT doc_id, is_target,
         {_PH.format(e="(ts[i] || ' ' || ts[i + 1])")} % 4096 AS b
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1))
                      AS i) g),
counts AS (
  SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS ct,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END)::BIGINT AS cr
  FROM occ GROUP BY 1),
tot AS (SELECT sum(ct)::BIGINT AS nt, sum(cr)::BIGINT AS nr
        FROM counts),
w AS (SELECT b,
             round((ln((ct::DOUBLE + 0.5) / (nt::DOUBLE + 2048.0))
                    - ln((cr::DOUBLE + 0.5) / (nr::DOUBLE + 2048.0)))
                   * 1000000.0)::BIGINT AS wu
      FROM counts, tot),
sc AS (SELECT o.doc_id, count(*)::BIGINT AS n_bigrams,
              sum(w.wu)::BIGINT AS su
       FROM occ o JOIN w USING (b) GROUP BY 1)
SELECT t.doc_id, coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
       t.is_target,
       coalesce(s.su, 0)::DOUBLE / 1000000.0 AS logw,
       coalesce(s.su, 0)::DOUBLE
           / nullif(s.n_bigrams, 0)::DOUBLE / 1000000.0 AS avg_lr
FROM toks t LEFT JOIN sc s USING (doc_id)
""")
def q_dsir_weights_by_doc(spark, sf_dir):
    """DSIR importance weights over the corpus with English as the
    target domain (operators/sampling.py:dsir_weights; Xie et al.
    2023): each document's log importance weight under the
    hashed-bigram (4096 buckets, add-0.5) target-vs-raw contrast —
    the data-selection score that upweights in-domain-LIKE documents
    from the raw pool.  Per-bucket log-ratios quantize to BIGINT
    micro-units once; per-doc weights are integer sums (order-free),
    so the oracle replays them bit-for-bit."""
    from orange3_timeseries_spark.operators.sampling import (
        dsir_weights,
    )

    d = read_table(spark, sf_dir, "documents")
    return dsir_weights(d, "text", "doc_id", F.col("lang") == "en")


# ------------------------------------------ drift-driven IVF retrain
def _ivf_retrain_sql(n_flag=4, k=5, nprobe=4, n_queries=10,
                     sample=2048, iters=10,
                     new_pred="vec_id % 2 = 1",
                     lists_pred="TRUE",
                     flag_order="(cos_drift IS NULL), cos_drift, "
                                "centroid_id"):
    """Full replay of the drift→retrain→serve loop: frozen-rule
    assignment under the seed centroids, the per-cell drift report
    (same quantization as ``ann_ivf_drift_by_cell``), flagging the
    ``n_flag`` worst-drifting cells, an UNROLLED local Lloyd over only
    those cells' vectors (ordered sample, evenly spaced init,
    first-index tie-break, 6-dp rounding per round — the
    ``train_ivf_centroids(id_col=...)`` recipe, exactly as
    ``ann_ivf_topk``'s oracle replays global training), in-place
    centroid replacement by sorted flag order, local re-assignment of
    the flagged vectors, and the standard probe/serve replay over the
    UPDATED centroid table."""
    stages = [f"""c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS cv,
                list_inner_product(v, v) / 2.0 AS half_cc
         FROM c WHERE vec_id < 16),
assignf AS MATERIALIZED (
  SELECT vec_id, v, centroid_id FROM (
    SELECT c.vec_id, c.v, cent.centroid_id,
           row_number() OVER (PARTITION BY c.vec_id
              ORDER BY list_inner_product(c.v, cent.cv) - cent.half_cc
                       DESC, cent.centroid_id) AS rnk
    FROM c CROSS JOIN cent) t
  WHERE rnk = 1),
scored AS (
  SELECT a.vec_id, a.centroid_id,
         CAST(round(round(list_cosine_similarity(a.v, ct.cv), 6)
                    * 1000000.0) AS BIGINT) AS cu
  FROM assignf a JOIN cent ct USING (centroid_id)),
bb AS (SELECT centroid_id, count(*)::BIGINT AS n_index,
              sum(cu)::BIGINT AS cui
       FROM scored WHERE vec_id % 2 = 0 GROUP BY 1),
nw AS (SELECT centroid_id, count(*)::BIGINT AS n_new,
              sum(cu)::BIGINT AS cun
       FROM scored WHERE {new_pred} GROUP BY 1),
dr AS (SELECT ct.centroid_id,
              coalesce(n_index, 0)::BIGINT AS n_index,
              (cun::DOUBLE / n_new::DOUBLE) / 1000000.0
                - (cui::DOUBLE / n_index::DOUBLE) / 1000000.0 AS cos_drift
       FROM cent ct LEFT JOIN bb USING (centroid_id)
       LEFT JOIN nw USING (centroid_id)),
flagmap AS MATERIALIZED (
  SELECT centroid_id AS fcid,
         row_number() OVER (ORDER BY centroid_id) - 1 AS j
  FROM (SELECT centroid_id FROM dr
        ORDER BY {flag_order}
        LIMIT {n_flag})),
samp AS MATERIALIZED (
  SELECT v, rn FROM (
    SELECT a.v, row_number() OVER (ORDER BY a.vec_id) - 1 AS rn
    FROM assignf a JOIN flagmap f ON a.centroid_id = f.fcid
    WHERE {lists_pred}) t
  WHERE rn < {sample}),
nn AS (SELECT count(*) AS cnt FROM samp),
rcent0 AS MATERIALIZED (
  SELECT g.j, s.v AS cv
  FROM (SELECT unnest(generate_series(0, {n_flag - 1})) AS j) g
  CROSS JOIN nn
  JOIN samp s ON s.rn = (g.j * nn.cnt) // {n_flag})"""]
    for t in range(1, iters + 1):
        p = t - 1
        stages.append(f"""rassign{t} AS MATERIALIZED (
  SELECT s.rn, s.v, cc.j
  FROM samp s CROSS JOIN rcent{p} cc
  QUALIFY row_number() OVER (PARTITION BY s.rn
      ORDER BY list_inner_product(s.v, cc.cv)
               - list_inner_product(cc.cv, cc.cv) / 2.0 DESC, cc.j) = 1),
rmeans{t} AS MATERIALIZED (
  SELECT j, list(mv ORDER BY d) AS cv FROM (
    SELECT j, d, round(avg(val), 6) AS mv
    FROM (SELECT j, unnest(v) AS val, generate_subscripts(v, 1) AS d
          FROM rassign{t}) u
    GROUP BY j, d) m
  GROUP BY j),
rcent{t} AS MATERIALIZED (
  SELECT p.j,
         coalesce(m.cv, list_transform(p.cv, x -> round(x, 6))) AS cv
  FROM rcent{p} p LEFT JOIN rmeans{t} m USING (j))""")
    stages.append(f"""rjoined AS (
  SELECT f.j, f.fcid, r.cv,
         list_inner_product(r.cv, r.cv) / 2.0 AS half_cc
  FROM flagmap f JOIN rcent{iters} r USING (j)),
newcent AS (
  SELECT ct.centroid_id,
         coalesce(rj.cv, ct.cv) AS cv,
         coalesce(rj.half_cc, ct.half_cc) AS half_cc
  FROM cent ct LEFT JOIN rjoined rj ON ct.centroid_id = rj.fcid),
reass AS (
  SELECT vec_id, v, fcid AS centroid_id FROM (
    SELECT a.vec_id, a.v, rj.fcid,
           row_number() OVER (PARTITION BY a.vec_id
              ORDER BY list_inner_product(a.v, rj.cv) - rj.half_cc
                       DESC, rj.j) AS rnk
    FROM (SELECT a2.vec_id, a2.v, a2.centroid_id FROM assignf a2
          JOIN flagmap fm ON a2.centroid_id = fm.fcid
          WHERE {lists_pred}) a
    CROSS JOIN rjoined rj) t
  WHERE rnk = 1),
lists AS (
  SELECT vec_id AS nn_id, v AS cvec, centroid_id FROM assignf
  WHERE centroid_id NOT IN (SELECT fcid FROM flagmap)
    AND ({lists_pred})
  UNION ALL
  SELECT vec_id, v, centroid_id FROM reass),
q AS (SELECT vec_id AS query_id, v AS qv FROM c
      WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv, centroid_id
  FROM q CROSS JOIN newcent
  QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY list_inner_product(qv, cv) - half_cc DESC,
               centroid_id) <= {nprobe}),
cand AS (
  SELECT p.query_id, l.nn_id,
         round(list_cosine_similarity(l.cvec, p.qv), 6) AS cosine
  FROM probes p JOIN lists l ON l.centroid_id = p.centroid_id
  WHERE p.query_id != l.nn_id)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nn_id) AS rank
  FROM cand) t
WHERE rank <= {k}"""


@query("ann_ivf_retrain_cells", _ivf_retrain_sql())
def q_ann_ivf_retrain_cells(spark, sf_dir):
    """The COMPLETE drift loop closed, under a full value-hash replay
    oracle — monitor → flag → targeted retrain → serve, all on one
    persisted index path: build the IVF index over half the corpus
    (even vec_id, deterministic seed centroids) and WRITE it; run the
    per-cell drift monitor against the arriving odd-id batch
    (operators/similarity.py:ivf_drift_stats — the
    ``ann_ivf_drift_by_cell`` computation); FLAG the 4 worst-drifting
    cells (lowest ``cos_drift``, NULLs last, centroid_id tie-break — a
    bounded ≤ n_centroids collect); fast-ingest APPEND the batch (a
    journaled delta under the frozen centroids); RETRAIN only the
    flagged cells (operators/similarity.py:ivf_retrain_cells — local
    content-deterministic Lloyd over just those cells' vectors,
    centroid ids stable, cold cells bit-untouched) publishing a new
    generation; and serve the standard probes from the retrained
    index.  The oracle replays the frozen assignment, the drift
    quantization, the flag ordering, the UNROLLED local Lloyd, the
    in-place centroid replacement, the local re-assignment AND the
    serve — hash-green proves the whole remediation loop is exact, not
    just plausible.  Recall-recovery (the drifted region regains its
    own cell) is asserted separately in
    tests/test_index_lifecycle.py::TestIvfRetrainCells."""
    e = read_table(spark, sf_dir, "embeddings")
    odd = e.where(F.col("vec_id") % 2 != 0)
    path = _fresh_state_path("ivf_rt", sf_dir)
    S.write_ivf_index(
        S.ivf_build_index(e.where(F.col("vec_id") % 2 == 0),
                          centroids=_ann_seed_centroids(e)), path)
    drift = S.ivf_drift_stats(S.read_ivf_index(spark, path), odd) \
        .collect()                       # ≤ n_centroids rows
    drift.sort(key=lambda r: ((r["cos_drift"] is None),
                              r["cos_drift"] if r["cos_drift"]
                              is not None else 0.0,
                              r["centroid_id"]))
    flagged = [int(r["centroid_id"]) for r in drift[:4]]
    S.ivf_append_index(spark, path, odd)
    S.ivf_retrain_cells(spark, path, flagged)
    return S.ivf_topk_from_index(S.read_ivf_index(spark, path),
                                 _ann_seed_queries(e), k=5, nprobe=4)


@query("bm25_torn_append_topk", _BM25_SQL.format(
    t=_TOKS, q=f"list_slice({_TOKS}, 1, 6)", k=5, qwhere="").replace(
    "WHERE source <> 'src0'",
    "WHERE source <> 'src0' AND doc_id % 3 <> 2"))
def q_bm25_torn_append_topk(spark, sf_dir):
    """CRASH SEMANTICS under the full value-hash oracle: the journaled
    append's core safety claim — a torn ingest is invisible — verified
    end to end, not just unit-tested.  Build the index over two thirds
    of the training corpus and WRITE it; then a fast-ingest append of
    the final third TEARS mid-flight: the delta's postings land on
    disk through the public journal API (index_store.begin_delta +
    delta_table_path) but the ``_COMMITTED`` marker never does —
    exactly the on-disk state a crash between the table writes and the
    commit leaves behind.  Serve.  Hash-equal to the TWO-THIRDS corpus
    replay proves the unmarked delta's files are pruned at the scan
    (never read, never scored) and the committed state keeps serving
    bit-exactly — the driver-level form of
    tests/test_index_lifecycle.py's torn-append test."""
    from orange3_timeseries_spark.operators.index_store import (
        begin_delta,
        delta_table_path,
    )
    from orange3_timeseries_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk_from_index,
        read_bm25_index,
        write_bm25_index,
    )
    from orange3_timeseries_spark.operators.text import tokens_expr

    d = read_table(spark, sf_dir, "documents")
    qs = (d.where(F.col("source") == "src0")
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(tokens_expr(F.col("text")), 1, 6),
                               " ").alias("text")))
    corpus = d.where(F.col("source") != "src0")
    third = F.col("doc_id") % 3
    path = _fresh_state_path("bm25_torn", sf_dir)
    write_bm25_index(bm25_build_index(corpus.where(third != 2)), path)
    # the torn append: delta postings fully written, marker never lands
    torn = bm25_build_index(corpus.where(third == 2))
    dpath = begin_delta(path)
    (torn.postings.repartition("bucket").write.mode("overwrite")
     .partitionBy("bucket")
     .parquet(delta_table_path(dpath, "postings")))
    return bm25_topk_from_index(read_bm25_index(spark, path), qs,
                                top_k=5)


@query("ann_hard_negatives", """
WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
      FROM c WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS nn_id,
         round(list_cosine_similarity(c.v, q.qv), 6) AS cosine
  FROM c CROSS JOIN q
  WHERE c.vec_id != q.query_id AND c.label != q.qlabel)
SELECT query_id, nn_id, cosine, rank FROM (
  SELECT query_id, nn_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nn_id) AS rank
  FROM scored) t
WHERE rank <= 5
""")
def q_ann_hard_negatives(spark, sf_dir):
    """HARD-NEGATIVE mining for contrastive training
    (operators/similarity.py:hard_negative_topk): per seed query, the
    top-5 most-similar corpus vectors whose ``label`` DIFFERS from the
    query's — the highest-value negatives exactly because the
    embedding currently confuses them with positives.  Positives
    (same-label pairs) are excluded BEFORE the rank window, so an
    excluded positive frees its rank for the next-nearest true
    negative.  Plan: the broadcast-queries cosine kernel (corpus never
    shuffles) + a broadcast left-anti join on the supervision-sized
    positive set + one rank-window exchange.  Oracle replays the
    cosine rounding, the exclusion AND the ranking."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = (e.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding",
                       F.col("label").alias("__ql__")))
    positives = (queries.select("query_id", "__ql__")
                 .join(e.select("vec_id", "label"),
                       F.col("label") == F.col("__ql__"))
                 .select("query_id", "vec_id"))
    return S.hard_negative_topk(e, queries.drop("__ql__"), positives,
                                k=5)


@query("ann_pq_drift_by_subspace", f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ms AS (SELECT unnest(generate_series(0, 7)) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.v, ms.m*8+1, ms.m*8+8) AS cv
       FROM c x, ms WHERE x.vec_id < 16),
sl AS (SELECT x.vec_id, ms.m,
              list_slice(x.v, ms.m*8+1, ms.m*8+8) AS sv
       FROM c x, ms),
enc AS (SELECT s.vec_id, s.m, b.j,
               ({" + ".join(f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))" for i in range(8))}) AS dist
        FROM sl s JOIN cb b ON s.m = b.m),
codes AS (SELECT vec_id, m, j AS code,
                 CAST(round(round(dist, 6) * 1000000.0) AS BIGINT) AS qe
          FROM (SELECT vec_id, m, j, dist,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY dist, j) AS rn
                FROM enc) t
          WHERE rn = 1),
idx AS (SELECT m, code AS j, count(*)::BIGINT AS n_idx_j
        FROM codes WHERE vec_id % 2 = 0 GROUP BY 1, 2),
nw AS (SELECT m, code AS j, count(*)::BIGINT AS n_new_j,
              sum(qe)::BIGINT AS qe_sum
       FROM codes WHERE vec_id % 2 = 1 GROUP BY 1, 2),
spine AS (SELECT ms.m, g.j
          FROM ms, (SELECT unnest(generate_series(0, 15)) AS j) g),
cell AS (SELECT s.m, s.j,
                coalesce(i.n_idx_j, 0)::BIGINT AS n_idx_j,
                coalesce(w.n_new_j, 0)::BIGINT AS n_new_j,
                coalesce(w.qe_sum, 0)::BIGINT AS qe_sum
         FROM spine s LEFT JOIN idx i ON s.m = i.m AND s.j = i.j
         LEFT JOIN nw w ON s.m = w.m AND s.j = w.j),
tot AS (SELECT m, sum(n_idx_j)::BIGINT AS n_index,
               sum(n_new_j)::BIGINT AS n_new,
               sum(qe_sum)::BIGINT AS qe_tot
        FROM cell GROUP BY 1),
l1 AS (SELECT c.m,
              sum(abs(CAST(round(
                  (c.n_idx_j::DOUBLE / t.n_index::DOUBLE
                   - c.n_new_j::DOUBLE / t.n_new::DOUBLE)
                  * 1000000.0) AS BIGINT)))::BIGINT AS l1_u
       FROM cell c JOIN tot t USING (m) GROUP BY 1)
SELECT t.m, t.n_index, t.n_new,
       l1.l1_u::DOUBLE / 1000000.0 AS usage_l1,
       (t.qe_tot::DOUBLE / t.n_new::DOUBLE) / 1000000.0
         AS mean_qerr_new
FROM tot t JOIN l1 USING (m)
""")
def q_ann_pq_drift_by_subspace(spark, sf_dir):
    """Codebook-drift monitor for frozen-codebook PQ serving
    (operators/similarity.py:pq_drift_by_subspace) — the PQ sibling of
    ``ann_ivf_drift_by_cell``, closing the retrain-signal matrix for
    both ANN families: the index persists the even-id half of the
    corpus encoded under the deterministic seed codebooks, the odd-id
    half arrives as the ingest batch, and each subspace reports (a)
    ``usage_l1`` — how differently the batch's encoding uses the
    codewords vs the indexed population (a shifted histogram = the
    data moved relative to the frozen codewords), and (b)
    ``mean_qerr_new`` — the batch's mean squared quantization error,
    the quantity ADC error is made of.  Per-vector subspace errors
    use the SAME dimension-sequential IEEE chain as ``pq_encode``,
    round once, quantize to micro-units; all sums exact BIGINTs; the
    oracle replays encode, error, usage shares AND the division
    trees."""
    e = read_table(spark, sf_dir, "embeddings")
    idx = S.pq_build_index(e.where(F.col("vec_id") % 2 == 0),
                           codebooks=_ann_seed_books(e))
    path = _fresh_state_path("pq_drift", sf_dir)
    S.write_pq_index(idx, path)
    return S.pq_drift_by_subspace(S.read_pq_index(spark, path),
                                  e.where(F.col("vec_id") % 2 != 0))


@query("ann_ivfpq_lifecycle_topk", _OS_R10["ann_ivfpq_topk"])
def q_ann_ivfpq_lifecycle_topk(spark, sf_dir):
    """The COMPOSITE index family persisted — the fifth registry
    family, completing the serving matrix with the production
    billion-vector layout (coarse lists bound the scan, PQ codes bound
    the memory traffic): build the IVF-PQ index over a third of the
    corpus under the deterministic seed models → versioned WRITE
    (v=1) → READ + MERGE the second third (one delta Arrow pass under
    the frozen models) → WRITE to the SAME path (v=2) → journaled
    fast-ingest APPEND of the final third → COMPACT (v=3) → serve the
    standard probes from the loaded entries (probe partition prune +
    broadcast ADC LUTs; per-vector payload = M+4 bytes).  Hash-equal
    to the live one-shot ``ann_ivfpq_topk`` oracle proves
    merged == appended == compacted == rebuilt for the composite
    family too (operators/similarity.py:IvfPqIndex)."""
    e = read_table(spark, sf_dir, "embeddings")
    third = F.col("vec_id") % 3
    books = _ann_seed_books(e)
    cents = _ann_seed_centroids(e)
    path = _fresh_state_path("ivfpq_lc", sf_dir)
    S.write_ivfpq_index(
        S.ivfpq_build_index(e.where(third == 0), cents, books), path)
    merged = S.ivfpq_merge_index(S.read_ivfpq_index(spark, path),
                                 e.where(third == 1))
    S.write_ivfpq_index(merged, path)
    S.ivfpq_append_index(spark, path, e.where(third == 2))
    S.compact_ivfpq_index(spark, path)
    return S.ivfpq_topk_from_index(S.read_ivfpq_index(spark, path),
                                   _ann_seed_queries(e), k=5, nprobe=4)


# ----------------------------------------- PQ subspace retrain loop
def _pq_retrain_sql(M=8, ds=8, K=16, k=5, n_queries=10, n_flag=2,
                    sample=2048, iters=10):
    """Full replay of the PQ drift→retrain→serve loop
    (``ann_pq_retrain_subspaces``): seed-codebook encode over the
    whole corpus (the ``ann_pq_topk`` chain), the per-subspace drift
    report (same micro-unit quantization as
    ``ann_pq_drift_by_subspace``), flagging the ``n_flag``
    worst-error subspaces, an UNROLLED per-(m, j) local Lloyd over the
    ordered sample's subvector slices (evenly spaced init, first-index
    tie-break, 6-dp rounding per round — the
    ``_train_subspace_codebooks`` recipe), flagged-slot re-encode
    spliced over the frozen cold codes, and the standard ADC serve
    over the UPDATED codebook table."""
    chain = " + ".join(
        f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))"
        for i in range(ds))
    stages = [f"""c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ms AS (SELECT unnest(generate_series(0, {M-1})) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS cv
       FROM c x, ms WHERE x.vec_id < {K}),
sl AS MATERIALIZED (
  SELECT x.vec_id, ms.m,
         list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS sv
  FROM c x, ms),
enc AS MATERIALIZED (
  SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
  FROM sl s JOIN cb b ON s.m = b.m),
codes AS MATERIALIZED (
  SELECT vec_id, m, j AS code,
         CAST(round(round(dist, 6) * 1000000.0) AS BIGINT) AS qe
  FROM (SELECT vec_id, m, j, dist,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, j) AS rn
        FROM enc) t
  WHERE rn = 1),
nwq AS (SELECT m, count(*)::BIGINT AS n_new, sum(qe)::BIGINT AS qe_tot
        FROM codes WHERE vec_id % 2 = 1 GROUP BY 1),
fl AS MATERIALIZED (
  SELECT m FROM (
    SELECT m, (qe_tot::DOUBLE / n_new::DOUBLE) / 1000000.0 AS mq
    FROM nwq)
  ORDER BY mq DESC NULLS LAST, m LIMIT {n_flag}),
samp AS MATERIALIZED (
  SELECT v, rn FROM (
    SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM c) t
  WHERE rn < {sample}),
nn AS (SELECT count(*) AS cnt FROM samp),
sm AS MATERIALIZED (
  SELECT f.m, s.rn,
         list_slice(s.v, f.m*{ds}+1, f.m*{ds}+{ds}) AS sv
  FROM samp s CROSS JOIN fl f),
rc0 AS MATERIALIZED (
  SELECT sm.m, g.j, sm.sv AS cv
  FROM (SELECT unnest(generate_series(0, {K - 1})) AS j) g
  CROSS JOIN nn
  JOIN sm ON sm.rn = (g.j * nn.cnt) // {K})"""]
    for t in range(1, iters + 1):
        p = t - 1
        stages.append(f"""ra{t} AS MATERIALIZED (
  SELECT s.m, s.rn, s.sv, cc.j
  FROM sm s JOIN rc{p} cc ON s.m = cc.m
  QUALIFY row_number() OVER (PARTITION BY s.m, s.rn
      ORDER BY list_inner_product(s.sv, cc.cv)
               - list_inner_product(cc.cv, cc.cv) / 2.0 DESC, cc.j) = 1),
rm{t} AS (
  SELECT m, j, list(mv ORDER BY d) AS cv FROM (
    SELECT m, j, d, round(avg(val), 6) AS mv
    FROM (SELECT m, j, unnest(sv) AS val, generate_subscripts(sv, 1) AS d
          FROM ra{t}) u
    GROUP BY m, j, d) g
  GROUP BY m, j),
rc{t} AS MATERIALIZED (
  SELECT p.m, p.j,
         coalesce(q.cv, list_transform(p.cv, x -> round(x, 6))) AS cv
  FROM rc{p} p LEFT JOIN rm{t} q ON p.m = q.m AND p.j = q.j)""")
    stages.append(f"""cb2 AS MATERIALIZED (
  SELECT m, j, cv FROM rc{iters}
  UNION ALL
  SELECT b.m, b.j, b.cv FROM cb b
  WHERE b.m NOT IN (SELECT m FROM fl)),
enc2 AS MATERIALIZED (
  SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
  FROM sl s JOIN cb2 b ON s.m = b.m),
codes2 AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT e2.vec_id, e2.m, e2.j, e2.dist,
           row_number() OVER (PARTITION BY e2.vec_id, e2.m
                              ORDER BY e2.dist, e2.j) AS rn
    FROM enc2 e2 JOIN fl ON e2.m = fl.m) t
  WHERE rn = 1
  UNION ALL
  SELECT cx.vec_id, cx.m, cx.code FROM codes cx
  WHERE cx.m NOT IN (SELECT m FROM fl)),
adc AS (
  SELECT q.vec_id AS query_id, cx.vec_id AS nn_id,
         sum(q.dist) AS approx
  FROM codes2 cx JOIN enc2 q ON q.m = cx.m AND q.j = cx.code
  WHERE q.vec_id < {n_queries} AND cx.vec_id != q.vec_id
  GROUP BY 1, 2)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT query_id, nn_id, approx_l2, rank FROM (
  SELECT query_id, nn_id, round(approx, 6) AS approx_l2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(approx, 6), nn_id) AS rank
  FROM adc) t
WHERE rank <= {k}"""


@query("ann_pq_retrain_subspaces", _pq_retrain_sql())
def q_ann_pq_retrain_subspaces(spark, sf_dir):
    """The SECOND drift loop closed, under a full value-hash replay
    oracle — the PQ-codebook sibling of ``ann_ivf_retrain_cells``,
    completing the monitor→remedy matrix for both frozen-model
    degradation modes (coarse centroids r12, fine codebooks here):
    build the PQ index over the even-id half under the deterministic
    seed codebooks and WRITE it; run the per-subspace drift monitor
    against the arriving odd-id batch
    (operators/similarity.py:pq_drift_by_subspace); FLAG the 2
    worst-error subspaces (highest ``mean_qerr_new``, NULLs last,
    subspace tie-break — a bounded ≤ M collect); fast-ingest APPEND
    the batch (a journaled delta encoded under the frozen codebooks);
    RETRAIN only the flagged subspaces
    (operators/similarity.py:pq_retrain_subspaces — per-subspace
    content-deterministic Lloyd over the ordered sample, flagged code
    slots re-encoded in one codes ⋈ vectors pass, cold subspaces'
    codebooks AND code slots bit-untouched) publishing a new
    generation; and serve the standard ADC probes from the retrained
    index.  The oracle replays the seed encode, the drift
    quantization, the flag ordering, the UNROLLED per-subspace Lloyd,
    the spliced re-encode AND the serve — hash-green proves the whole
    remediation loop exact.  Quantization-error recovery is asserted
    separately in
    tests/test_index_lifecycle.py::TestPqRetrainSubspaces."""
    e = read_table(spark, sf_dir, "embeddings")
    odd = e.where(F.col("vec_id") % 2 != 0)
    path = _fresh_state_path("pq_rt", sf_dir)
    S.write_pq_index(
        S.pq_build_index(e.where(F.col("vec_id") % 2 == 0),
                         codebooks=_ann_seed_books(e)), path)
    drift = S.pq_drift_by_subspace(S.read_pq_index(spark, path),
                                   odd).collect()   # ≤ M rows
    drift.sort(key=lambda r: (
        (r["mean_qerr_new"] is None),
        -(r["mean_qerr_new"] or 0.0), r["m"]))
    flagged = [int(r["m"]) for r in drift[:2]]
    S.pq_append_index(spark, path, odd)
    S.pq_retrain_subspaces(spark, path, flagged, e)
    return S.pq_topk_from_index(S.read_pq_index(spark, path),
                                _ann_seed_queries(e), k=5)


@query("ann_ivf_retrain_null_drift", _ivf_retrain_sql(
    new_pred="vec_id IN (1, 3, 5)",
    lists_pred="(vec_id % 2 = 0 OR vec_id IN (1, 3, 5))",
    flag_order="(cos_drift IS NOT NULL), (n_index = 0), centroid_id"))
def q_ann_ivf_retrain_null_drift(spark, sf_dir):
    """The drift loop's ABANDONED-CELL path end-to-end (the r12
    verdict's remaining oracle gap): a tiny 3-vector ingest batch
    (odd ids 1/3/5) leaves ≥13 of the 16 cells with ``n_new = 0`` —
    ``cos_drift`` NULL, the emptying-cells signal — and the flag rule
    TARGETS those NULL-drift cells (NULL first, populated cells
    before index-empty ones, centroid_id tie-break), so the retrain
    re-clusters cells the batch abandoned rather than cells it
    degraded.  Same lifecycle as ``ann_ivf_retrain_cells`` otherwise:
    build over the even half, monitor, flag 4, journaled append,
    targeted retrain (cold cells bit-untouched), serve the standard
    probes from the new generation.  The oracle replays the NULL
    ordering, the n_index guard AND the whole remediation under the
    restricted lists membership (even ∪ {1, 3, 5})."""
    e = read_table(spark, sf_dir, "embeddings")
    batch = e.where(F.col("vec_id").isin(1, 3, 5))
    path = _fresh_state_path("ivf_rtn", sf_dir)
    S.write_ivf_index(
        S.ivf_build_index(e.where(F.col("vec_id") % 2 == 0),
                          centroids=_ann_seed_centroids(e)), path)
    drift = S.ivf_drift_stats(S.read_ivf_index(spark, path), batch) \
        .collect()                       # ≤ n_centroids rows
    drift.sort(key=lambda r: ((r["cos_drift"] is not None),
                              r["n_index"] == 0,
                              r["centroid_id"]))
    flagged = [int(r["centroid_id"]) for r in drift[:4]]
    S.ivf_append_index(spark, path, batch)
    S.ivf_retrain_cells(spark, path, flagged)
    return S.ivf_topk_from_index(S.read_ivf_index(spark, path),
                                 _ann_seed_queries(e), k=5, nprobe=4)


def _ivfpq_retrain_sql(M=8, ds=8, K=16, k=5, nprobe=4, n_queries=10,
                       n_flag=2, sample=2048, iters=10):
    """Composite-family fine-codebook retrain replay: the
    ``_pq_retrain_sql`` drift→flag→Lloyd→splice stages composed with
    ``_ivfpq_sql``'s coarse assignment/probe/ADC serve — the coarse
    half is untouched by the retrain (entries keep their cells), so
    its CTEs replay verbatim while the LUT/code side reads the
    UPDATED codebooks."""
    chain = " + ".join(
        f"((s.sv[{i+1}]) - (b.cv[{i+1}])) * ((s.sv[{i+1}]) - (b.cv[{i+1}]))"
        for i in range(ds))
    stages = [f"""c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS MATERIALIZED (
  SELECT vec_id AS cid, v AS cv,
         list_inner_product(v, v) / 2.0 AS half_cc
  FROM c WHERE vec_id < {K}),
assign AS MATERIALIZED (
  SELECT vec_id AS nn_id, cid
  FROM c CROSS JOIN cent
  QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY list_inner_product(v, cv) - half_cc DESC, cid) = 1),
ms AS (SELECT unnest(generate_series(0, {M-1})) AS m),
cb AS (SELECT x.vec_id AS j, ms.m,
              list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS cv
       FROM c x, ms WHERE x.vec_id < {K}),
sl AS MATERIALIZED (
  SELECT x.vec_id, ms.m,
         list_slice(x.v, ms.m*{ds}+1, ms.m*{ds}+{ds}) AS sv
  FROM c x, ms),
enc AS MATERIALIZED (
  SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
  FROM sl s JOIN cb b ON s.m = b.m),
codes AS MATERIALIZED (
  SELECT vec_id, m, j AS code,
         CAST(round(round(dist, 6) * 1000000.0) AS BIGINT) AS qe
  FROM (SELECT vec_id, m, j, dist,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, j) AS rn
        FROM enc) t
  WHERE rn = 1),
nwq AS (SELECT m, count(*)::BIGINT AS n_new, sum(qe)::BIGINT AS qe_tot
        FROM codes WHERE vec_id % 2 = 1 GROUP BY 1),
fl AS MATERIALIZED (
  SELECT m FROM (
    SELECT m, (qe_tot::DOUBLE / n_new::DOUBLE) / 1000000.0 AS mq
    FROM nwq)
  ORDER BY mq DESC NULLS LAST, m LIMIT {n_flag}),
samp AS MATERIALIZED (
  SELECT v, rn FROM (
    SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn FROM c) t
  WHERE rn < {sample}),
nn AS (SELECT count(*) AS cnt FROM samp),
sm AS MATERIALIZED (
  SELECT f.m, s.rn,
         list_slice(s.v, f.m*{ds}+1, f.m*{ds}+{ds}) AS sv
  FROM samp s CROSS JOIN fl f),
rc0 AS MATERIALIZED (
  SELECT sm.m, g.j, sm.sv AS cv
  FROM (SELECT unnest(generate_series(0, {K - 1})) AS j) g
  CROSS JOIN nn
  JOIN sm ON sm.rn = (g.j * nn.cnt) // {K})"""]
    for t in range(1, iters + 1):
        p = t - 1
        stages.append(f"""ra{t} AS MATERIALIZED (
  SELECT s.m, s.rn, s.sv, cc.j
  FROM sm s JOIN rc{p} cc ON s.m = cc.m
  QUALIFY row_number() OVER (PARTITION BY s.m, s.rn
      ORDER BY list_inner_product(s.sv, cc.cv)
               - list_inner_product(cc.cv, cc.cv) / 2.0 DESC, cc.j) = 1),
rm{t} AS (
  SELECT m, j, list(mv ORDER BY d) AS cv FROM (
    SELECT m, j, d, round(avg(val), 6) AS mv
    FROM (SELECT m, j, unnest(sv) AS val, generate_subscripts(sv, 1) AS d
          FROM ra{t}) u
    GROUP BY m, j, d) g
  GROUP BY m, j),
rc{t} AS MATERIALIZED (
  SELECT p.m, p.j,
         coalesce(q.cv, list_transform(p.cv, x -> round(x, 6))) AS cv
  FROM rc{p} p LEFT JOIN rm{t} q ON p.m = q.m AND p.j = q.j)""")
    stages.append(f"""cb2 AS MATERIALIZED (
  SELECT m, j, cv FROM rc{iters}
  UNION ALL
  SELECT b.m, b.j, b.cv FROM cb b
  WHERE b.m NOT IN (SELECT m FROM fl)),
enc2 AS MATERIALIZED (
  SELECT s.vec_id, s.m, b.j, ({chain}) AS dist
  FROM sl s JOIN cb2 b ON s.m = b.m),
codes2 AS MATERIALIZED (
  SELECT vec_id, m, j AS code FROM (
    SELECT e2.vec_id, e2.m, e2.j, e2.dist,
           row_number() OVER (PARTITION BY e2.vec_id, e2.m
                              ORDER BY e2.dist, e2.j) AS rn
    FROM enc2 e2 JOIN fl ON e2.m = fl.m) t
  WHERE rn = 1
  UNION ALL
  SELECT cx.vec_id, cx.m, cx.code FROM codes cx
  WHERE cx.m NOT IN (SELECT m FROM fl)),
probes AS (
  SELECT vec_id AS query_id, cid
  FROM c CROSS JOIN cent
  WHERE vec_id < {n_queries}
  QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY list_inner_product(v, cv) - half_cc DESC, cid)
      <= {nprobe}),
adc AS (
  SELECT p.query_id, a.nn_id, sum(qe2.dist) AS approx
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN codes2 cx ON cx.vec_id = a.nn_id
  JOIN enc2 qe2 ON qe2.vec_id = p.query_id
               AND qe2.m = cx.m AND qe2.j = cx.code
  WHERE a.nn_id != p.query_id
  GROUP BY 1, 2)""")
    body = ",\n".join(stages)
    return f"""WITH {body}
SELECT query_id, nn_id, approx_l2, rank FROM (
  SELECT query_id, nn_id, round(approx, 6) AS approx_l2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(approx, 6), nn_id) AS rank
  FROM adc) t
WHERE rank <= {k}"""


@query("ann_ivfpq_retrain_subspaces", _ivfpq_retrain_sql())
def q_ann_ivfpq_retrain_subspaces(spark, sf_dir):
    """The composite family's fine-codebook drift loop, driver-
    verified — the third and last cell of the monitor→remedy matrix
    (IVF coarse cells r12, PQ subspaces this round, IVF-PQ fine
    codebooks here): build the IVF-PQ index over the even-id half
    under the deterministic seed models and WRITE it; run the PQ
    subspace drift monitor against the arriving odd-id batch (the
    entries' codes ARE a PQ code table — the monitor composes
    directly); FLAG the 2 worst-error subspaces; journaled APPEND;
    RETRAIN only the flagged subspaces
    (operators/similarity.py:ivfpq_retrain_subspaces — the shared
    `_retrain_subspaces_impl` kernel: per-subspace deterministic
    Lloyd + one entries ⋈ vectors spliced re-encode; every entry
    keeps its coarse cell bit-identically, cold code slots and cold
    codebooks untouched); and serve the standard probes.  The oracle
    composes the verified `_pq_retrain_sql` drift/Lloyd/splice stages
    with `_ivfpq_sql`'s untouched coarse assignment/probe/ADC —
    hash-green proves the composite retrain exact end to end."""
    e = read_table(spark, sf_dir, "embeddings")
    odd = e.where(F.col("vec_id") % 2 != 0)
    path = _fresh_state_path("ivfpq_rt", sf_dir)
    S.write_ivfpq_index(
        S.ivfpq_build_index(e.where(F.col("vec_id") % 2 == 0),
                            _ann_seed_centroids(e),
                            _ann_seed_books(e)), path)
    base = S.read_ivfpq_index(spark, path)
    drift = S.pq_drift_by_subspace(
        S.PqIndex(base.entries.select("nn_id", "pq_code"),
                  base.codebooks, base.id_col), odd).collect()
    drift.sort(key=lambda r: (
        (r["mean_qerr_new"] is None),
        -(r["mean_qerr_new"] or 0.0), r["m"]))
    flagged = [int(r["m"]) for r in drift[:2]]
    S.ivfpq_append_index(spark, path, odd)
    S.ivfpq_retrain_subspaces(spark, path, flagged, e)
    return S.ivfpq_topk_from_index(S.read_ivfpq_index(spark, path),
                                   _ann_seed_queries(e), k=5,
                                   nprobe=4)
