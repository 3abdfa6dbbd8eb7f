"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning (Bernoulli per
partition-local RNG), so a re-run over a repartitioned 100 TB corpus
samples DIFFERENT rows — useless for reproducible dataset curation.  These
operators sample by the portable content hash (``hashing.phash``: md5-hex
prefix → int64, replayable in DuckDB), so the sample is a pure function of
the data:

- stable across partitioning, cluster size, and engine (Spark == DuckDB ==
  any future runner);
- consistent across tables: sampling two tables by the same key keeps
  joinable rows together (the classic hash-sample trick for sampled
  join pipelines);
- complement-able: ``rate=0.9`` keep and ``rate=0.1`` holdout partition the
  corpus exactly (hash < t vs >= t), no overlap, no gap.

All three operators are pure Catalyst predicates / window ranks — pushed
into the scan where possible, no shuffle for :func:`hash_sample`, one
bounded shuffle for the per-stratum variants (map-side partial for
:func:`stratified_sample`'s threshold path; rank-based :func:`top_n_per_key`
shuffles once on the key).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.hashing import phash

__all__ = ["hash_sample", "stratified_sample", "top_n_per_key",
           "sample_bucket_expr", "mix_corpus"]

#: hash space size for rate thresholds (phash is uniform on [0, 2^60))
_SPACE = 1 << 60


def sample_bucket_expr(key: Column, n_buckets: int) -> Column:
    """Deterministic bucket index in [0, n_buckets) from a string key —
    the primitive under all three samplers, exposed for custom splits
    (e.g. 100-way sharding a corpus for curriculum mixes)."""
    return phash(key) % F.lit(int(n_buckets))


def hash_sample(df: DataFrame, key_col: str, rate: float,
                seed_salt: str = "") -> DataFrame:
    """Keep rows whose ``phash(key || salt)`` falls below ``rate`` of the
    hash space — a deterministic, partitioning-independent Bernoulli(rate)
    sample keyed on content.  A pure filter: no shuffle, pushed toward the
    scan by Catalyst."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    k = F.col(key_col).cast("string")
    if seed_salt:
        k = F.concat(k, F.lit(seed_salt))
    return df.where(phash(k) < F.lit(int(rate * _SPACE)))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      rates: Dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum hash sampling: stratum ``s`` keeps ``rates[s]`` of its
    rows (``default_rate`` for unlisted strata).  The rates map becomes an
    inline CASE expression — still a pure pushable filter, no shuffle, no
    broadcast table needed for the usual handful of strata."""
    thr = F.lit(int(default_rate * _SPACE))
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1]")
        thr = F.when(F.col(strata_col) == s,
                     F.lit(int(r * _SPACE))).otherwise(thr)
    return df.where(phash(F.col(key_col).cast("string")) < thr)


def mix_corpus(df: DataFrame, source_col: str, key_col: str,
               proportions: Dict[str, float], budget: float,
               weight_col: str) -> DataFrame:
    """Deterministic source-proportioned corpus mix — the "data mixing"
    step of a training pipeline: downsample each source so the mixed
    corpus approaches ``budget`` total ``weight_col`` (tokens/chars)
    split by ``proportions`` (source -> target fraction of the budget).

    ``rate_s = min(1, budget * p_s / w_s)`` where ``w_s`` is source s's
    total weight; a source whose corpus is smaller than its allocation
    is kept whole (rates never exceed 1 — no upsampling/duplication
    here).  Sources absent from ``proportions`` are dropped.

    Plan: one map-side-combining aggregate produces the per-source
    totals (#sources rows — collected driver-side, the same bounded
    O(model) collect as IVF centroids), rates become an inline CASE
    threshold via :func:`stratified_sample`, so the final mix is a PURE
    pushable scan filter — no join, no shuffle, reproducible across
    engines and partitionings.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    totals = {r[0]: float(r[1]) for r in
              df.groupBy(source_col)
                .agg(F.sum(F.col(weight_col)).cast("double"))
                .collect()}
    rates = {s: min(1.0, float(budget) * p / totals[s])
             for s, p in proportions.items() if s in totals and p > 0}
    return stratified_sample(df, source_col, key_col, rates,
                             default_rate=0.0)


def top_n_per_key(df: DataFrame, strata_col: str, key_col: str,
                  n: int, order_cols: Sequence[str] = ()) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen deterministically by hash order (ties broken by
    ``order_cols``) — the fixed-size-per-class sample a balanced eval set
    needs.  One shuffle on the stratum key; the rank window stops scoring
    a partition's sort run after ``n`` via the row_number filter."""
    h = phash(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in order_cols])
    return (df.withColumn("__rn__", F.row_number().over(w))
              .where(F.col("__rn__") <= int(n)).drop("__rn__"))


def token_budget_sample(df: DataFrame, strata_col: str, key_col: str,
                        weight_col: str, budget: int,
                        cum_col: str = "cum_weight") -> DataFrame:
    """Take documents per stratum in deterministic hash order until the
    stratum's cumulative weight reaches ``budget`` (rows whose running
    total stays ≤ budget are kept; the first over-budget row is cut).

    The curation primitive for "at most B tokens per source/language":
    reproducible (hash order is a pure function of the key), and a single
    per-stratum window shuffle — the running sum never re-sorts the
    corpus globally.  Returns the kept rows with ``cum_col`` attached."""
    h = phash(F.col(key_col).cast("string"))
    w = (Window.partitionBy(strata_col)
         .orderBy(h.asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.withColumn(cum_col, F.sum(weight_col).over(w).cast("long"))
    return out.where(F.col(cum_col) <= budget)


__all__.append("token_budget_sample")


def weighted_sample(df: DataFrame, strata_col: str, key_col: str,
                    weight_col: str, n: int) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis): each row gets priority u^(1/w) with
    u = (phash(key)+1)/2^60 — a pure function of the key, so the sample
    is reproducible across partitionings and engines — and the top-n
    priorities per stratum are kept.  Inclusion probability is
    proportional to weight, the one-pass distributed answer to
    "sample n docs per source, preferring longer/higher-quality ones".

    Efraimidis-Spirakis requires ``w > 0``: ``w = 0`` makes the exponent
    infinite (priority 0, silently never sampled) and ``w < 0`` yields
    priority > 1 (always sampled first, inverting the weighting) — rows
    with non-positive or null weight are EXCLUDED up front (a pushable
    filter, not a job failure: at corpus scale a handful of degenerate
    weights must not kill the sample).

    One per-stratum rank shuffle, same shape as :func:`top_n_per_key`."""
    df = df.where(F.col(weight_col).cast("double") > 0)
    u = (phash(F.col(key_col).cast("string")) + 1).cast("double") \
        / F.lit(float(_SPACE))
    prio = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    w = Window.partitionBy(strata_col).orderBy(
        prio.desc(), F.col(key_col).asc())
    return (df.withColumn("__wrn__", F.row_number().over(w))
            .where(F.col("__wrn__") <= n).drop("__wrn__"))


__all__.append("weighted_sample")


def temperature_mix(df: DataFrame, source_col: str, key_col: str,
                    budget: int, alpha: float = 0.5) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM standard:
    per-source sampling weight ``n_s^alpha``, alpha<1 upweights small
    sources) with EXACT integer allocation: ideal counts
    ``budget * n_s^alpha / sum n^alpha`` are apportioned by the
    largest-remainder method (Hamilton; tie -> source asc), capped at
    each source's actual size, then each source contributes its target
    count of documents in deterministic hash order.

    Where :func:`mix_corpus` takes EXPLICIT proportions and rate-samples
    by weight, this derives the proportions from the corpus itself and
    hits an exact per-source document count — the "rebalance the mix at
    temperature T" curation step.

    Determinism: with ``alpha=0.5`` the weight is ``sqrt(n)`` — IEEE
    correctly rounded, bit-identical on every engine (other alphas use
    ``pow``, correct to ~1 ulp); ideal counts round to 6 dp before
    floor/remainder so the apportionment can never flip on that ulp.

    Plan: one map-combining count per source (tiny), window math over
    the #sources-row table, broadcast join of the targets, one
    per-source rank window — a single corpus shuffle on the source key.
    All lazy: no driver collect, no eager action."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n__"))
    w = (F.sqrt(F.col("__n__")) if alpha == 0.5
         else F.pow(F.col("__n__"), F.lit(float(alpha))))
    gw = Window.partitionBy()  # global window over the tiny source table
    t = (counts.withColumn("__w__", w)
         .withColumn("__ideal__",
                     F.round(F.lit(int(budget)) * F.col("__w__")
                             / F.sum("__w__").over(gw), 6))
         .withColumn("__base__", F.floor("__ideal__"))
         .withColumn("__rem__", F.col("__ideal__") - F.col("__base__"))
         .withColumn("__left__",
                     F.lit(int(budget)) - F.sum("__base__").over(gw))
         .withColumn("__rk__", F.row_number().over(
             Window.orderBy(F.col("__rem__").desc(),
                            F.col(source_col).asc())))
         .withColumn("__target__",
                     F.least(F.col("__n__"),
                             F.col("__base__")
                             + (F.col("__rk__") <= F.col("__left__"))
                             .cast("long"))))
    h = phash(F.col(key_col).cast("string"))
    w2 = Window.partitionBy(source_col).orderBy(h.asc(),
                                                F.col(key_col).asc())
    return (df.join(F.broadcast(t.select(source_col, "__n__",
                                         "__target__")), source_col)
            .withColumn("__rn__", F.row_number().over(w2))
            .where(F.col("__rn__") <= F.col("__target__"))
            .select(*df.columns,
                    F.col("__n__").alias("n_source"),
                    F.col("__target__").alias("target")))


__all__.append("temperature_mix")


def dsir_weights(df: DataFrame, text_col: str, id_col: str,
                 target: Column, *, n_buckets: int = 4096,
                 k_smooth: float = 0.5, unit_scale: int = 10 ** 6,
                 pin_features: bool = True) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): score every document
    by how much more likely its hashed-bigram bag is under the TARGET
    domain's unigram-over-buckets model than under the raw model —
    ``log w(doc) = Σ_occurrences [ln p̂_t(b) − ln p̂_r(b)]`` with add-k
    smoothing over ``n_buckets`` hashed features.  ``target`` is a
    boolean Column marking the in-domain rows (they receive weights
    too, scored against the model they induced).

    Returns ``(id, n_bigrams, is_target, logw, avg_lr)`` for every
    document; ``logw`` is the DSIR log-importance-weight (resample by
    it with the existing ``sample_weighted_topn`` / ``mix_corpus``
    machinery — no global sort is forced here).

    Exactness: the per-bucket log-ratio is computed ONCE from exact
    BIGINT counts (one fixed expression tree — any engine produces the
    identical double), quantized to ``unit_scale`` micro-units as
    BIGINT, and per-document weights are INTEGER sums of those units —
    aggregation-order-free, so the DuckDB oracle replays them
    bit-for-bit.  One float division (units → logw) at the end.

    Plan: one corpus-sized tokenize pass emits the skinny per-doc
    bucket arrays (``pin_features`` localCheckpoints them — ints, ~an
    order smaller than the text — so the count pass and the scoring
    pass share ONE tokenize; pass False to trade a second tokenize for
    zero pinned state at extreme scale); bucket counts are a
    ``n_buckets``-row broadcast; scoring is explode → broadcast join →
    map-side-combining BIGINT sum."""
    from orange3_timeseries_spark.operators.text import (
        normalize_text_expr,
    )

    # ONE definition of the normalization (lowercase, strip punct,
    # collapse whitespace) shared with the dedup tier — the expression
    # must stay bit-identical to the registered _LM_TOKS oracle, and a
    # second inline copy invites silent divergence if one is edited
    toks = F.filter(F.split(normalize_text_expr(F.col(text_col)), " "),
                    lambda t: t != "")
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.pmod(phash(F.concat(a, F.lit(" "), b)),
                            F.lit(n_buckets)))
    # NULL target verdicts route to the RAW side (coalesce once here):
    # conditional sums over a nullable boolean would skip those rows'
    # occurrences from BOTH models — and the registered oracle's
    # CASE WHEN ... ELSE puts NULL in the raw counts
    feats = df.select(F.col(id_col),
                      F.coalesce(target, F.lit(False))
                      .alias("is_target"),
                      grams.alias("__bk__"))
    if pin_features:
        feats = feats.localCheckpoint()
    occ = feats.select(id_col, "is_target",
                       F.explode("__bk__").alias("__b__"))
    counts = (occ.groupBy("__b__")
              .agg(F.sum(F.col("is_target").cast("long"))
                   .cast("long").alias("__ct__"),
                   F.sum((~F.col("is_target")).cast("long"))
                   .cast("long").alias("__cr__")))
    tot = counts.agg(F.sum("__ct__").cast("long").alias("__nt__"),
                     F.sum("__cr__").cast("long").alias("__nr__"))
    kb = float(k_smooth) * n_buckets
    w = counts.join(F.broadcast(tot)).select(
        "__b__",
        F.round((F.log((F.col("__ct__").cast("double") + F.lit(k_smooth))
                       / (F.col("__nt__").cast("double") + F.lit(kb)))
                 - F.log((F.col("__cr__").cast("double")
                          + F.lit(k_smooth))
                         / (F.col("__nr__").cast("double") + F.lit(kb))))
                * F.lit(float(unit_scale))).cast("long")
        .alias("__wu__"))
    scored = (occ.join(F.broadcast(w), "__b__")
              .groupBy(id_col, "is_target")
              .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                   F.sum("__wu__").cast("long").alias("__su__")))
    base = feats.select(id_col, "is_target")
    return (base.join(scored.select(id_col, "n_bigrams", "__su__"),
                      id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long"))
                    .alias("n_bigrams"),
                    "is_target",
                    (F.coalesce(F.col("__su__"), F.lit(0)).cast("double")
                     / F.lit(float(unit_scale))).alias("logw"),
                    # UNROUNDED on purpose: su/n/scale is one fixed
                    # IEEE expression tree (identical double on any
                    # engine), while round(·, 6) of a value this close
                    # to a half-boundary is exactly the cross-engine
                    # rounding-kernel divergence the integer-unit
                    # design exists to avoid (hit once at sf0.1)
                    (F.coalesce(F.col("__su__"), F.lit(0))
                     .cast("double")
                     / F.nullif(F.col("n_bigrams"), F.lit(0))
                     .cast("double")
                     / F.lit(float(unit_scale))).alias("avg_lr")))


__all__.append("dsir_weights")
