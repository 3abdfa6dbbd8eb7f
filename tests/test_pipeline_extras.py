"""Sessionization, deterministic sampling, repetition metrics, and PII
redaction (operators/sessionize.py, sampling.py, text.py extensions)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.sampling import (
    hash_sample,
    sample_bucket_expr,
    stratified_sample,
    top_n_per_key,
)
from orange3_timeseries_spark.operators.sessionize import (
    session_table,
    sessionize,
)
from orange3_timeseries_spark.operators.text import (
    redact_pii,
    repetition_features,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m // 60, m % 60)


# ------------------------------------------------------------- sessionize
@pytest.fixture(scope="module")
def events(spark):
    # user a: gaps 10s, 10s, 400s, 10s -> sessions [1,1,1,2,2]
    # user b: single event -> session 1
    rows = [("a", _ts(0), 1.0), ("a", _ts(10), 2.0), ("a", _ts(20), 3.0),
            ("a", _ts(420), 4.0), ("a", _ts(430), 5.0),
            ("b", _ts(5), 9.0)]
    return spark.createDataFrame(rows, "u string, ts timestamp, v double")


def test_sessionize_labels(events):
    out = sessionize(events, "ts", ["u"], gap_seconds=60.0)
    got = {(r["u"], r["ts"]): r["session_id"]
           for r in out.collect()}
    assert got[("a", _ts(0))] == 1
    assert got[("a", _ts(20))] == 1
    assert got[("a", _ts(420))] == 2
    assert got[("a", _ts(430))] == 2
    assert got[("b", _ts(5))] == 1


def test_sessionize_gap_boundary_exclusive(events):
    # gap == threshold does NOT start a new session (strictly greater)
    out = sessionize(events, "ts", ["u"], gap_seconds=400.0)
    got = {(r["u"], r["ts"]): r["session_id"] for r in out.collect()}
    assert got[("a", _ts(420))] == 1


def test_session_table(events):
    out = session_table(events, "ts", ["u"], 60.0, value_col="v")
    rows = {(r["u"], r["session_id"]): r for r in out.collect()}
    a1 = rows[("a", 1)]
    assert a1["n_events"] == 3
    assert a1["duration_seconds"] == pytest.approx(20.0)
    assert a1["sum_v"] == pytest.approx(6.0)
    assert a1["session_start"] == _ts(0) and a1["session_end"] == _ts(20)
    a2 = rows[("a", 2)]
    assert a2["n_events"] == 2 and a2["sum_v"] == pytest.approx(9.0)
    assert rows[("b", 1)]["n_events"] == 1
    assert rows[("b", 1)]["duration_seconds"] == pytest.approx(0.0)


# --------------------------------------------------------------- sampling
@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "s%d" % (i % 3), "x" * (i % 5 + 1)) for i in range(300)]
    return spark.createDataFrame(rows, "id long, src string, txt string")


def test_hash_sample_deterministic_and_partition_independent(docs):
    a = {r["id"] for r in hash_sample(docs, "id", 0.2).collect()}
    b = {r["id"] for r in
         hash_sample(docs.repartition(7), "id", 0.2).collect()}
    assert a == b
    assert 0.05 < len(a) / 300 < 0.4  # ~Binomial(300, .2)


def test_hash_sample_complement_partitions_exactly(docs):
    keep = {r["id"] for r in hash_sample(docs, "id", 0.7).collect()}
    # rows NOT in the 0.7 sample are exactly those >= the 0.7 threshold;
    # a 1.0 sample is everything
    assert {r["id"] for r in hash_sample(docs, "id", 1.0).collect()} \
        == {i for i in range(300)}
    sub = {r["id"] for r in hash_sample(docs, "id", 0.2).collect()}
    assert sub <= keep  # thresholds nest


def test_stratified_sample_rates(docs):
    out = stratified_sample(docs, "src", "id",
                            {"s0": 1.0, "s1": 0.0}, default_rate=0.5)
    got = [(r["src"], r["id"]) for r in out.collect()]
    srcs = {s for s, _ in got}
    assert "s1" not in srcs
    assert len([1 for s, _ in got if s == "s0"]) == 100  # rate 1.0 = all


def test_top_n_per_key_exact_and_stable(docs):
    out = top_n_per_key(docs, "src", "id", 7)
    got = out.groupBy("src").count().collect()
    assert {r["src"]: r["count"] for r in got} == \
        {"s0": 7, "s1": 7, "s2": 7}
    again = top_n_per_key(docs.repartition(5), "src", "id", 7)
    assert {tuple(r) for r in out.select("src", "id").collect()} == \
        {tuple(r) for r in again.select("src", "id").collect()}


def test_sample_bucket_expr_range(docs):
    out = docs.select(sample_bucket_expr(F.col("id").cast("string"), 10)
                      .alias("b"))
    vals = {r["b"] for r in out.collect()}
    assert vals <= set(range(10)) and len(vals) > 3


# ------------------------------------------------------------- repetition
def test_repetition_features(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"),            # one distinct word
         (2, "a b c d"),            # all distinct
         (3, "a b a b")],           # bigrams: 'a b' x2, 'b a' -> dup
        "id long, txt string")
    out = {r["id"]: r for r in
           repetition_features(df, "txt").collect()}
    assert out[1]["dup_word_frac"] == pytest.approx(0.75)
    assert out[1]["top_word_frac"] == pytest.approx(1.0)
    assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3)  # 'a a' x3
    assert out[2]["dup_word_frac"] == pytest.approx(0.0)
    assert out[2]["dup_2gram_frac"] == pytest.approx(0.0)
    assert out[2]["top_word_frac"] == pytest.approx(0.25)
    assert out[3]["dup_word_frac"] == pytest.approx(0.5)
    # bigrams of 'a b a b': ab ba ab -> 2 distinct of 3 positions
    assert out[3]["dup_2gram_frac"] == pytest.approx(1 / 3)


def test_repetition_short_doc_nulls(spark):
    df = spark.createDataFrame([(1, "word")], "id long, txt string")
    r = repetition_features(df, "txt").collect()[0]
    assert r["dup_word_frac"] == pytest.approx(0.0)
    assert r["dup_2gram_frac"] is None  # 0 bigram positions -> NULL
    assert r["dup_3gram_frac"] is None


# -------------------------------------------------------------------- PII
def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 10.1.2.3 "
             "ssn 123-45-6789 tel 555-123-4567 done")],
        "id long, txt string")
    r = redact_pii(df, "txt").collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_phone"]) \
        == (1, 1, 1, 1)
    assert r["txt_redacted"] == \
        "mail <EMAIL> or <IPV4> ssn <SSN> tel <PHONE> done"


def test_redact_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([(1, "no pii here at all")],
                               "id long, txt string")
    r = redact_pii(df, "txt").collect()[0]
    assert r["txt_redacted"] == "no pii here at all"
    assert r["n_email"] == 0 and r["n_phone"] == 0


def test_dedup_corpus_keeps_canonical_per_cluster(spark):
    """dedup_corpus keeps the min-id representative of each near-dup
    cluster and every unclustered doc: docs 1/2/3 are near-identical
    (one cluster -> keep 1), 10 and 20 are unique."""
    from orange3_timeseries_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the tall green fence nearby")
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, base + " more"),
        (10, "completely different words about spark catalyst optimizer "
             "plans shuffles partitions and adaptive execution engines"),
        (20, "yet another unrelated document mentioning parquet files "
             "column pruning predicate pushdown and row group statistics"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.2)
    out = dedup_corpus(df, pairs, "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 10, 20]


def test_substring_pairs_finds_planted_overlap(spark):
    """Two docs share a planted 200-char run inside otherwise-different
    text: the pair is reported with longest >= 200 (the proven span can
    only undershoot by the selection gap at the run edges); unrelated
    docs produce no pair."""
    import random

    from orange3_timeseries_spark.operators.dedup import substring_pairs

    rng = random.Random(42)

    def blob(k):
        return "".join(rng.choice("abcdefghij kmnopqrstuv") for _ in range(k))

    shared = blob(200)
    rows = [
        (1, blob(150) + shared + blob(120)),
        (2, blob(80) + shared + blob(200)),
        (3, blob(400)),
        (4, blob(350)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.longest
           for r in substring_pairs(df, "text", "doc_id",
                                    min_len=150).collect()}
    assert set(got) == {(1, 2)}
    # the merged diagonal run must cover (almost all of) the planted 200
    assert 150 <= got[(1, 2)] <= 220


def test_substring_pairs_ignores_short_overlaps(spark):
    """A shared run well below min_len yields nothing."""
    import random

    from orange3_timeseries_spark.operators.dedup import substring_pairs

    rng = random.Random(7)

    def blob(k):
        return "".join(rng.choice("abcdefghij kmnopqrstuv") for _ in range(k))

    shared = blob(60)
    rows = [(1, blob(200) + shared + blob(200)),
            (2, blob(150) + shared + blob(150))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert substring_pairs(df, "text", "doc_id",
                           min_len=150).collect() == []


def test_mix_corpus_rates_and_determinism(spark):
    """mix_corpus keeps ~budget*p_s of each listed source (never more
    than the source has), drops unlisted sources, and is a pure
    deterministic function of the data (same rows on re-run)."""
    from orange3_timeseries_spark.operators.sampling import mix_corpus

    rows = [(i, "a" if i < 400 else ("b" if i < 500 else "c"), 100)
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n long")
    # budget 20000 chars: a -> 50% of its 40000, b -> all of its 10000
    out = mix_corpus(df, "src", "doc_id", {"a": 0.5, "b": 0.5},
                     budget=20000.0, weight_col="n")
    got = out.groupBy("src").count().collect()
    by = {r.src: r["count"] for r in got}
    assert "c" not in by                       # unlisted -> dropped
    assert by["b"] == 100                      # rate clamped at 1.0
    assert 70 <= by["a"] <= 140                # rate 0.25 of 400, hash noise
    again = mix_corpus(df, "src", "doc_id", {"a": 0.5, "b": 0.5},
                       budget=20000.0, weight_col="n")
    assert sorted(r.doc_id for r in out.collect()) \
        == sorted(r.doc_id for r in again.collect())


def test_dedup_corpus_keep_by_prefers_richest(spark):
    """keep_by keeps the cluster member with the largest value (tie ->
    min id) instead of the min id."""
    from orange3_timeseries_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the tall green fence nearby")
    rows = [
        (1, base),
        (2, base + " with considerably more extra trailing context kept"),
        (3, base + " more"),
        (10, "completely different words about spark catalyst optimizer "
             "plans shuffles partitions and adaptive execution engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("n_chars", F.length("text"))
    pairs = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.2)
    kept = sorted(r["doc_id"] for r in
                  dedup_corpus(df, pairs, "doc_id",
                               keep_by="n_chars").collect())
    assert kept == [2, 10]   # doc 2 is the longest member of the cluster


# ------------------------------------------------- token-budget sampling
def test_token_budget_sample_cutoff(spark):
    from orange3_timeseries_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), 10) for i in range(40)], ["id", "src", "w"])
    out = token_budget_sample(df, "src", "id", "w", 95).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r.cum_weight)
    # 10-token docs against a 95 budget: exactly 9 kept per stratum,
    # running totals 10..90
    for cums in by_src.values():
        assert sorted(cums) == [10 * i for i in range(1, 10)]
    # deterministic: second run keeps the identical id set
    again = token_budget_sample(df, "src", "id", "w", 95).collect()
    assert {r.id for r in again} == {r.id for r in out}


def test_token_budget_sample_prefix_property(spark):
    """A smaller budget's keep-set is a prefix (subset) of a larger one."""
    from orange3_timeseries_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(i, "s", (i * 13) % 7 + 1) for i in range(50)],
        ["id", "src", "w"])
    small = {r.id for r in
             token_budget_sample(df, "src", "id", "w", 40).collect()}
    large = {r.id for r in
             token_budget_sample(df, "src", "id", "w", 120).collect()}
    assert small <= large


# ------------------------------------------------------- gopher rules
def test_gopher_quality_flags(spark):
    from orange3_timeseries_spark.operators.text import (
        gopher_quality_flags,
    )

    good = ("the quick brown fox jumps over that lazy dog and keeps "
            "running with steady pace to reach the distant hills of "
            "green valley where rivers flow and birds sing songs every "
            "morning the sun rises and light spreads across the fields "
            "while farmers work with care and patience to grow food")
    df = spark.createDataFrame(
        [(0, good),
         (1, "short text only"),                    # fails word count
         (2, " ".join(["zz"] * 60)),                # fails mean len + stops
         (3, " ".join(["12345"] * 60))],            # fails alpha + stops
        ["doc_id", "text"])
    rows = {r.doc_id: r for r in
            gopher_quality_flags(df, "text", "doc_id").collect()}
    assert rows[0].gopher_pass
    assert not rows[1].ok_word_count and not rows[1].gopher_pass
    assert not rows[2].ok_mean_len and not rows[2].ok_required_words
    assert not rows[3].ok_alpha and not rows[3].gopher_pass
    assert rows[0].stop_hits >= 2 and rows[0].ok_alpha


# ------------------------------------------------- cross-corpus leakage
def test_minhash_lsh_pairs_between(spark):
    from orange3_timeseries_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_between,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(0, base), (2, "totally different content here nothing shared"),
         (4, base + " lambda")], ["doc_id", "text"])
    test = spark.createDataFrame(
        [(1, base),                                     # exact dup of 0/4
         (3, "unrelated words entirely disjoint tokens")],
        ["doc_id", "text"])
    out = minhash_lsh_pairs_between(test, train, "text", "doc_id",
                                    threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 0) in pairs           # exact duplicate found across corpora
    assert all(a in (1, 3) and b in (0, 2, 4) for a, b in pairs)
    assert not any(a == 3 for a, _ in pairs)   # disjoint text never pairs
    # within-corpus pairs of the union equal the between-pairs plus the
    # within-side ones (consistency of the two plans)
    union = train.union(test)
    within = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
              for r in minhash_lsh_pairs(union, "text", "doc_id",
                                         threshold=0.5).collect()}
    assert {(min(a, b), max(a, b)) for a, b in pairs} <= within


# ------------------------------------------------- weighted sampling
def test_weighted_sample_bias_and_determinism(spark):
    from orange3_timeseries_spark.operators.sampling import (
        weighted_sample,
    )

    # half the keys carry 50x the weight — they should dominate the sample
    rows = [(i, "s", 500 if i % 2 == 0 else 10) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "src", "w"])
    out = weighted_sample(df, "src", "id", "w", 40).collect()
    assert len(out) == 40
    heavy = sum(1 for r in out if r.w == 500)
    assert heavy >= 30  # ~98% expected; 30 is a loose floor
    again = weighted_sample(df, "src", "id", "w", 40).collect()
    assert {r.id for r in again} == {r.id for r in out}


def test_weighted_sample_respects_strata(spark):
    from orange3_timeseries_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, f"s{i % 3}", i + 1) for i in range(90)]
    df = spark.createDataFrame(rows, ["id", "src", "w"])
    out = weighted_sample(df, "src", "id", "w", 7).collect()
    per = {}
    for r in out:
        per[r.src] = per.get(r.src, 0) + 1
    assert per == {"s0": 7, "s1": 7, "s2": 7}


# ------------------------------------------------------- corpus diff
def test_corpus_diff_statuses(spark):
    from orange3_timeseries_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gets dropped")],
        ["id", "text"])
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        ["id", "text"])
    got = {r.id: r.status
           for r in corpus_diff(old, new, "id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}


def test_corpus_diff_null_text(spark):
    """md5(NULL) is NULL — without the sentinel digest a present-but-null
    row reads 'removed' and null-vs-null reads 'unchanged' by accident."""
    from orange3_timeseries_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "keep"), (3, None)], "id long, text string")
    new = spark.createDataFrame(
        [(1, None), (2, "keep"), (3, "now text"), (4, None)],
        "id long, text string")
    got = {r.id: r.status
           for r in corpus_diff(old, new, "id", "text").collect()}
    assert got == {1: "unchanged", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from orange3_timeseries_spark.operators.sampling import weighted_sample

    rows = ([(i, "a", 5.0) for i in range(10)]
            + [(100, "a", 0.0), (101, "a", -3.0), (102, "a", None)])
    df = spark.createDataFrame(rows, "id long, src string, w double")
    got = {r.id for r in weighted_sample(df, "src", "id", "w", 50).collect()}
    assert got == set(range(10))  # degenerate weights never sampled


def test_driver_fast_path_byte_gate():
    from orange3_timeseries_spark.operators.dedup import (
        _driver_fast_path_ok,
    )

    # 1M edges of short numeric ids: well under a 1 GiB budget
    assert _driver_fast_path_ok(1_000_000, 8.0, 1 << 30)
    # 4M edges of 500-byte URL ids: under the 5M COUNT cap but ~9 GB of
    # driver strings — must take the distributed branch
    assert not _driver_fast_path_ok(4_000_000, 500.0, 1 << 30)


def test_dedup_clusters_distributed_branch_with_wide_ids(spark):
    """Zero driver budget forces the distributed label-propagation branch
    even for a tiny edge list; string-id components still resolve to the
    same labels the fast path gives."""
    from orange3_timeseries_spark.operators.dedup import dedup_clusters

    wide = [("doc_" + "x" * 200 + c, i) for c, i in
            [("a", 0), ("b", 1), ("c", 2), ("d", 3), ("e", 4)]]
    ids = [w for w, _ in wide]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    pairs = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[1], ids[2]), (ids[3], ids[4])],
        "id_a string, id_b string")
    fast = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    dist = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters(docs, pairs, "doc_id",
                                    driver_budget_bytes=0).collect()}
    assert fast == dist
    labels = dict(dist)
    assert labels[ids[1]] == labels[ids[0]] == labels[ids[2]]
    assert labels[ids[3]] == labels[ids[4]] != labels[ids[0]]


class TestTemperatureMix:
    def _corpus(self, spark):
        rows = []
        for s, n in [("a", 100), ("b", 25), ("c", 4), ("d", 1)]:
            rows += [(f"{s}{i}", s) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id string, source string")

    def test_exact_budget_and_largest_remainder(self, spark):
        import math

        from orange3_timeseries_spark.operators.sampling import (
            temperature_mix,
        )

        df = self._corpus(spark)
        out = temperature_mix(df, "source", "doc_id", budget=20,
                              alpha=0.5)
        got = {r.source: 0 for r in out.collect()}
        for r in out.collect():
            got[r.source] = got.get(r.source, 0) + 1
        assert sum(got.values()) == 20  # exact budget (no cap binds)
        # replay Hamilton apportionment on sqrt weights
        ns = {"a": 100, "b": 25, "c": 4, "d": 1}
        tot = sum(math.sqrt(n) for n in ns.values())
        ideal = {s: round(20 * math.sqrt(n) / tot, 6)
                 for s, n in ns.items()}
        base = {s: int(v) for s, v in ideal.items()}
        left = 20 - sum(base.values())
        for s in sorted(ideal, key=lambda s: (-(ideal[s] - base[s]), s))[
                :left]:
            base[s] += 1
        assert got == {s: v for s, v in base.items() if v > 0} or got == base

    def test_small_sources_upweighted_vs_proportional(self, spark):
        from orange3_timeseries_spark.operators.sampling import (
            temperature_mix,
        )

        df = self._corpus(spark)
        out = temperature_mix(df, "source", "doc_id", budget=20,
                              alpha=0.5).collect()
        shares = {}
        for r in out:
            shares[r.source] = shares.get(r.source, 0) + 1
        # proportional would give c: 20*4/130 = 0.6 -> ~1; sqrt gives more
        assert shares.get("c", 0) >= 1
        # and the big source contributes LESS than its raw share (15.4)
        assert shares["a"] < 15

    def test_cap_binds_small_source(self, spark):
        from orange3_timeseries_spark.operators.sampling import (
            temperature_mix,
        )

        rows = [(f"a{i}", "a") for i in range(100)] + [("b0", "b")]
        df = spark.createDataFrame(rows, "doc_id string, source string")
        out = temperature_mix(df, "source", "doc_id", budget=50,
                              alpha=0.5).collect()
        got = {}
        for r in out:
            got[r.source] = got.get(r.source, 0) + 1
        assert got["b"] == 1  # capped at source size

    def test_partitioning_invariant(self, spark):
        from orange3_timeseries_spark.operators.sampling import (
            temperature_mix,
        )

        df = self._corpus(spark)
        a = {r.doc_id for r in temperature_mix(
            df, "source", "doc_id", 20).collect()}
        b = {r.doc_id for r in temperature_mix(
            df.repartition(13), "source", "doc_id", 20).collect()}
        assert a == b


class TestNgramNovelty:
    def test_hand_computed(self, spark):
        from orange3_timeseries_spark.operators.dedup import (
            ngram_novelty,
        )

        docs = [
            (1, "the quick brown fox jumps"),      # all 3 trigrams novel
            (2, "the quick brown fox sleeps"),     # shares 2 of 3
            (3, "xx"),                             # too short: 0 shingles
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        rows = {r.doc_id: r for r in
                ngram_novelty(df, "text", "doc_id", n=3).collect()}
        assert rows[1].n_shingles == 3 and rows[1].n_novel == 3
        assert rows[1].novelty == 1.0
        assert rows[2].n_shingles == 3 and rows[2].n_novel == 1
        assert rows[2].novelty == pytest.approx(1 / 3, abs=1e-6)
        assert rows[3].n_shingles == 0 and rows[3].novelty is None

    def test_duplicate_doc_scores_zero(self, spark):
        from orange3_timeseries_spark.operators.dedup import (
            ngram_novelty,
        )

        text = "a b c d e f g h"
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id int, text string")
        rows = {r.doc_id: r for r in
                ngram_novelty(df, "text", "doc_id").collect()}
        assert rows[1].novelty == 1.0
        assert rows[2].novelty == 0.0
