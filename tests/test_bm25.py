"""BM25 top-k retrieval (operators/retrieval.py): planted-relevance
goldens, a literal scoring replay, and determinism contracts."""

import math

import pytest

from orange3_timeseries_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, text string")


def _ref_score(query_tokens, doc_tokens, corpus, k1=1.2, b=0.75):
    """Literal replica of the operator's micro-unit pipeline: per-term
    double with the documented association, HALF_UP round to 1e-6
    units, exact integer sum."""
    import decimal

    n = len(corpus)
    avgdl = float(sum(len(d) for d in corpus)) / float(n)
    dl = float(len(doc_tokens))
    units = 0
    matched = 0
    for t in set(query_tokens):
        tf = float(doc_tokens.count(t))
        if tf == 0:
            continue
        matched += 1
        df = sum(1 for d in corpus if t in d)
        idf = math.log((float(n - df) + 0.5) / (float(df) + 0.5) + 1.0)
        norm = k1 * ((1.0 - b) + b * (dl / avgdl))
        term = idf * ((tf * (k1 + 1.0)) / (tf + norm)) * 1e6
        units += int(decimal.Decimal(repr(term)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
    return units, matched


class TestBM25:
    CORPUS = [(1, "apple banana apple"),
              (2, "apple orange pear plum"),
              (3, "kiwi melon")]

    def test_planted_relevance_ranks_first(self, spark):
        # doc 1 has both query terms and the higher tf — must be rank 1;
        # doc 3 shares no token — must be absent
        out = bm25_topk(_docs(spark, self.CORPUS),
                        _queries(spark, [(100, "apple banana")]),
                        top_k=10).collect()
        by_rank = {r["rank"]: r for r in out}
        assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] \
            == [1, 2]
        assert by_rank[1]["n_terms"] == 2 and by_rank[2]["n_terms"] == 1

    def test_scores_match_literal_replay(self, spark):
        toks = [t[1].split() for t in self.CORPUS]
        out = {r["doc_id"]: r for r in
               bm25_topk(_docs(spark, self.CORPUS),
                         _queries(spark, [(100, "apple banana")]),
                         top_k=10).collect()}
        for doc_id, dtoks in zip((1, 2), toks):
            units, matched = _ref_score("apple banana".split(), dtoks, toks)
            assert out[doc_id]["score"] == units / 1e6, doc_id
            assert out[doc_id]["n_terms"] == matched

    def test_tie_breaks_on_doc_id(self, spark):
        # identical docs score identically (exact integer units) and
        # must order by doc_id ascending
        docs = [(7, "alpha beta"), (3, "alpha beta"), (9, "alpha beta")]
        out = sorted(bm25_topk(_docs(spark, docs),
                               _queries(spark, [(1, "alpha")]),
                               top_k=10).collect(),
                     key=lambda r: r["rank"])
        assert [r["doc_id"] for r in out] == [3, 7, 9]
        assert len({r["score"] for r in out}) == 1

    def test_top_k_truncates(self, spark):
        docs = [(i, "common word%d" % i) for i in range(20)]
        out = bm25_topk(_docs(spark, docs),
                        _queries(spark, [(1, "common")]),
                        top_k=5).collect()
        assert len(out) == 5
        assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]

    def test_unmatched_query_yields_no_rows(self, spark):
        out = bm25_topk(_docs(spark, self.CORPUS),
                        _queries(spark, [(1, "zebra xylophone")]),
                        top_k=5).collect()
        assert out == []

    def test_repeated_query_terms_count_once(self, spark):
        # binary-qtf BM25: "apple apple" == "apple"
        a = bm25_topk(_docs(spark, self.CORPUS),
                      _queries(spark, [(1, "apple apple")]), top_k=5)
        b = bm25_topk(_docs(spark, self.CORPUS),
                      _queries(spark, [(1, "apple")]), top_k=5)
        sa = sorted((r["doc_id"], r["score"], r["n_terms"])
                    for r in a.collect())
        sb = sorted((r["doc_id"], r["score"], r["n_terms"])
                    for r in b.collect())
        assert sa == sb

    def test_shorter_doc_outranks_longer_at_equal_tf(self, spark):
        # the b-length normalization: same tf, shorter doc wins
        docs = [(1, "target filler filler filler filler filler"),
                (2, "target filler")]
        out = sorted(bm25_topk(_docs(spark, docs),
                               _queries(spark, [(1, "target")]),
                               top_k=5).collect(),
                     key=lambda r: r["rank"])
        assert [r["doc_id"] for r in out] == [2, 1]


# ------------------------------------------------------------------ RRF
class TestRrfFuse:
    def _ranks(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, rank int")

    def test_fusion_scores_and_tiebreak(self, spark):
        from orange3_timeseries_spark.operators.retrieval import rrf_fuse

        a = self._ranks(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
        b = self._ranks(spark, [(1, 11, 1), (1, 13, 2)])
        out = {r["doc_id"]: r for r in
               rrf_fuse([a, b], k=60, top_k=10).collect()}
        # doc 11 appears in both rankers
        assert out[11]["score"] == pytest.approx(1 / 62 + 1 / 61, abs=0)
        assert out[11]["rrf_rank"] == 1
        # doc 10 (rank 1 in a only) vs doc 13 (rank 2 in b only)
        assert out[10]["score"] == pytest.approx(1 / 61, abs=0)
        assert out[13]["score"] == pytest.approx(1 / 62, abs=0)
        assert out[10]["rrf_rank"] == 2
        # missing-ranker rank columns surface as NULL
        assert out[10]["rank_2"] is None and out[13]["rank_1"] is None

    def test_score_tie_breaks_on_doc_id(self, spark):
        from orange3_timeseries_spark.operators.retrieval import rrf_fuse

        a = self._ranks(spark, [(1, 20, 1), (1, 30, 2)])
        b = self._ranks(spark, [(1, 30, 1), (1, 20, 2)])
        out = sorted(rrf_fuse([a, b], top_k=5).collect(),
                     key=lambda r: r["rrf_rank"])
        # symmetric ranks -> equal scores -> doc_id ascending wins
        assert [r["doc_id"] for r in out] == [20, 30]

    def test_single_ranking_rejected(self, spark):
        from orange3_timeseries_spark.operators.retrieval import rrf_fuse

        a = self._ranks(spark, [(1, 10, 1)])
        with pytest.raises(ValueError, match="at least two"):
            rrf_fuse([a])


class TestBm25IndexRegistry:
    CORPUS = [(1, "apple banana cherry apple"),
              (2, "banana date elderberry"),
              (3, "cherry cherry fig grape apple"),
              (4, "quantum flux capacitor"),
              (5, "apple grape")]
    QS = [(100, "apple cherry"), (200, "banana grape fig")]

    def _index(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            read_bm25_index,
            write_bm25_index,
        )

        idx = bm25_build_index(_docs(spark, self.CORPUS), n_buckets=8)
        path = str(tmp_path / "bm25_index")
        write_bm25_index(idx, path)
        return read_bm25_index(spark, path)

    def test_served_bit_identical_to_live(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_topk_from_index,
        )

        qs = _queries(spark, self.QS)
        live = bm25_topk(_docs(spark, self.CORPUS), qs, top_k=4)
        served = bm25_topk_from_index(self._index(spark, tmp_path), qs,
                                      top_k=4)
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        lrows = sorted(live.collect(), key=key)
        srows = sorted(served.collect(), key=key)
        assert len(lrows) > 0
        # EXACT equality, score double included — the registry contract
        assert [tuple(r) for r in lrows] == [tuple(r) for r in srows]

    def test_bucket_prune_changes_nothing(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_topk_from_index,
        )

        idx = self._index(spark, tmp_path)
        qs = _queries(spark, self.QS)
        a = bm25_topk_from_index(idx, qs, top_k=4, prune_buckets=True)
        b = bm25_topk_from_index(idx, qs, top_k=4, prune_buckets=False)
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        assert sorted(map(tuple, a.collect()), key=lambda t: t[:3]) == \
            sorted(map(tuple, b.collect()), key=lambda t: t[:3])

    def test_serve_plan_prunes_partitions_and_skips_corpus(
            self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_topk_from_index,
        )

        served = bm25_topk_from_index(self._index(spark, tmp_path),
                                      _queries(spark, self.QS), top_k=4)
        plan = served._jdf.queryExecution().executedPlan().toString()
        # the serve scan must read the persisted index with a bucket
        # partition filter (prints `bucket = N` for one bucket,
        # `bucket IN (...)` for several)...
        import re
        assert re.search(r"PartitionFilters: \[[^\]]*bucket#\d+ (=|IN)",
                         plan), plan[:2000]
        # ...and the only parquet scans are the three index state
        # tables (postings, token_df, stats) — the corpus is never
        # re-read or re-tokenized at serve time (paths are truncated
        # in toString, so count scans rather than parsing locations)
        assert plan.count("FileScan parquet") == 3, plan[:2000]
        assert "text:string" not in plan  # no doc text enters the plan

    def test_index_state_tables_shape(self, spark, tmp_path):
        idx = self._index(spark, tmp_path)
        [st] = idx.stats.collect()
        assert st.n_docs == 5 and st.n_buckets == 8
        assert st.sum_dl == sum(len(t.split()) for _, t in self.CORPUS)
        post = {(r.token, r.doc_id): (r.tf, r.dl)
                for r in idx.postings.collect()}
        assert post[("apple", 1)] == (2, 4)
        assert post[("cherry", 3)][0] == 2
        dfs = {r.token: r.df for r in idx.token_df.collect()}
        assert dfs["apple"] == 3 and dfs["quantum"] == 1


class TestBm25MergeIndex:
    def test_merge_equals_rebuild_bit_identical(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_merge_index,
            bm25_topk_from_index,
            read_bm25_index,
            write_bm25_index,
        )

        corpus = TestBm25IndexRegistry.CORPUS
        qs = _queries(spark, TestBm25IndexRegistry.QS)
        half_a = _docs(spark, [r for r in corpus if r[0] % 2 == 0])
        half_b = _docs(spark, [r for r in corpus if r[0] % 2 == 1])

        merged = bm25_merge_index(
            bm25_build_index(half_a, n_buckets=8), half_b)
        mp = str(tmp_path / "merged")
        write_bm25_index(merged, mp)
        served_m = bm25_topk_from_index(read_bm25_index(spark, mp), qs,
                                        top_k=4)

        full = bm25_build_index(_docs(spark, corpus), n_buckets=8)
        fp = str(tmp_path / "full")
        write_bm25_index(full, fp)
        served_f = bm25_topk_from_index(read_bm25_index(spark, fp), qs,
                                        top_k=4)

        key = lambda t: (t[0], t[2])  # noqa: E731  (query, rank)
        assert sorted(map(tuple, served_m.collect()), key=key) == \
            sorted(map(tuple, served_f.collect()), key=key)
        # merged state tables equal the rebuilt ones exactly
        assert sorted(map(tuple, merged.token_df.collect())) == \
            sorted(map(tuple, full.token_df.collect()))
        assert merged.stats.first() == full.stats.first()

    def test_merged_df_adds_across_halves(self, spark):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_merge_index,
        )

        a = _docs(spark, [(1, "apple pie"), (2, "apple tart")])
        b = _docs(spark, [(3, "apple crumble"), (4, "banana split")])
        merged = bm25_merge_index(bm25_build_index(a, n_buckets=4), b)
        dfs = {r.token: r.df for r in merged.token_df.collect()}
        assert dfs["apple"] == 3 and dfs["banana"] == 1
        st = merged.stats.first()
        assert st.n_docs == 4 and st.sum_dl == 8 and st.n_buckets == 4

    def test_merge_rejects_duplicate_ids(self, spark):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index,
            bm25_merge_index,
        )

        a = _docs(spark, [(1, "apple pie"), (2, "apple tart")])
        again = _docs(spark, [(2, "apple tart"), (3, "new doc")])
        base = bm25_build_index(a, n_buckets=4)
        with pytest.raises(ValueError, match="already[ ]indexed"):
            bm25_merge_index(base, again)
        # explicit opt-out still merges (caller proved disjointness —
        # or accepts the corruption)
        merged = bm25_merge_index(base, again, check_disjoint=False)
        assert merged.stats.first().n_docs == 4


class TestBm25Params:
    def test_id_col_round_trips_through_params(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index, read_bm25_index, write_bm25_index,
        )

        docs = spark.createDataFrame(
            [(1, "apple banana"), (2, "banana cherry")],
            "url long, text string")
        idx = bm25_build_index(docs, id_col="url", n_buckets=4)
        path = str(tmp_path / "bm25_url")
        write_bm25_index(idx, path)
        got = read_bm25_index(spark, path)   # no id_col passed
        assert got.id_col == "url"
        assert {r.url for r in got.postings.collect()} == {1, 2}


class TestTokenlessDocs:
    def test_tokenless_doc_counted_and_guarded(self, spark, tmp_path):
        from orange3_timeseries_spark.operators.retrieval import (
            bm25_build_index, bm25_merge_index, bm25_topk_from_index,
            read_bm25_index, write_bm25_index,
        )

        # NULL text is the genuinely token-LESS case (whitespace-only
        # text tokenizes to [""], which always had a posting): before
        # the sentinel, a NULL-text doc had NO postings row, so the
        # merge guard could not see it
        docs = spark.createDataFrame(
            [(1, "apple banana"), (2, None), (3, "banana cherry")],
            "doc_id long, text string")
        idx = bm25_build_index(docs, n_buckets=4)
        # the sentinel makes postings cover EVERY id
        assert {r.doc_id for r in idx.postings.collect()} == {1, 2, 3}
        [st] = idx.stats.collect()
        # sum_dl keeps the live path's exact semantics (size(NULL) is
        # -1 under this session's legacy sizeOfNull): 2 - 1 + 2
        assert st.n_docs == 3 and st.sum_dl == 3
        # re-ingesting the token-less id is now caught by the guard
        with pytest.raises(ValueError, match="already indexed"):
            bm25_merge_index(idx, spark.createDataFrame(
                [(2, "sneaky reingest")], "doc_id long, text string"))
        # persisted stats derive from postings and round-trip exactly;
        # the sentinel never scores
        path = str(tmp_path / "bm25_tokenless")
        write_bm25_index(idx, path)
        got = read_bm25_index(spark, path)
        [pst] = got.stats.collect()
        assert (pst.n_docs, pst.sum_dl, pst.n_buckets) == (3, 3, 4)
        assert got.n_buckets == 4
        qs = _queries(spark, [(9, "banana")])
        served = bm25_topk_from_index(got, qs, top_k=5).collect()
        assert {r.doc_id for r in served} == {1, 3}


class TestRetrievalEval:
    def test_known_values_zero_hit_rows_and_unjudged_drop(self, spark):
        import math

        from orange3_timeseries_spark.operators.retrieval import (
            retrieval_eval,
        )

        ranking = spark.createDataFrame(
            [("q1", 5, 1), ("q1", 1, 2), ("q1", 7, 3), ("q1", 2, 4),
             ("q2", 9, 1), ("q2", 8, 2),
             ("q3", 1, 1)],                     # q3 has NO judgments
            "query_id string, doc_id long, rank int")
        qrels = spark.createDataFrame(
            [("q1", 1), ("q1", 2), ("q1", 3), ("q1", 2),  # dup judgment
             ("q2", 42)],
            "query_id string, doc_id long")
        out = {r["query_id"]: r for r in
               retrieval_eval(ranking, qrels, k=10).collect()}
        assert set(out) == {"q1", "q2"}         # unjudged q3 dropped

        u = lambda i: round(1e6 / math.log2(i + 1))  # noqa: E731
        r1 = out["q1"]
        assert (r1["n_rel"], r1["n_hits"]) == (3, 2)
        assert r1["recall_at_k"] == 2.0 / 3.0
        assert r1["mrr"] == 0.5                 # first hit at rank 2
        assert r1["ndcg_at_k"] == (u(2) + u(4)) / float(u(1) + u(2)
                                                        + u(3))
        r2 = out["q2"]                          # judged, zero hits
        assert (r2["n_rel"], r2["n_hits"]) == (1, 0)
        assert (r2["recall_at_k"], r2["mrr"], r2["ndcg_at_k"]) == \
            (0.0, 0.0, 0.0)

    def test_rank_beyond_k_ignored(self, spark):
        from orange3_timeseries_spark.operators.retrieval import (
            retrieval_eval,
        )

        ranking = spark.createDataFrame(
            [("q1", 1, 3)], "query_id string, doc_id long, rank int")
        qrels = spark.createDataFrame(
            [("q1", 1)], "query_id string, doc_id long")
        row = retrieval_eval(ranking, qrels, k=2).collect()[0]
        assert row["n_hits"] == 0 and row["mrr"] == 0.0
        row = retrieval_eval(ranking, qrels, k=3).collect()[0]
        assert row["n_hits"] == 1 and row["mrr"] == 1.0 / 3.0
        assert row["recall_at_k"] == 1.0
