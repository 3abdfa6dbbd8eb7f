"""BPE tokenizer training/encoding: merge-order goldens, greedy-merge
semantics (including repeated-symbol runs), Catalyst encode vs an
independent list-based greedy reference."""

import pytest


def _ref_encode(word, merges):
    """Independent greedy left-to-right BPE application on a symbol
    LIST — the textbook semantics, no string tricks."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class TestTrain:
    def test_known_merge_order(self, spark):
        rows = [("ab ab ab abc abc abc abcd abcd abcd",)]
        df = spark.createDataFrame(rows, "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        merges = train_bpe(df, "text", n_merges=3)
        assert merges[0] == ("a", "b")
        assert merges[1] == ("ab", "c")
        assert merges[2] == ("abc", "d")

    def test_tie_breaks_lexicographic(self, spark):
        df = spark.createDataFrame([("xy xy pq pq",)], "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        merges = train_bpe(df, "text", n_merges=1)
        assert merges[0] == ("p", "q")

    def test_repeated_run_counts_positions_merges_greedy(self, spark):
        # 'aaa': pair (a,a) counts 2 (positions); greedy merge -> [aa, a]
        df = spark.createDataFrame([("aaa aaa ab",)], "text string")
        from orange3_timeseries_spark.operators.bpe import (
            train_bpe,
            word_count_table,
        )

        merges = train_bpe(df, "text", n_merges=1)
        assert merges[0] == ("a", "a")
        wc = {r.w: r.cnt for r in
              word_count_table(df, "text").collect()}
        assert wc == {"aaa": 2, "ab": 1}
        assert _ref_encode("aaa", merges) == ["aa", "a"]

    def test_even_run_merges_every_pair(self, spark):
        """'aaaa' must become [aa, aa] — the anchored-replace pitfall a
        shared-separator symbol encoding falls into (it yields
        [aa, a, a]); the wrapped representation matches the greedy
        reference, end to end through the Spark encoder."""
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
            train_bpe,
        )
        df = spark.createDataFrame(
            [(1, "aaaa aaaa aaaaaa")], "doc_id long, text string")
        merges = train_bpe(df, "text", n_merges=1)
        assert merges == [("a", "a")]
        assert _ref_encode("aaaa", merges) == ["aa", "aa"]
        assert _ref_encode("aaaaaa", merges) == ["aa", "aa", "aa"]
        [r] = bpe_doc_token_counts(df, "doc_id", "text",
                                   merges).collect()
        assert r.n_tokens == 2 + 2 + 3

    def test_stops_when_no_pairs_left(self, spark):
        df = spark.createDataFrame([("a b a b",)], "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        assert train_bpe(df, "text", n_merges=5) == []


class TestEncode:
    def test_doc_token_counts_match_greedy_reference(self, spark):
        rows = [(1, "hello hello world"), (2, "world of worlds"),
                (3, "hello world hello world"), (4, "aaaa abab aabb")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
            train_bpe,
        )

        merges = train_bpe(df, "text", n_merges=6)
        got = {r.doc_id: r.n_tokens for r in
               bpe_doc_token_counts(df, "doc_id", "text", merges)
               .collect()}
        want = {i: sum(len(_ref_encode(w, merges)) for w in text.split())
                for i, text in rows}
        assert got == want

    def test_oov_fallback_under_binding_cap(self, spark):
        df = spark.createDataFrame(
            [(1, "aa aa aa zzz")], "doc_id long, text string")
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
            train_bpe,
        )

        merges = train_bpe(df, "text", n_merges=1, max_vocab=1)
        assert merges == [("a", "a")]
        [r] = bpe_doc_token_counts(df, "doc_id", "text", merges,
                                   max_vocab=1).collect()
        assert r.n_tokens == 3 * 1 + 3  # 'aa' x3 as 1 token; 'zzz' OOV

    def test_shared_word_counts_single_pass(self, spark):
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
            train_bpe,
            word_count_table,
        )
        df = spark.createDataFrame(
            [(1, "x y x"), (2, "y z")], "doc_id long, text string")
        wc = word_count_table(df, "text").localCheckpoint()
        merges = train_bpe(df, "text", n_merges=2, word_counts=wc)
        out = {r.doc_id: r.n_tokens for r in
               bpe_doc_token_counts(df, "doc_id", "text", merges,
                                    word_counts=wc).collect()}
        assert out == {1: 3, 2: 2}

    def test_encode_is_catalyst_only(self, spark):
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
        )
        df = spark.createDataFrame([(1, "ab ab")],
                                   "doc_id long, text string")
        out = bpe_doc_token_counts(df, "doc_id", "text", [("a", "b")])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestPinnedSF001Golden:
    """Pinned golden against the driver's sf0.01 ``documents`` fixture.

    Round-5's driver window hash-red on ``bpe_doc_token_counts`` caught
    mid-round encode code; this locks the END state — the exact merge
    list the 16-merge trainer produces on that corpus and a sha256 over
    the full (doc_id, n_tokens) multiset — so any future encode/train
    semantics drift fails HERE, independent of driver sampling timing.
    Values were cross-checked against the DuckDB oracle replay
    (scripts/oracle_check.py sf0.01: PASS, 500 rows).
    """

    SF_DIR = "/root/testdata/sf0.01"
    EXPECTED_MERGES = [
        ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
        ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
        ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
        ("r", "ow"),
    ]
    EXPECTED_SHA256 = (
        "06a4bc3f20bde6309794d040477a0db28792c78fa3c264ecad6d3b8298c291a8")
    EXPECTED_N_DOCS = 500
    EXPECTED_TOTAL_TOKENS = 92306
    EXPECTED_HEAD = {0: 97, 1: 260, 2: 168, 3: 93, 4: 155}

    pytestmark = pytest.mark.skipif(
        not __import__("os").path.isdir(SF_DIR),
        reason="driver testdata not present")

    def test_sf001_token_counts_pinned(self, spark):
        import hashlib

        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts, train_bpe, word_count_table)
        from orange3_timeseries_spark.sources.readers import read_table

        d = read_table(spark, self.SF_DIR, "documents")
        wc = word_count_table(d, "text").localCheckpoint()
        merges = train_bpe(d, "text", n_merges=16, word_counts=wc)
        assert merges == self.EXPECTED_MERGES

        rows = sorted(
            (r["doc_id"], r["n_tokens"])
            for r in bpe_doc_token_counts(
                d, "doc_id", "text", merges, word_counts=wc).collect())
        assert len(rows) == self.EXPECTED_N_DOCS
        for doc_id, n in rows[:5]:
            assert self.EXPECTED_HEAD[doc_id] == n
        assert sum(n for _, n in rows) == self.EXPECTED_TOTAL_TOKENS
        digest = hashlib.sha256(
            "\n".join(f"{d_}:{n}" for d_, n in rows).encode()).hexdigest()
        assert digest == self.EXPECTED_SHA256
