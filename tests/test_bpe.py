"""BPE tokenizer training/encoding: merge-order goldens, run-merge
semantics, Catalyst encode vs a plain-Python reference."""

import pytest


def _py_encode(word, merges):
    s = " " + " ".join(word) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return [t for t in s.split() if t]


class TestTrain:
    def test_known_merge_order(self, spark):
        # 'ab' appears in every word (count 9), then 'abc' (6)
        rows = [("ab ab ab abc abc abc abcd abcd abcd",)]
        df = spark.createDataFrame(rows, "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        merges = train_bpe(df, "text", n_merges=3)
        assert merges[0] == ("a", "b")
        assert merges[1] == ("ab", "c")
        assert merges[2] == ("abc", "d")

    def test_tie_breaks_lexicographic(self, spark):
        # 'xy' and 'pq' both count 2 -> ('p','q') wins the tie
        df = spark.createDataFrame([("xy xy pq pq",)], "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        merges = train_bpe(df, "text", n_merges=1)
        assert merges[0] == ("p", "q")

    def test_repeated_run_counts_positions_merges_greedy(self, spark):
        # 'aaa': pair (a,a) counts 2 (positions), merge yields 'aa a'
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
        assert _py_encode("aaa", merges) == ["aa", "a"]

    def test_stops_when_no_pairs_left(self, spark):
        df = spark.createDataFrame([("a b a b",)], "text string")
        from orange3_timeseries_spark.operators.bpe import train_bpe

        # single-char words have no adjacent pairs at all
        assert train_bpe(df, "text", n_merges=5) == []


class TestEncode:
    def test_doc_token_counts_match_python_reference(self, spark):
        rows = [(1, "hello hello world"), (2, "world of worlds"),
                (3, "hello world hello world")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from orange3_timeseries_spark.operators.bpe import (
            bpe_doc_token_counts,
            train_bpe,
        )

        merges = train_bpe(df, "text", n_merges=6)
        got = {r.doc_id: r.n_tokens for r in
               bpe_doc_token_counts(df, "doc_id", "text", merges)
               .collect()}
        want = {}
        for i, text in rows:
            want[i] = sum(len(_py_encode(w, merges))
                          for w in text.split())
        assert got == want

    def test_oov_fallback_under_binding_cap(self, spark):
        # cap the vocab to 1 word: the other word is out-of-vocabulary
        # and falls back to its character count
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
        # 'aa' -> 1 token x3; 'zzz' OOV -> 3 chars
        assert r.n_tokens == 3 * 1 + 3

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
        assert "FlatMapsInPandas" not in plan
