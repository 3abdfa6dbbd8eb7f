"""CCNet-style segment-level exact deduplication."""

import pytest

from orange3_timeseries_spark.operators.dedup import paragraph_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = ("this is the standard navigation header that repeats "
          "everywhere.")


class TestParagraphDedup:
    def test_boilerplate_survives_only_first(self, spark):
        rows = [
            (1, BOILER + " unique first body sentence here."),
            (2, BOILER + " a different unique second body."),
            (3, BOILER + " and a third distinct body sentence."),
        ]
        out = {r["doc_id"]: r for r in
               paragraph_dedup(_df(spark, rows), "text",
                               "doc_id").collect()}
        assert out[1]["n_kept"] == 2              # boiler + body
        assert out[2]["n_kept"] == 1 and out[3]["n_kept"] == 1
        assert BOILER in out[1]["kept_text"].lower()
        assert BOILER not in out[2]["kept_text"].lower()
        assert "different unique second" in out[2]["kept_text"]

    def test_short_segments_pass_through(self, spark):
        rows = [(1, "Yes. A genuinely long unique sentence one here."),
                (2, "Yes. Another genuinely long unique sentence two.")]
        out = {r["doc_id"]: r for r in
               paragraph_dedup(_df(spark, rows), "text",
                               "doc_id").collect()}
        # "Yes." is under min_len -> kept in BOTH docs
        assert out[1]["n_kept"] == 2 and out[2]["n_kept"] == 2

    def test_first_introducer_is_min_doc_then_pos(self, spark):
        dup = "the exact same long repeated sentence appears twice."
        rows = [(5, "opening unique line for document five. " + dup),
                (2, dup + " closing unique line for document two.")]
        out = {r["doc_id"]: r for r in
               paragraph_dedup(_df(spark, rows), "text",
                               "doc_id").collect()}
        assert dup in out[2]["kept_text"].lower()      # doc 2 < doc 5
        assert dup not in out[5]["kept_text"].lower()

    def test_all_unique_keeps_everything(self, spark):
        rows = [(1, "alpha sentence number one is long enough. "
                    "beta sentence number two is also long enough.")]
        row = paragraph_dedup(_df(spark, rows), "text",
                              "doc_id").collect()[0]
        assert row["n_segments"] == row["n_kept"] == 2
        assert row["kept_ratio"] == 1.0

    def test_case_and_space_normalized(self, spark):
        s = "This Long Sentence Repeats With Different Casing Here."
        rows = [(1, s), (2, s.lower()), (3, "  " + s.upper())]
        out = {r["doc_id"]: r["n_kept"] for r in
               paragraph_dedup(_df(spark, rows), "text",
                               "doc_id").collect()}
        assert out == {1: 1, 2: 0, 3: 0}
