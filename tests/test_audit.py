"""Join-coverage audit (operators/audit.py) — the reusable check for
the round-9 silent-row-drop class (sf0.1 embeddings cover 2000/5000
documents; any inner join quietly discarded 60% of the corpus)."""

import pytest

from orange3_timeseries_spark.operators.audit import coverage_audit


def _rows(df):
    return {r["side"]: r.asDict() for r in df.collect()}


class TestCoverageAudit:
    def test_partial_overlap_with_duplicates(self, spark):
        left = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "v"])
        right = spark.createDataFrame(
            [(2, "x"), (2, "y"), (9, "z")], ["k", "w"])
        out = _rows(coverage_audit(left, right, "k"))
        l, r = out["left"], out["right"]
        assert l["n_rows"] == 4 and l["n_keys"] == 3
        assert l["matched_rows"] == 1 and l["matched_keys"] == 1
        assert l["row_share"] == pytest.approx(0.25)
        assert l["key_share"] == pytest.approx(1 / 3)
        assert r["n_rows"] == 3 and r["n_keys"] == 2
        assert r["matched_rows"] == 2 and r["matched_keys"] == 1
        assert r["row_share"] == pytest.approx(2 / 3)

    def test_null_keys_never_match(self, spark):
        left = spark.createDataFrame(
            [(None, "a"), (None, "b"), (1, "c")],
            "k int, v string")
        right = spark.createDataFrame(
            [(None, "x"), (1, "y")], "k int, w string")
        out = _rows(coverage_audit(left, right, "k"))
        l, r = out["left"], out["right"]
        # NULL keys count into n_rows/null_key_rows but never match
        assert l["n_rows"] == 3 and l["null_key_rows"] == 2
        assert l["matched_rows"] == 1 and l["n_keys"] == 1
        assert r["n_rows"] == 2 and r["null_key_rows"] == 1
        assert r["matched_rows"] == 1

    def test_disjoint_and_empty(self, spark):
        left = spark.createDataFrame([(1,), (2,)], ["k"])
        right = spark.createDataFrame([(8,), (9,)], ["k"])
        out = _rows(coverage_audit(left, right, "k"))
        assert out["left"]["matched_rows"] == 0
        assert out["left"]["row_share"] == 0.0
        empty = right.where("k < 0")
        out2 = _rows(coverage_audit(left, empty, "k",
                                    labels=("l", "r")))
        assert out2["r"]["n_rows"] == 0
        assert out2["r"]["row_share"] is None  # 0/0 is undefined
        assert out2["l"]["matched_rows"] == 0

    def test_composite_and_renamed_keys(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 10.0), (1, "b", 11.0), (2, "a", 12.0)],
            ["g", "h", "v"])
        right = spark.createDataFrame(
            [(1, "a", 1), (2, "b", 2)], ["gg", "hh", "w"])
        out = _rows(coverage_audit(left, right, ["g", "h"],
                                   ["gg", "hh"]))
        assert out["left"]["matched_rows"] == 1
        assert out["right"]["matched_rows"] == 1
        assert out["left"]["n_keys"] == 3
        with pytest.raises(ValueError, match="equal length"):
            coverage_audit(left, right, ["g", "h"], ["gg"])

    def test_curate_pipeline_expected_coverage(self, spark):
        # the audit the two-modality curate queries rely on: at every
        # shipped SF the embeddings table's vec_id domain is a PREFIX
        # of doc_id, so embeddings-side coverage is 100% while the
        # documents side may be partial (0.4 at sf0.1) — the inner-join
        # drop the curate queries must anti-join around
        from orange3_timeseries_spark.sources import read_table

        sf = "/root/testdata/sf0.001"
        d = read_table(spark, sf, "documents")
        e = read_table(spark, sf, "embeddings")
        out = _rows(coverage_audit(d, e, "doc_id", "vec_id",
                                   labels=("documents", "embeddings")))
        assert out["embeddings"]["row_share"] == 1.0
        assert out["documents"]["matched_rows"] == \
            out["embeddings"]["n_rows"]
        assert out["documents"]["null_key_rows"] == 0
