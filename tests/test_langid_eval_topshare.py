"""Language-ID confusion/metrics queries and Lorenz top-decile share."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e
    return e.queries()


class TestLangidEval:
    def test_confusion_totals_match_corpus(self, spark, qs):
        conf = qs["langid_confusion"](spark, SF).toPandas()
        from orange3_timeseries_spark.sources import read_table
        n_docs = read_table(spark, SF, "documents").count()
        assert conf.n.sum() == n_docs
        assert (conf.n > 0).all()

    def test_metrics_consistent_with_confusion(self, spark, qs):
        conf = qs["langid_confusion"](spark, SF).toPandas()
        met = qs["langid_class_metrics"](spark, SF).toPandas() \
            .set_index("cls")
        gold_tot = conf.groupby("gold").n.sum()
        pred_tot = conf.groupby("pred").n.sum()
        diag = conf[conf.gold == conf.pred].set_index("gold").n
        for cls, row in met.iterrows():
            assert row.n_gold == gold_tot[cls]
            assert row.n_pred == pred_tot.get(cls, 0)
            tp = int(diag.get(cls, 0))
            assert row.tp == tp
            assert row.recall == pytest.approx(
                round(tp / gold_tot[cls], 6))
            if row.n_pred > 0:
                assert row.precision == pytest.approx(
                    round(tp / row.n_pred, 6))
            assert row.f1 == pytest.approx(
                round(2 * tp / (row.n_gold + row.n_pred), 6))

    def test_gold_classes_all_present(self, spark, qs):
        met = qs["langid_class_metrics"](spark, SF).toPandas()
        assert set(met.cls) == {"en", "es", "fr", "de", "zh"}


class TestTopShare:
    def test_matches_pandas(self, spark, qs):
        import pandas as pd
        out = qs["top_share_by_source"](spark, SF).toPandas() \
            .set_index("source")
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        for src, g in docs.groupby("source"):
            sz = g.n_chars.sort_values(ascending=False)
            n = len(sz)
            k = (n + 9) // 10
            share = sz.head(k).sum() / sz.sum()
            row = out.loc[src]
            assert row.n_docs == n and row.top_k == k
            assert row.top_decile_share == pytest.approx(
                round(share, 6))

    def test_share_at_least_uniform(self, spark, qs):
        # top decile always holds >= ~its proportional share
        out = qs["top_share_by_source"](spark, SF).toPandas()
        assert (out.top_decile_share
                >= out.top_k / out.n_docs - 1e-9).all()
