"""Query-registry integrity: the @query decorator must fail loudly on a
duplicate name (a silent overwrite de-verifies the earlier registration —
the r9 ``hurst_rs_by_user`` incident: the octave-scale rewrite reused the
r7b single-scale query's name, so the driver ledger kept showing the OLD
semantics as green while the NEW ones were never checked)."""

import pytest


def _registry():
    import __spark_entry__  # noqa: F401  (registers every query module)
    from orange3_timeseries_spark import queries as q
    return q


class TestQueryRegistry:
    def test_duplicate_registration_raises(self):
        q = _registry()

        @q.query("__dup_probe__", None)
        def first(spark, sf_dir):  # pragma: no cover - never called
            return None

        try:
            with pytest.raises(ValueError, match="duplicate @query"):
                @q.query("__dup_probe__", None)
                def second(spark, sf_dir):  # pragma: no cover
                    return None
        finally:
            q.QUERIES.pop("__dup_probe__", None)
            q.ORACLE_SQL.pop("__dup_probe__", None)

    def test_both_hurst_variants_registered(self):
        # one name = one query: the single-scale r7b estimator and the
        # octave-scale r9 estimator each own a distinct registry row
        q = _registry()
        assert "hurst_rs_by_user" in q.QUERIES
        assert "hurst_rs_scales_by_user" in q.QUERIES
        assert "hurst_rs_by_user" in q.ORACLE_SQL
        assert "hurst_rs_scales_by_user" in q.ORACLE_SQL

    def test_every_query_callable_and_named(self):
        q = _registry()
        for name, fn in q.QUERIES.items():
            assert callable(fn), name
        # every oracle belongs to a registered query
        assert set(q.ORACLE_SQL) <= set(q.QUERIES)
