"""PSI drift gate: identical vs shifted distributions, decomposition
invariants, plan purity (edges stay in the plan, no collect)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


class TestPSI:
    def test_identical_distribution_scores_zero(self, spark):
        from orange3_timeseries_spark.operators.drift import psi_drift

        rng = np.random.RandomState(0)
        vals = rng.standard_normal(4000)
        out = psi_drift(_df(spark, vals[:2000]), _df(spark, vals[2000:]),
                        "v").collect()
        assert len(out) == 10
        psi = out[0].psi
        assert all(r.psi == psi for r in out)  # total repeated per row
        assert psi < 0.05  # same distribution: stable
        # reference buckets hold ~equal mass by construction
        for r in out:
            assert r.p_ref == pytest.approx(0.1, abs=0.02)
        # contribs sum to the total
        assert sum(r.contrib for r in out) == pytest.approx(psi, abs=1e-9)

    def test_shifted_distribution_flags(self, spark):
        from orange3_timeseries_spark.operators.drift import psi_drift

        rng = np.random.RandomState(1)
        ref = rng.standard_normal(2000)
        cur = rng.standard_normal(2000) + 1.5  # full sigma-and-a-half shift
        out = psi_drift(_df(spark, ref), _df(spark, cur), "v").collect()
        assert out[0].psi > 0.25  # action threshold

    def test_empty_buckets_stay_finite(self, spark):
        from orange3_timeseries_spark.operators.drift import psi_drift

        ref = _df(spark, np.linspace(0, 1, 500))
        cur = _df(spark, np.linspace(10, 11, 500))  # disjoint support
        out = psi_drift(ref, cur, "v").collect()
        assert len(out) == 10
        assert np.isfinite(out[0].psi)
        # everything lands in the top bucket on the current side
        top = [r for r in out if r.bucket == 10][0]
        assert top.p_cur == pytest.approx(1.0)

    def test_plan_no_python_no_collect(self, spark):
        from orange3_timeseries_spark.operators.drift import psi_drift

        out = psi_drift(_df(spark, range(100)), _df(spark, range(100)),
                        "v")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # HOF bucketing, no UDF


class TestKsDrift:
    def _two(self, spark, a, b):
        ra = [(float(v),) for v in a]
        rb = [(float(v),) for v in b]
        return (spark.createDataFrame(ra, "value double"),
                spark.createDataFrame(rb, "value double"))

    @staticmethod
    def _exact_d(a, b):
        import numpy as np

        a, b = np.sort(a), np.sort(b)
        allv = np.sort(np.unique(np.concatenate([a, b])))
        f1 = np.searchsorted(a, allv, side="right") / len(a)
        f2 = np.searchsorted(b, allv, side="right") / len(b)
        return np.max(np.abs(f1 - f2))

    def test_matches_exact_ecdf_gap(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.drift import ks_drift

        rng = np.random.RandomState(3)
        a = rng.standard_normal(200)
        b = rng.standard_normal(150) + 0.8
        ref, cur = self._two(spark, a, b)
        row = ks_drift(ref, cur, "value").collect()[0]
        assert row.n_ref == 200 and row.n_cur == 150
        assert row.ks_stat == pytest.approx(self._exact_d(a, b),
                                            abs=1e-6)
        assert row.drifted  # 0.8 sigma shift at n=200/150 is decisive

    def test_identical_samples_not_drifted(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.drift import ks_drift

        rng = np.random.RandomState(4)
        a = rng.standard_normal(300)
        ref, cur = self._two(spark, a, a)
        row = ks_drift(ref, cur, "value").collect()[0]
        assert row.ks_stat == 0.0
        assert row.p_value == 1.0
        assert not row.drifted

    def test_ties_evaluated_after_full_value_mass(self, spark):
        from orange3_timeseries_spark.operators.drift import ks_drift

        # heavy ties: ref all 1.0, cur half 1.0 half 2.0 ->
        # D at value 1.0 is |1 - 0.5| = 0.5 (after all ties), not 1.0
        ref, cur = self._two(spark, [1.0] * 10, [1.0] * 5 + [2.0] * 5)
        row = ks_drift(ref, cur, "value").collect()[0]
        assert row.ks_stat == pytest.approx(0.5, abs=1e-9)

    def test_grouped(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.drift import ks_drift

        rng = np.random.RandomState(5)
        rows_ref, rows_cur = [], []
        for g, shift in [("a", 0.0), ("b", 2.0)]:
            for v in rng.standard_normal(120):
                rows_ref.append((g, float(v)))
            for v in rng.standard_normal(120) + shift:
                rows_cur.append((g, float(v)))
        ref = spark.createDataFrame(rows_ref, "g string, value double")
        cur = spark.createDataFrame(rows_cur, "g string, value double")
        out = {r.g: r for r in ks_drift(ref, cur, "value",
                                        ["g"]).collect()}
        assert not out["a"].drifted and out["b"].drifted
