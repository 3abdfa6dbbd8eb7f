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
