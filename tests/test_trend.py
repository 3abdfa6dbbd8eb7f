"""Nonparametric trend tier: Mann-Kendall S/VarS/z against a direct
pairwise reference, Sen/Theil-Sen median-element semantics, Pettitt
rank arithmetic, and the series-length cap."""

import datetime as dt

import numpy as np
import pytest


def _ts_df(spark, values, user=1, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(start)
    rows = [(user, t0 + dt.timedelta(days=i),
             float(v) if v is not None else None)
            for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double")


def _mk_reference(values):
    """Direct O(n²) Mann-Kendall: S, tie-corrected VarS, corrected z."""
    y = np.asarray(values, dtype=float)
    n = len(y)
    s = sum(np.sign(y[j] - y[i])
            for i in range(n) for j in range(i + 1, n))
    _, counts = np.unique(y, return_counts=True)
    tie = sum(t * (t - 1) * (2 * t + 5) for t in counts)
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    if var <= 0:
        return s, var, None
    if s > 0:
        z = (s - 1) / np.sqrt(var)
    elif s < 0:
        z = (s + 1) / np.sqrt(var)
    else:
        z = 0.0
    return s, var, z


class TestMannKendall:
    def test_monotone_series(self, spark):
        from orange3_timeseries_spark.operators.trend import mann_kendall

        vals = [2.0 * i for i in range(12)]
        out = mann_kendall(_ts_df(spark, vals), "ts", "value",
                          ["user_id"]).collect()
        assert len(out) == 1
        r = out[0]
        n = 12
        assert r.s_stat == n * (n - 1) // 2       # every pair concordant
        assert r.trend == "increasing" and r.significant_5pct
        # all pairwise slopes are exactly 2.0 per day
        assert r.sen_slope == pytest.approx(2.0, abs=1e-9)
        s, var, z = _mk_reference(vals)
        assert r.var_s == pytest.approx(var, abs=1e-6)
        assert r.z == pytest.approx(z, abs=1e-5)

    def test_tie_correction_and_noise(self, spark):
        from orange3_timeseries_spark.operators.trend import mann_kendall

        rng = np.random.RandomState(7)
        vals = np.round(rng.standard_normal(40), 1)  # forces y ties
        vals[5] = vals[6] = vals[7]                  # a 3-tie group
        out = mann_kendall(_ts_df(spark, vals.tolist()), "ts", "value",
                          ["user_id"]).collect()
        assert len(out) == 1
        s, var, z = _mk_reference(vals)
        r = out[0]
        assert r.s_stat == s
        assert r.var_s == pytest.approx(var, abs=1e-6)
        assert r.z == pytest.approx(z, abs=1e-5)

    def test_constant_series_dropped(self, spark):
        from orange3_timeseries_spark.operators.trend import mann_kendall

        out = mann_kendall(_ts_df(spark, [3.0] * 10), "ts", "value",
                          ["user_id"])
        assert out.count() == 0  # VarS = 0: statistic undefined

    def test_decreasing_verdict(self, spark):
        from orange3_timeseries_spark.operators.trend import mann_kendall

        vals = [-(1.5 * i) for i in range(15)]
        r = mann_kendall(_ts_df(spark, vals), "ts", "value",
                        ["user_id"]).collect()[0]
        assert r.trend == "decreasing" and r.z < 0
        assert r.sen_slope == pytest.approx(-1.5, abs=1e-9)

    def test_max_n_cap_drops_long_series(self, spark):
        from orange3_timeseries_spark.operators.trend import mann_kendall

        df = _ts_df(spark, list(range(12)))
        assert mann_kendall(df, "ts", "value", ["user_id"],
                            max_n=10).count() == 0
        assert mann_kendall(df, "ts", "value", ["user_id"],
                            max_n=12).count() == 1


class TestTheilSen:
    def test_robust_to_outliers(self, spark):
        from orange3_timeseries_spark.operators.trend import theil_sen

        vals = [3.0 + 2.0 * i for i in range(21)]
        vals[4] = 500.0
        vals[15] = -400.0                     # 2/21 contamination
        r = theil_sen(_ts_df(spark, vals), "ts", "value",
                      ["user_id"]).collect()[0]
        assert r.n_obs == 21
        assert r.slope_per_day == pytest.approx(2.0, abs=1e-6)
        assert r.intercept == pytest.approx(3.0, abs=1e-6)

    def test_lower_median_element_selection(self, spark):
        from orange3_timeseries_spark.operators.trend import theil_sen

        # 3 points, daily: pairwise slopes (1->2)=1, (2->3)=5, (1->3)=3
        # lower median of [1,3,5] is 3; intercept anchored at day 0
        vals = [0.0, 1.0, 6.0]
        r = theil_sen(_ts_df(spark, vals), "ts", "value",
                      ["user_id"]).collect()[0]
        assert r.slope_per_day == pytest.approx(3.0, abs=1e-9)
        # levels y_i - 3*x_i = [0, -2, 0] -> sorted [-2, 0, 0], lower
        # median element = index (3+1)//2 = 2nd -> 0.0
        assert r.intercept == pytest.approx(0.0, abs=1e-9)


def _pettitt_reference(values):
    """Direct Pettitt: average ranks, U_t, K, change index, p."""
    y = np.asarray(values, dtype=float)
    n = len(y)
    order = np.argsort(y, kind="stable")
    ranks = np.empty(n)
    # average ranks with ties
    sorted_y = y[order]
    i = 0
    while i < n:
        j = i
        while j < n and sorted_y[j] == sorted_y[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    cr = np.cumsum(ranks)
    t = np.arange(1, n + 1)
    u = 2 * cr - t * (n + 1)
    k_idx = int(np.argmax(np.abs(u[:-1])))
    k = abs(u[k_idx])
    p = min(1.0, 2 * np.exp(-6 * k * k / (n ** 3 + n ** 2)))
    return k, k_idx, p


class TestPettitt:
    def test_step_change_detected(self, spark):
        from orange3_timeseries_spark.operators.trend import pettitt_test

        vals = [0.0] * 15 + [5.0] * 15
        r = pettitt_test(_ts_df(spark, vals), "ts", "value",
                         ["user_id"]).collect()[0]
        k, k_idx, p = _pettitt_reference(vals)
        assert r.k_stat == pytest.approx(k, abs=1e-9)
        # change point reported at the last pre-shift observation
        assert r.change_ts == dt.datetime(2024, 1, 1) \
            + dt.timedelta(days=k_idx)
        assert r.p_value == pytest.approx(p, abs=1e-6)
        assert r.significant_5pct

    def test_ties_use_average_ranks(self, spark):
        from orange3_timeseries_spark.operators.trend import pettitt_test

        rng = np.random.RandomState(11)
        vals = np.round(rng.standard_normal(30), 1).tolist()
        r = pettitt_test(_ts_df(spark, vals), "ts", "value",
                         ["user_id"]).collect()[0]
        k, k_idx, p = _pettitt_reference(vals)
        assert r.k_stat == pytest.approx(k, abs=1e-9)
        assert r.p_value == pytest.approx(p, abs=1e-6)

    def test_no_change_not_significant(self, spark):
        from orange3_timeseries_spark.operators.trend import pettitt_test

        rng = np.random.RandomState(5)
        vals = rng.standard_normal(40).tolist()   # i.i.d., no shift
        r = pettitt_test(_ts_df(spark, vals), "ts", "value",
                         ["user_id"]).collect()[0]
        assert not r.significant_5pct

    def test_multiple_series_parallel(self, spark):
        from orange3_timeseries_spark.operators.trend import pettitt_test

        a = _ts_df(spark, [0.0] * 10 + [9.0] * 10, user=1)
        b = _ts_df(spark, list(np.random.RandomState(2)
                               .standard_normal(20)), user=2)
        out = {r.user_id: r
               for r in pettitt_test(a.union(b), "ts", "value",
                                     ["user_id"]).collect()}
        assert set(out) == {1, 2}
        assert out[1].significant_5pct


# ------------------------------------------------------------- Hurst R/S
class TestHurstRS:
    def _run(self, spark, values, scales=(8, 16, 32)):
        from orange3_timeseries_spark.operators.trend import hurst_rs

        df = _ts_df(spark, values)
        return hurst_rs(df, "ts", "value", ["user_id"],
                        scales=scales).collect()

    def test_matches_numpy_reference(self, spark):
        rng = np.random.RandomState(7)
        vals = np.round(rng.uniform(10, 200, 96), 2)
        row = self._run(spark, vals.tolist())[0]
        for n, col in ((8, "rs8"), (16, "rs16"), (32, "rs32")):
            rss = []
            for b in range(len(vals) // n):
                blk = vals[b * n:(b + 1) * n]
                z = np.cumsum(blk - blk.mean())
                r = z.max() - z.min()
                s = blk.std()
                if s > 0:
                    rss.append(r / s)
            assert row[col] == pytest.approx(np.mean(rss), abs=1e-5)
        expected_h = (np.log(row["rs32"]) - np.log(row["rs8"])) \
            / (np.log(32) - np.log(8))
        assert row["hurst"] == pytest.approx(expected_h, abs=1e-5)

    def test_trend_beats_alternating(self, spark):
        trend = [round(10 + 1.37 * i, 2) for i in range(96)]
        alt = [100.0 if i % 2 else 50.0 for i in range(96)]
        h_trend = self._run(spark, trend)[0]["hurst"]
        h_alt = self._run(spark, alt)[0]["hurst"]
        assert h_trend > 0.9          # persistent ramp
        assert h_alt < h_trend        # antipersistent flip-flop

    def test_constant_blocks_dropped(self, spark):
        # constant series: every block has zero variance, so the series
        # drops entirely (R/S undefined) — same convention as
        # mann_kendall's VarS = 0 drop, mirrored by the SQL oracle
        assert self._run(spark, [42.0] * 64) == []

    def test_short_series_partial_scales(self, spark):
        # 20 obs: two blocks at 8, one at 16, none at 32
        rng = np.random.RandomState(3)
        row = self._run(spark,
                        np.round(rng.uniform(1, 9, 20), 2).tolist())[0]
        assert row["rs8"] is not None and row["rs16"] is not None
        assert row["rs32"] is None and row["hurst"] is None
