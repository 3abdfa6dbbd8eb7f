"""Mann-Whitney U test and day-of-week ANOVA."""

import datetime as dt
import math

import numpy as np
import pytest

from orange3_timeseries_spark.operators.stattests import (
    dow_anova,
    mann_whitney,
)


def _mw_df(spark, pos, neg, g="a"):
    rows = [(g, int(v), True) for v in pos] \
        + [(g, int(v), False) for v in neg]
    return spark.createDataFrame(rows, "g string, su long, y boolean")


class TestMannWhitney:
    def test_shifted_samples_significant(self, spark):
        rng = np.random.RandomState(0)
        pos = rng.randint(200, 400, 50)
        neg = rng.randint(0, 200, 50)
        row = mann_whitney(_mw_df(spark, pos, neg), "su", "y",
                           ["g"]).collect()[0]
        assert row["auc"] > 0.9 and row["significant_5pct"]
        assert row["z"] > 1.959964

    def test_identical_distributions_not_flagged(self, spark):
        rng = np.random.RandomState(1)
        pos = rng.randint(0, 100, 200)
        neg = rng.randint(0, 100, 200)
        row = mann_whitney(_mw_df(spark, pos, neg), "su", "y",
                           ["g"]).collect()[0]
        assert abs(row["z"]) < 1.959964
        assert 0.4 < row["auc"] < 0.6

    def test_matches_scipy_free_reference(self, spark):
        rng = np.random.RandomState(2)
        pos = rng.randint(0, 30, 40)       # heavy ties
        neg = rng.randint(5, 35, 45)
        row = mann_whitney(_mw_df(spark, pos, neg), "su", "y",
                           ["g"]).collect()[0]
        allv = np.concatenate([pos, neg])
        order = np.argsort(allv, kind="stable")
        ranks = np.empty(len(allv))
        sv = allv[order]
        i = 0
        while i < len(allv):
            j = i
            while j < len(allv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        r1 = ranks[:len(pos)].sum()
        n1, n2 = len(pos), len(neg)
        n = n1 + n2
        u = r1 - n1 * (n1 + 1) / 2
        _, t_counts = np.unique(allv, return_counts=True)
        tie = np.sum(t_counts ** 3 - t_counts)
        var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
        z = (u - n1 * n2 / 2) / math.sqrt(var)
        assert row["u_stat"] == pytest.approx(u)
        assert row["z"] == pytest.approx(z, abs=1e-6)
        assert row["auc"] == pytest.approx(u / (n1 * n2), abs=1e-6)

    def test_min_each_filter(self, spark):
        out = mann_whitney(_mw_df(spark, [1, 2, 3], range(50)), "su",
                           "y", ["g"])
        assert out.count() == 0


def _ts_df(spark, day_vals, sid="a"):
    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = [(sid, base + dt.timedelta(days=d, hours=h), float(v))
            for d, h, v in day_vals]
    return spark.createDataFrame(rows, "sid string, ts timestamp, "
                                       "v double")


class TestDowAnova:
    def test_strong_weekly_pattern_flagged(self, spark):
        rng = np.random.RandomState(3)
        rows = []
        for d in range(70):
            for h in (1, 13):
                dow = (d + 0) % 7
                rows.append((d, h, 10.0 * dow + rng.normal(0, 0.5)))
        row = dow_anova(_ts_df(spark, rows), "ts", "v",
                        ["sid"]).collect()[0]
        assert row["seasonal_5pct"] and row["f_stat"] > 100
        assert row["eta_sq"] > 0.9

    def test_flat_series_not_flagged(self, spark):
        rng = np.random.RandomState(4)
        rows = [(d, h, rng.normal(50, 5))
                for d in range(70) for h in (1, 13)]
        row = dow_anova(_ts_df(spark, rows), "ts", "v",
                        ["sid"]).collect()[0]
        assert not row["seasonal_5pct"]
        assert row["eta_sq"] < 0.15

    def test_matches_direct_anova(self, spark):
        rng = np.random.RandomState(5)
        rows = [(d, h, round(rng.normal(20 + (d % 7), 3), 2))
                for d in range(63) for h in (2, 14)]
        row = dow_anova(_ts_df(spark, rows), "ts", "v",
                        ["sid"]).collect()[0]
        # direct reference on the quantized units
        groups = {}
        for d, h, v in rows:
            groups.setdefault(d % 7, []).append(round(v * 100))
        allv = [x for g in groups.values() for x in g]
        n = len(allv)
        mean = sum(allv) / n
        sst = sum((x - mean) ** 2 for x in allv)
        ssb = sum(len(g) * (sum(g) / len(g) - mean) ** 2
                  for g in groups.values())
        f = (ssb / 6) / ((sst - ssb) / (n - 7))
        assert row["f_stat"] == pytest.approx(f, rel=1e-5)
        assert row["eta_sq"] == pytest.approx(ssb / sst, abs=1e-5)

    def test_missing_weekday_dropped(self, spark):
        rows = [(d, 1, float(d)) for d in range(60) if d % 7 != 3]
        out = dow_anova(_ts_df(spark, rows), "ts", "v", ["sid"],
                        min_n=30)
        assert out.count() == 0


class TestKruskalDow:
    def test_agrees_with_anova_on_planted_pattern(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            kruskal_dow,
        )
        rng = np.random.RandomState(6)
        rows = [(d, h, 10.0 * (d % 7) + rng.normal(0, 0.5))
                for d in range(70) for h in (1, 13)]
        row = kruskal_dow(_ts_df(spark, rows), "ts", "v",
                          ["sid"]).collect()[0]
        assert row["seasonal_5pct"] and row["h_stat"] > 50

    def test_flat_not_flagged(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            kruskal_dow,
        )
        rng = np.random.RandomState(7)
        rows = [(d, h, rng.normal(50, 5))
                for d in range(70) for h in (1, 13)]
        row = kruskal_dow(_ts_df(spark, rows), "ts", "v",
                          ["sid"]).collect()[0]
        assert not row["seasonal_5pct"]

    def test_matches_direct_h(self, spark):
        from orange3_timeseries_spark.operators.stattests import (
            kruskal_dow,
        )
        rng = np.random.RandomState(8)
        rows = [(d, h, round(rng.normal(20 + (d % 7), 3), 2))
                for d in range(63) for h in (2, 14)]
        row = kruskal_dow(_ts_df(spark, rows), "ts", "v",
                          ["sid"]).collect()[0]
        vals = [(d % 7, round(v * 100)) for d, h, v in rows]
        allv = sorted(v for _, v in vals)
        import collections
        # average ranks
        pos = {}
        i = 0
        while i < len(allv):
            j = i
            while j < len(allv) and allv[j] == allv[i]:
                j += 1
            pos[allv[i]] = (i + 1 + j) / 2
            i = j
        rsums = collections.defaultdict(float)
        ns = collections.Counter()
        for dcls, v in vals:
            rsums[dcls] += pos[v]
            ns[dcls] += 1
        n = len(vals)
        h = (12 / (n * (n + 1))
             * sum(rsums[d] ** 2 / ns[d] for d in rsums)
             - 3 * (n + 1))
        counts = collections.Counter(v for _, v in vals)
        tie = sum(t ** 3 - t for t in counts.values())
        h /= 1 - tie / (n ** 3 - n)
        assert row["h_stat"] == pytest.approx(h, rel=1e-6)

    def test_robust_to_outliers_where_anova_is_not(self, spark):
        # one absurd outlier: ANOVA eta collapses, KW barely moves
        from orange3_timeseries_spark.operators.stattests import (
            kruskal_dow,
        )
        rng = np.random.RandomState(9)
        rows = [(d, h, 10.0 * (d % 7) + rng.normal(0, 0.5))
                for d in range(70) for h in (1, 13)]
        rows[3] = (rows[3][0], rows[3][1], 1e7)
        kw = kruskal_dow(_ts_df(spark, rows), "ts", "v",
                         ["sid"]).collect()[0]
        av = dow_anova(_ts_df(spark, rows), "ts", "v",
                       ["sid"]).collect()[0]
        assert kw["seasonal_5pct"]          # rank test still sees it
        assert av["eta_sq"] < 0.2           # variance test blinded


class TestDowAnovaPerfectPeriod:
    def test_zero_ssw_flagged_seasonal_with_null_f(self, spark):
        # exactly periodic: every weekday has one constant value
        rows = [(d, h, float(10 * (d % 7))) for d in range(70)
                for h in (1, 13)]
        row = dow_anova(_ts_df(spark, rows), "ts", "v",
                        ["sid"]).collect()[0]
        assert row["seasonal_5pct"]
        assert row["f_stat"] is None          # F = +inf, emitted NULL
        assert row["eta_sq"] == pytest.approx(1.0)

    def test_constant_series_dropped(self, spark):
        rows = [(d, 1, 5.0) for d in range(70)]
        assert dow_anova(_ts_df(spark, rows), "ts", "v",
                         ["sid"]).count() == 0
