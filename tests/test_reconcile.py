"""Hierarchical forecast reconciliation (operators/reconcile.py)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.reconcile import (
    reconcile_forecasts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, d, 12, 0), k, v) for d, k, v in rows],
        "ts timestamp, user_id long, value double")


class TestReconcileForecasts:
    def test_known_values(self, spark):
        # 14 days, two users; last day = Jan 14, season 7 → h maps to
        # Jan 8..14; user 1 active daily, user 2 only on Jan 10
        rows = [(d, 1, 10.0 + d) for d in range(1, 15)]
        rows += [(10, 2, 50.0)]
        out = {(r.user_id, r.h): (r.bu_fc, r.td_fc)
               for r in reconcile_forecasts(
                   _ev(spark, rows), "ts", "user_id", "value",
                   horizon=7, season=7, share_window=28).collect()}
        assert len(out) == 14  # 2 users × 7 horizons
        # bu: user 1 h=1 → Jan 8 value = 18; user 2 h=3 → Jan 10 = 50
        assert out[(1, 1)][0] == 18.0
        assert out[(2, 3)][0] == 50.0
        assert out[(2, 1)][0] == 0.0  # no Jan 8 row for user 2
        # td: total units over window = sum(11..24)*100 + 5000;
        # user 2 share = 5000/tot; total sn for h=3 = (20+50)*100
        tot28 = sum(range(11, 25)) * 100 + 5000
        td = round(7000 * 5000 / tot28 / 100.0, 6)
        assert out[(2, 3)][1] == pytest.approx(td, abs=1e-12)

    def test_bottom_up_coherent_with_aggregate(self, spark):
        rows = [(d, k, float(k * d)) for d in range(1, 15)
                for k in (1, 2, 3) if (d + k) % 3]
        out = reconcile_forecasts(_ev(spark, rows), "ts", "user_id",
                                  "value")
        ev = _ev(spark, rows)
        # Σ_key bu_fc(h) must equal the aggregate seasonal-naive:
        # the daily TOTAL one season back
        got = {r.h: r.s for r in
               out.groupBy("h").agg(F.sum("bu_fc").alias("s"))
               .collect()}
        daily_tot = {r.d.day: r.s for r in
                     ev.groupBy(F.date_trunc("day", "ts").alias("d"))
                     .agg(F.sum("value").alias("s")).collect()}
        for h in range(1, 8):
            assert got[h] == pytest.approx(
                daily_tot.get(7 + h, 0.0), abs=1e-9)

    def test_td_shares_sum_to_total(self, spark):
        rows = [(d, k, 5.0 + d + k) for d in range(1, 15)
                for k in (1, 2)]
        out = reconcile_forecasts(_ev(spark, rows), "ts", "user_id",
                                  "value")
        bu = {r.h: r.s for r in out.groupBy("h")
              .agg(F.sum("bu_fc").alias("s")).collect()}
        td = {r.h: r.s for r in out.groupBy("h")
              .agg(F.sum("td_fc").alias("s")).collect()}
        for h in range(1, 8):
            # proportional split preserves the aggregate (± 6dp round)
            assert td[h] == pytest.approx(bu[h], abs=1e-5)

    def test_horizon_beyond_season_raises(self, spark):
        with pytest.raises(ValueError, match="horizon"):
            reconcile_forecasts(_ev(spark, [(1, 1, 1.0)]), "ts",
                                "user_id", "value", horizon=8,
                                season=7)

    def test_null_values_dropped(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, d, 1), 1,
              None if d == 8 else 2.0) for d in range(1, 15)],
            "ts timestamp, user_id long, value double")
        out = {r.h: r.bu_fc
               for r in reconcile_forecasts(df, "ts", "user_id",
                                            "value").collect()}
        assert out[1] == 0.0    # Jan 8 had only a NULL row
        assert out[2] == 2.0
