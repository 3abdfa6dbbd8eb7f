"""Burstiness / Benford / compaction-plan / spectral-entropy operators."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.eventstats import (
    BENFORD_P,
    benford_digits,
    burstiness,
    first_digit,
)
from orange3_timeseries_spark.operators.sharding import compaction_plan


def _ts_rows(sid, seconds):
    t0 = dt.datetime(2024, 1, 1)
    return [(sid, t0 + dt.timedelta(seconds=float(s))) for s in seconds]


class TestBurstiness:
    def test_periodic_stream_is_b_minus_one(self, spark):
        # perfectly regular gaps: sigma=0 -> B = (0-m)/(0+m) = -1
        df = spark.createDataFrame(_ts_rows("a", range(0, 100, 10)),
                                   ["sid", "ts"])
        row = burstiness(df, "ts", ["sid"]).collect()[0]
        assert row["burstiness"] == pytest.approx(-1.0)
        assert row["regime"] == "periodic"
        assert row["n_gaps"] == 9
        assert row["mean_gap_s"] == pytest.approx(10.0)
        # zero-variance marginal: memory coefficient NULL, not NaN
        assert row["memory_coef"] is None

    def test_bursty_stream_flags_bursty(self, spark):
        # long silences + tight bursts: sigma >> mu
        secs, t = [], 0.0
        for burst in range(12):
            for _ in range(5):
                t += 1.0
                secs.append(t)
            t += 600.0
            secs.append(t)
        df = spark.createDataFrame(_ts_rows("a", secs), ["sid", "ts"])
        row = burstiness(df, "ts", ["sid"]).collect()[0]
        # 5:1 burst/silence mix gives B≈0.38 (σ≈223, μ≈101)
        assert row["burstiness"] > 0.3
        assert row["regime"] == "bursty"

    def test_matches_direct_numpy(self, spark):
        rng = np.random.RandomState(7)
        secs = np.cumsum(rng.exponential(30.0, size=80)).round(0)
        secs = np.unique(secs)
        df = spark.createDataFrame(_ts_rows("a", secs), ["sid", "ts"])
        row = burstiness(df, "ts", ["sid"]).collect()[0]
        gaps = np.diff(secs)
        m, s = round(gaps.mean(), 6), round(gaps.std(), 6)
        assert row["burstiness"] == pytest.approx(
            round((s - m) / (s + m), 6), abs=1e-9)
        mem = np.corrcoef(gaps[:-1], gaps[1:])[0, 1]
        assert row["memory_coef"] == pytest.approx(mem, abs=1e-5)

    def test_short_series_dropped(self, spark):
        df = spark.createDataFrame(_ts_rows("a", range(0, 50, 10)),
                                   ["sid", "ts"])
        assert burstiness(df, "ts", ["sid"]).count() == 0


class TestBenford:
    def test_first_digit_edges(self, spark):
        vals = [(1, 123.456), (2, 0.2), (3, 100.0), (4, 999.99),
                (5, 0.000001), (6, -730.0), (7, 0.0), (8, None),
                (9, 1e16), (10, 2e-7), (11, 1.0), (12, 0.0999999)]
        df = spark.createDataFrame(vals, ["i", "v"])
        got = {r["i"]: r["d"] for r in df.select(
            "i", first_digit(F.col("v")).alias("d")).collect()}
        assert got == {1: 1, 2: 2, 3: 1, 4: 9, 5: 1, 6: 7,
                       7: None, 8: None, 9: None, 10: None,
                       11: 1, 12: 9}

    def test_benford_sample_passes_uniform_fails(self, spark):
        # 2^k leading digits are classic Benford-conforming (chi2≈0.15
        # for this fixed k-range); uniform 1..9 is maximally non-Benford.
        # Keep the magnitude inside the [1e-6, 1e15) digit-gate by
        # truncating the exact decimal rendering to 10 digits — leading
        # digit preserved exactly.
        benford_vals = [(float(str(2 ** k)[:10]), "pow2")
                        for k in range(1, 400)]
        uniform_vals = [(float(d), "unif")
                        for d in range(1, 10) for _ in range(60)]
        df = spark.createDataFrame(
            [(v, g) for v, g in benford_vals + uniform_vals], ["v", "g"])
        rows = {r["g"]: r for r in
                benford_digits(df, "v", ["g"]).collect()}
        assert bool(rows["pow2"]["benford_ok"])
        assert not bool(rows["unif"]["benford_ok"])
        assert rows["unif"]["chi2"] > rows["pow2"]["chi2"]

    def test_chi2_matches_direct(self, spark):
        vals = [float(x) for x in range(1, 300)]
        df = spark.createDataFrame([(v, "g") for v in vals], ["v", "g"])
        row = benford_digits(df, "v", ["g"]).collect()[0]
        digs = [int(str(int(v))[0]) for v in vals]
        n = len(digs)
        units = 0
        for d in range(1, 10):
            e = n * BENFORD_P[d]
            o = digs.count(d)
            units += int(round((o - e) * (o - e) / e * 1e6))
        assert row["chi2"] == pytest.approx(units / 1e6, abs=1e-9)
        assert row["n_values"] == n

    def test_min_n_drop(self, spark):
        df = spark.createDataFrame([(float(i), "g") for i in range(1, 20)],
                                   ["v", "g"])
        assert benford_digits(df, "v", ["g"]).count() == 0


class TestCompactionPlan:
    def test_binning_rule(self, spark):
        # dir A sizes desc: 900, 500, 400, 300, 200 -> offsets
        # 0,900,1400,1800,2100; target 1000 -> bins 0,0,1,1,2
        rows = [(1, "A", 500), (2, "A", 900), (3, "A", 400),
                (4, "A", 300), (5, "A", 200), (6, "B", 50)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "sz"])
        out = {r["doc_id"]: (r["bin_id"], r["bin_offset"])
               for r in compaction_plan(df, "doc_id", "sz", ["src"],
                                        target_size=1000).collect()}
        assert out == {2: (0, 0), 1: (0, 900), 3: (1, 1400),
                       4: (1, 1800), 5: (2, 2100), 6: (0, 0)}

    def test_oversized_item_gets_own_bin(self, spark):
        rows = [(1, "A", 5000), (2, "A", 100), (3, "A", 100)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "sz"])
        out = {r["doc_id"]: r["bin_id"]
               for r in compaction_plan(df, "doc_id", "sz", ["src"],
                                        target_size=1000).collect()}
        assert out[1] == 0
        assert out[2] == out[3] == 5  # tail starts at offset 5000

    def test_every_bin_bounded_by_target_plus_max_item(self, spark):
        rng = np.random.RandomState(3)
        rows = [(i, "d%d" % (i % 3), int(rng.randint(1, 2000)))
                for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "src", "sz"])
        plan = compaction_plan(df, "doc_id", "sz", ["src"], 4000)
        sizes = {r[0]: r[2] for r in rows}
        agg = (plan.withColumn("sz", F.udf(lambda d: sizes[d], "int")("doc_id"))
               .groupBy("src", "bin_id").agg(F.sum("sz").alias("tot"),
                                             F.max("sz").alias("mx"))
               .collect())
        for r in agg:
            assert r["tot"] <= 4000 + r["mx"]


class TestSpectralEntropy:
    def _tsf(self, spark, values):
        from orange3_timeseries_spark.frame import TimeSeriesFrame
        t0 = dt.datetime(2024, 1, 1)
        rows = [("a", t0 + dt.timedelta(days=i), float(v))
                for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        return TimeSeriesFrame(df, time_col="ts", series_cols=["user_id"])

    def test_tone_low_noise_high(self, spark):
        from orange3_timeseries_spark.spark_analytics import (
            spectral_entropy_table,
        )
        # n=65 -> 64 diffs: the tone's 1/8 frequency lands exactly on
        # bin k=8, no leakage -> entropy ~0
        n = 65
        tone = np.sin(2 * np.pi * np.arange(n) / 8.0)
        rng = np.random.RandomState(0)
        noise = rng.normal(size=n)
        h_tone = spectral_entropy_table(
            self._tsf(spark, tone), "value").collect()[0]
        h_noise = spectral_entropy_table(
            self._tsf(spark, noise), "value").collect()[0]
        assert h_tone["spectral_entropy"] < 0.05
        assert h_noise["spectral_entropy"] > 0.7
        assert h_tone["forecastability"] == pytest.approx(
            1.0 - h_tone["spectral_entropy"])

    def test_matches_numpy_reference(self, spark):
        from orange3_timeseries_spark.functions.spectral import (
            spectral_entropy,
        )
        from orange3_timeseries_spark.spark_analytics import (
            spectral_entropy_table,
        )
        rng = np.random.RandomState(5)
        x = np.cumsum(rng.normal(size=40))
        row = spectral_entropy_table(
            self._tsf(spark, x), "value").collect()[0]
        h, k = spectral_entropy(x)
        # direct definition over the diffed series' density periodogram
        xd = np.diff(x)
        spec = np.abs(np.fft.rfft(xd)) ** 2 / len(xd)
        if len(xd) % 2 == 0:
            spec[1:-1] *= 2
        else:
            spec[1:] *= 2
        spec = spec[1:]
        p = spec / spec.sum()
        h_ref = -(p[p > 0] * np.log(p[p > 0])).sum() / np.log(len(spec))
        assert h == pytest.approx(h_ref, abs=1e-12)
        assert row["spectral_entropy"] == pytest.approx(h, abs=1e-12)
        assert row["n_bins"] == k == len(spec)

    def test_short_series_dropped(self, spark):
        from orange3_timeseries_spark.spark_analytics import (
            spectral_entropy_table,
        )
        out = spectral_entropy_table(
            self._tsf(spark, np.arange(8.0)), "value")
        assert out.count() == 0


# ----------------------------------------------------- value-volume CCF
class TestCcfValueVolume:
    def _events(self, spark, rows):
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        data = []
        eid = 0
        for day, (val, cnt) in enumerate(rows):
            for j in range(cnt):
                data.append((eid, t0 + dt.timedelta(days=day, hours=j),
                             1, float(val)))
                eid += 1
        return spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id int, value double")

    def test_perfect_lag0(self, spark):
        from orange3_timeseries_spark.operators.eventstats import (
            ccf_value_volume,
        )

        # daily mean value == daily count -> corr 1 at lag 0
        rows = [(c, c) for c in [1, 5, 2, 8, 3, 9, 4, 7, 6, 2, 5, 8]]
        out = ccf_value_volume(self._events(spark, rows), "ts", "value",
                               ["user_id"], min_days=5)
        got = {r["lag"]: r["ccf"] for r in out.collect()}
        assert got[0] == pytest.approx(1.0, abs=1e-12)

    def test_value_leads_volume(self, spark):
        from orange3_timeseries_spark.operators.eventstats import (
            ccf_value_volume,
        )

        # tomorrow's count = today's value -> corr 1 at lag +1
        vals = [1, 5, 2, 8, 3, 9, 4, 7, 6, 2, 5, 8, 3]
        rows = [(vals[d], vals[d - 1] if d else 4)
                for d in range(len(vals))]
        out = ccf_value_volume(self._events(spark, rows), "ts", "value",
                               ["user_id"], min_days=5)
        got = {r["lag"]: r["ccf"] for r in out.collect()}
        assert got[1] == pytest.approx(1.0, abs=1e-12)
        assert abs(got[0]) < 0.9

    def test_min_days_and_degenerate(self, spark):
        from orange3_timeseries_spark.operators.eventstats import (
            ccf_value_volume,
        )

        # constant counts -> zero volume variance -> no rows at all
        rows = [(v, 3) for v in [1, 5, 2, 8, 3, 9, 4, 7, 6, 2]]
        out = ccf_value_volume(self._events(spark, rows), "ts", "value",
                               ["user_id"], min_days=5)
        assert out.collect() == []
