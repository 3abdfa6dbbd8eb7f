"""Deterministic HyperLogLog sketch (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from orange3_timeseries_spark.operators.sketch import (
    approx_distinct,
    expected_error,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.mark.parametrize("n", [50, 500, 5000])
def test_accuracy_envelope(spark, n):
    df = spark.range(n).select(F.concat(F.lit("key"),
                                        F.col("id")).alias("k"))
    [row] = approx_distinct(df, "k", p=10).collect()
    rel = abs(row.approx_distinct - n) / n
    # 1.04/sqrt(1024) ~ 3.25 %; allow 4 sigma
    assert rel < 4 * expected_error(10), (n, row.approx_distinct)


def test_duplicates_do_not_inflate(spark):
    uniq = spark.range(300).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    dup = uniq.union(uniq).union(uniq)
    [a] = approx_distinct(uniq, "k", p=10).collect()
    [b] = approx_distinct(dup, "k", p=10).collect()
    assert a.approx_distinct == b.approx_distinct  # exact same registers


def test_merge_equals_union(spark):
    a = spark.range(0, 400).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(200, 600).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    ra = hll_registers(a, "k", p=10)
    rb = hll_registers(b, "k", p=10)
    [merged] = hll_estimate(hll_merge(ra, rb, p=10), p=10).collect()
    [direct] = approx_distinct(a.union(b), "k", p=10).collect()
    assert merged.approx_distinct == direct.approx_distinct


def test_grouped_registers_bounded(spark):
    df = spark.range(2000).select(
        (F.col("id") % 4).alias("g"),
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    regs = hll_registers(df, "k", p=8, group_cols=("g",))
    counts = {r.g: r["count"] for r in
              regs.groupBy("g").count().collect()}
    assert all(c <= 256 for c in counts.values())
    est = {r.g: r.approx_distinct
           for r in hll_estimate(regs, p=8, group_cols=("g",)).collect()}
    for g, e in est.items():
        assert abs(e - 500) / 500 < 4 * expected_error(8)


# ------------------------------------------------------- count-min sketch
def test_cms_never_undercounts(spark):
    from orange3_timeseries_spark.operators.sketch import (
        cms_estimate,
        cms_tables,
    )

    # zipf-ish: token i appears (200 - i) times
    rows = [(f"tok{i}",) for i in range(50) for _ in range(200 - i)]
    df = spark.createDataFrame(rows, ["t"])
    tab = cms_tables(df, "t", width=256, depth=3)
    probes = spark.createDataFrame([(f"tok{i}",) for i in range(50)],
                                   ["t"])
    est = {r.t: r.cms_count
           for r in cms_estimate(tab, probes, "t", width=256,
                                 depth=3).collect()}
    exact = {f"tok{i}": 200 - i for i in range(50)}
    for t, e in exact.items():
        assert est[t] >= e                     # overestimate only
        assert est[t] - e <= 3 * sum(exact.values()) / 256  # e*N/w bound-ish


def test_cms_unseen_key_small(spark):
    from orange3_timeseries_spark.operators.sketch import (
        cms_estimate,
        cms_tables,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], ["t"])
    tab = cms_tables(df, "t", width=1024, depth=3)
    probes = spark.createDataFrame([("never-seen",)], ["t"])
    [r] = cms_estimate(tab, probes, "t", width=1024, depth=3).collect()
    assert r.cms_count <= 5  # min over 3 rows of ~1 expected collision
