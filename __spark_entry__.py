"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The registry itself lives in ``orange3_timeseries_spark.queries``; this file
is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orange3_timeseries_spark import queries as _q  # noqa: E402
from orange3_timeseries_spark import queries_pipeline  # noqa: E402,F401  (registers)
from orange3_timeseries_spark import queries_analytics  # noqa: E402,F401  (registers)
from orange3_timeseries_spark import queries_models  # noqa: E402,F401  (registers)
from orange3_timeseries_spark import queries_multimodal  # noqa: E402,F401  (registers)
from orange3_timeseries_spark import queries_streaming  # noqa: E402,F401  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.2): per-series
    sliding mean + first difference over events, rolled up per day."""
    from pyspark.sql import functions as F

    from orange3_timeseries_spark.frame import TimeSeriesFrame
    from orange3_timeseries_spark.operators.difference import difference
    from orange3_timeseries_spark.operators.moving_transform import (
        KEEP_ALL,
        period_aggregation,
        sliding_window,
    )
    from orange3_timeseries_spark.sources import read_table

    _q.ensure_session_conf(spark)
    sf_dir = "/root/testdata/sf0.001"
    tsf = TimeSeriesFrame(read_table(spark, sf_dir, "events"),
                          time_col="ts", series_cols=["user_id"])
    tsf = sliding_window(tsf, {"value": ["mean"]}, 12, keep=KEEP_ALL)
    tsf = difference(tsf, ["value"], op="diff")
    daily = period_aggregation(
        TimeSeriesFrame(tsf.df, time_col="ts"), "Days",
        [("value", "mean"), ("value (mean)", "mean"), ("Δvalue", "mean")])
    return daily.df.select(
        "Time", F.col("Instance count").alias("n"),
        F.col("value (mean)").alias("day_mean"),
        F.col("value (mean) (mean)").alias("day_mean_sliding12"),
        F.col("Δvalue (mean)").alias("day_mean_diff"))


def _verification_history() -> dict:
    """Per-query driver-check history from the committed
    ``CORRECTNESS_r*.json`` round records.

    Returns ``{name: (last_round_checked, last_check_was_green)}``.  Used
    to rotate the driver's ~50-query verification window as a true
    least-recently-verified round-robin: every oracled query gets
    re-checked at least every other round, so a regression in a
    previously-green query cannot stay invisible (the r3 "green-always-
    last" ordering degenerated once every query had been green at least
    once).  Rotation is keyed on the round number embedded in each
    artifact's filename, not on mere artifact presence."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    hist: dict = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except Exception:
            continue
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            prev = hist.get(name)
            if prev is None or rnd >= prev[0]:
                hist[name] = (rnd, bool(row.get("hash_match")))
    return hist


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered for maximum driver signal under the ~50-query recording cap
    (least-recently-verified round-robin):

    1. oracled queries never driver-checked in any round (new additions),
    2. oracled queries whose latest driver check was red,
    3. remaining oracled queries by ascending last-checked round (the ones
       checked longest ago first), registry order as tie-break,
    4. rows-only checks last.
    """
    q = dict(_q.QUERIES)
    hist = _verification_history()
    registry_pos = {k: i for i, k in enumerate(q)}
    oracled = [k for k in q if _q.ORACLE_SQL.get(k)]
    rows_only = [k for k in q if not _q.ORACLE_SQL.get(k)]

    def sort_key(name: str):
        rec = hist.get(name)
        if rec is None:
            return (0, 0, registry_pos[name])          # never checked
        rnd, green = rec
        if not green:
            return (1, rnd, registry_pos[name])        # latest check red
        return (2, rnd, registry_pos[name])            # green: oldest first

    ordered = sorted(oracled, key=sort_key)
    return {k: q[k] for k in ordered + rows_only}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(_q.ORACLE_SQL)
