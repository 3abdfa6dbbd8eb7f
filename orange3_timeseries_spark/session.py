"""SparkSession factory with the engine's required configuration.

The reference decodes all timestamps in UTC (``aggregate.py:230``,
``Orange.util.utc_from_timestamp``), so the session timezone is pinned to UTC
for calendar-key parity. Arrow is enabled for the pandas-UDF analytics tier.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs that make sense both on local[N] and on a real cluster.  On a cluster
# shuffle partitions should be ~2-3x total cores; locally we match core count.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    # NumPy-style arithmetic: x/0 -> null, no overflow errors — the kernels
    # encode their own zero/NaN rules explicitly (cf. operators/aggregate.py).
    "spark.sql.ansi.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns (pyarrow default) surface as long;
    # sources.read_parquet restores them to TimestampType from the footer
    # schema (metadata-only driver read — no data pass).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pandas-UDF batches: large enough to amortize Arrow transfer, small
    # enough to keep per-batch memory bounded at wide schemas.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(app_name: str = "orange3_timeseries_spark",
              master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` with a pre-configured environment and the builder
    leaves master resolution to spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = "local[*]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
