"""Column profiler — one-pass table statistics (count / nulls / mean /
std / min / max / exact quartiles / distinct count) per numeric column,
the data-quality summary a pipeline runs before and after every transform.

Spark-first plan: ONE aggregate over the scan computes every column's
stats as a struct, then a driver-side unpivot of the single result row —
one job, one (tiny) shuffle, no per-column re-scan.  Quantiles use the
EXACT ``percentile`` aggregate (linear interpolation — same contract as
DuckDB ``quantile_cont``) so the profile is oracle-checkable;
``approx_percentile`` is the drop-in at scales where exact is too heavy
(then the oracle holds only to sketch tolerance).  ``count(DISTINCT)``
for several columns in one agg plans as AQE-expanded partial
distinct-aggregates, not a per-column scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: Sequence[str],
                    exact_quantiles: bool = True) -> DataFrame:
    """One output row per profiled column: ``column, n, n_null, n_distinct,
    mean, std, vmin, vmax, p25, p50, p75``.  ``std`` is the sample
    (ddof=1) deviation — DuckDB/Spark ``stddev`` default."""
    aggs = []
    for c in cols:
        col = F.col(c)
        q = (F.expr(f"percentile({c}, array(0.25, 0.5, 0.75))")
             if exact_quantiles else
             F.expr(f"approx_percentile({c}, array(0.25, 0.5, 0.75))"))
        aggs.append(F.struct(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long")
             .alias("n_null"),
            F.count_distinct(col).alias("n_distinct"),
            F.avg(col).cast("double").alias("mean"),
            F.stddev(col).cast("double").alias("std"),
            F.min(col).cast("double").alias("vmin"),
            F.max(col).cast("double").alias("vmax"),
            q.alias("qs"),
        ).alias(c))
    row = df.agg(*aggs)
    # unpivot the single result row: a literal (column, struct) array
    pairs = F.array(*[F.struct(F.lit(c).alias("column"),
                               F.col(c).alias("s")) for c in cols])
    ex = row.select(F.explode(pairs).alias("p")).select("p.column", "p.s.*")
    return ex.select(
        "column", "n", "n_null", "n_distinct", "mean", "std",
        "vmin", "vmax",
        F.col("qs")[0].cast("double").alias("p25"),
        F.col("qs")[1].cast("double").alias("p50"),
        F.col("qs")[2].cast("double").alias("p75"))
