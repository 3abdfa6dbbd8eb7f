"""Matrix profile: per-window nearest-neighbor distance (motif /
discord discovery) over ordered series.

The reference's analytics tier finds periodic structure spectrally
(``functions.py:76-174``); the matrix profile (Yeh et al., ICDM 2016)
is the time-domain companion: for every length-``m`` subsequence, the
z-normalized Euclidean distance to its nearest non-trivial neighbor.
Low profile values = motifs (repeated shapes), high values = discords
(anomalous shapes) — the standard primitive behind motif mining,
discord-based anomaly detection, and segmentation.

Spark-first design: rather than porting STOMP's O(n²) single-core
streaming dot-product recurrence, the profile is expressed as a
WINDOW-PAIR SELF-JOIN in pure Catalyst — subsequence arrays come from
one ordered-window ``collect_list`` pass, z-scores are materialized at
SOURCE, and the pairwise distance is a ``zip_with``/``aggregate`` fold
over integer micro-units.  Series parallelize across the cluster (one
shuffle on the series key); within a series the cost is O(n²·m) pairs
— LINEAR in the number of series, bounded per series by ``max_n``.
Series longer than the cap are NOT silently dropped: each one emits a
single SENTINEL row ``(series..., idx = −1, nn_idx = series length,
nn_dist = NULL)`` so a consumer can see exactly which series were
capped and how long they are (the repo's no-silent-caps rule); past
~10⁴ windows, feed a downsampled copy of the series instead.

Determinism contract (PLANS.md firewall rules):

- per-window μ and σ round 6 dp at source; z-scores are then single
  IEEE divisions of identical inputs — bit-identical on any engine.
- each pair's squared distance accumulates as BIGINT micro-units
  (``round(Δz²·1e7)`` summed as integers) — order-free and exact, so
  the nearest-neighbor argmin (min units, lowest index tie-break) is
  an INTEGER comparison that cannot be flipped by float noise.
- constant windows (σ = 0, z undefined) are excluded both as query
  windows and as neighbor candidates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["matrix_profile"]


def matrix_profile(df: DataFrame, time_col: str, value_col: str,
                   series_cols: Sequence[str], m: int = 8,
                   exclusion: int | None = None,
                   max_n: int = 4096) -> DataFrame:
    """One row per valid subsequence: ``(series..., idx, nn_idx,
    nn_dist)`` — the z-normalized Euclidean distance and index of the
    nearest neighbor at least ``exclusion`` positions away (default
    ``m // 2``, the standard trivial-match exclusion zone).

    ``idx`` is the 0-based window start; windows needing rows past the
    series end don't exist.  ``nn_dist`` = ``round(sqrt(Σ Δz² ), 6)``
    over the micro-unit sum.

    Series longer than ``max_n`` rows contribute one sentinel row
    ``(series..., idx = −1, nn_idx = series length, nn_dist = NULL)``
    instead of a profile — visible, never silently missing.

    .. caveat:: the sentinel branch is a second (pruned, cheap) scan
       of ``df``.  Both branches descend from the same relation, so
       file-backed sources share one snapshot and cannot disagree on
       series membership; for a MUTABLE non-file source (a live JDBC
       table, a changing view) the two scans could observe different
       per-series counts — checkpoint or persist ``df`` first in that
       case."""
    series_cols = list(series_cols)
    if exclusion is None:
        exclusion = m // 2
    w = Window.partitionBy(*series_cols).orderBy(time_col)
    base = df.select(*series_cols, F.col(time_col),
                     F.col(value_col).cast("double").alias("__x__"))
    base = (base
            .withColumn("__i__", F.row_number().over(w) - 1)
            .withColumn("__n__", F.count(F.lit(1)).over(
                Window.partitionBy(*series_cols)))
            .where(F.col("__n__") <= F.lit(max_n)))
    # no-silent-caps rule: capped series surface as one sentinel row
    # each.  Derived from a SEPARATE pruned-scan groupBy count (map-
    # side partial agg over just the series columns) — re-deriving it
    # from the windowed projection would re-run the full window SORT a
    # second time just to find the handful of capped series.  Both
    # branches descend from the SAME df relation, so file-backed
    # sources share one file listing (one snapshot — the two scans
    # cannot disagree on membership); for truly mutable non-file
    # sources, checkpoint df first
    capped = (df.groupBy(*series_cols)
              .agg(F.count(F.lit(1)).alias("__n__"))
              .where(F.col("__n__") > F.lit(max_n))
              .select(*series_cols,
                      F.lit(-1).alias("idx"),
                      F.col("__n__").cast("int").alias("nn_idx"),
                      F.lit(None).cast("double").alias("nn_dist")))
    frame = w.rowsBetween(Window.currentRow, m - 1)
    mu = F.round(F.avg("__x__").over(frame), 6)
    sg = F.round(F.stddev_pop("__x__").over(frame), 6)
    arr = F.collect_list("__x__").over(frame)
    wins = (base
            .withColumn("__mu__", mu)
            .withColumn("__sg__", sg)
            .withColumn("__a__", arr)
            .where((F.col("__i__") <= F.col("__n__") - m)
                   & (F.col("__sg__") > 0))
            .withColumn("__z__", F.transform(
                F.col("__a__"),
                lambda x: (x - F.col("__mu__")) / F.col("__sg__")))
            .select(*series_cols, F.col("__i__"), F.col("__z__")))
    a = wins.alias("a")
    b = wins.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in series_cols]
    pairs = a.join(b, cond).where(
        F.abs(F.col("a.__i__") - F.col("b.__i__")) >= F.lit(exclusion))
    # per-pair distance UNROLLED over the fixed window length m: the
    # zip_with/aggregate lambda pair is evaluated by the higher-order-
    # function interpreter per element, outside whole-stage codegen —
    # m is a plan-time constant, so the same integer micro-unit terms
    # compile as a flat codegen'd sum (identical values: BIGINT
    # addition is order-free and the per-element round is unchanged)
    def _term(k: int):
        d = (F.element_at(F.col("a.__z__"), k)
             - F.element_at(F.col("b.__z__"), k))
        return F.round(d * d * F.lit(1e7), 0).cast("bigint")

    terms = [_term(k) for k in range(1, m + 1)]
    units = terms[0]
    for t in terms[1:]:
        units = units + t
    scored = pairs.select(
        *[F.col(f"a.{c}").alias(c) for c in series_cols],
        F.col("a.__i__").alias("idx"),
        F.col("b.__i__").alias("__j__"),
        units.alias("__u__"))
    # nearest-neighbor argmin as a map-side-combinable aggregation:
    # min(struct(u, j)) is the lexicographic (units, index) minimum —
    # exactly the row_number(orderBy u, j) == 1 pick, but with partial
    # aggregation inside the join stage instead of shuffling and
    # sorting every candidate pair (guide §2.3: aggregate before you
    # shuffle).  The n²-per-series pair stream never materializes past
    # the partial agg.
    best = F.min(F.struct(F.col("__u__"), F.col("__j__"))).alias("__m__")
    profile = (scored.groupBy(*series_cols, "idx").agg(best)
               .select(*series_cols, "idx",
                       F.col("__m__.__j__").alias("nn_idx"),
                       F.round(F.sqrt(F.col("__m__.__u__") / F.lit(1e7)), 6)
                       .alias("nn_dist")))
    return profile.unionByName(capped)
