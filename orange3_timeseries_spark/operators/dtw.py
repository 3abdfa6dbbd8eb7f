"""Dynamic time warping distance between fixed-length integer profiles.

The reference's similarity intuition is visual (line-chart overlay,
``owlinechart.py``); the pipeline-scale version is a distance: DTW
(Sakoe & Chiba 1978, Berndt & Clifford 1994) aligns two sequences with
monotone warping and scores the best alignment — THE classic measure
for "same shape, shifted phase" that Euclidean distance gets wrong.

Spark-first shape: the O(K²) dynamic program runs as PURE CATALYST
nested ``aggregate`` folds over packed integer arrays — the outer fold
walks rows of the DP matrix, the inner fold walks each row carrying the
growing row as its accumulator (the left-neighbor dependency that
defeats ``transform``).  Higher-order functions loop at RUNTIME, so
codegen size is independent of K (no 64 KB unroll cliff), there is no
Python, and the whole operator is map-only on whatever row the arrays
ride in — a billion profile pairs never shuffle.

Determinism: profiles must be EXACT INTEGER unit arrays (the caller
quantizes at source); costs are ``|aᵢ−bⱼ|`` BIGINTs, the DP carries
only BIGINT mins and adds — bit-identical on any engine, and a SQL
oracle can replay the identical recurrence cell-by-cell (flattened
recursive CTE in row-major order).

Cost note for 100 TB: DTW is O(K²) per pair — K here is a bounded
PROFILE length (day-of-week / hour-of-day / downsampled shape), not
the raw series length; raw-length alignment belongs to
``matrix_profile``'s capped contract instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dtw_units_expr"]


def dtw_units_expr(a: Column, b: Column, k: int) -> Column:
    """DTW distance (L1 cost, steps →/↓/↘, full band) between two
    ``array<bigint>`` columns of fixed length ``k``, as a BIGINT.

    Boundary convention: ``dp[0][j]`` accumulates left-to-right,
    ``dp[i][0]`` top-to-bottom (the standard corner-anchored DP);
    the result is ``dp[k-1][k-1]``."""

    def cost(av: Column, bv: Column) -> Column:
        return F.abs(av - bv)

    # row 0: running L1 cost of a[0] against b, cumulated along j
    a0 = F.element_at(a, 1)
    row0 = F.aggregate(
        F.slice(b, 2, k - 1),
        F.array(cost(a0, F.element_at(b, 1))),
        lambda acc, bv: F.concat(acc, F.array(F.element_at(acc, -1)
                                              + cost(a0, bv))))

    def step(prev: Column, av: Column) -> Column:
        # j = 0: only the ↓ move from prev[0]
        init = F.array(F.element_at(prev, 1)
                       + cost(av, F.element_at(b, 1)))
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(k - 1)), init,
            lambda cur, j: F.concat(cur, F.array(
                cost(av, F.element_at(b, j + 1))
                + F.least(F.element_at(prev, j + 1),   # ↓  up
                          F.element_at(prev, j),       # ↘  up-left
                          F.element_at(cur, -1)))))    # →  left

    dp = F.aggregate(F.slice(a, 2, k - 1), row0, step)
    return F.element_at(dp, k)
