"""The shared exact half-away-from-zero rounding kernel.

One definition for every NumPy-side path that must match SQL ``round``
(and Spark's ``F.round`` → bigint cast) bit-for-bit, ties included:
the JL-projection GEMM units, the quantized-ARIMA Gram averaging, and
the POCID 6dp snap all route here — a boundary regression can only
happen in one place, under one test suite.
"""

from __future__ import annotations

import numpy as np


def half_up_exact(x):
    """HALF_UP away from zero, EXACTLY matching Spark's F.round →
    bigint cast: the fractional part ``x − floor(x)`` is an exact
    float subtraction for |x| < 2⁵² (Sterbenz), so the ≥ 0.5
    comparison sees the true side of the tie — unlike
    ``floor(x + 0.5)``, whose IEEE add can round half-even ACROSS the
    boundary for x just below a half (e.g. 0.5 − 2⁻⁵⁴ + 0.5 rounds up
    to exactly 1.0), and unlike ``np.round``'s banker's rounding at
    exact ties.  Kept importable at module level so unit tests can
    drive the raw boundary doubles directly — for ``unit_scale=6`` the
    divergent inputs are unreachable through the ``e·1e6`` multiply,
    so only a direct test can catch a regression to the add-based
    form."""
    fx = np.floor(x)
    cx = np.ceil(x)
    return np.where(x >= 0, fx + ((x - fx) >= 0.5),
                    cx - ((cx - x) >= 0.5))
