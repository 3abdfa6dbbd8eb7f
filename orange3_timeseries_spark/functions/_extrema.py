"""Scipy-free reimplementations of the small numerical utilities the
analytics tier needs: strict local-maxima detection (scipy
``argrelextrema(np.greater, order=k)`` semantics, clip boundary mode) and
the regularized incomplete beta function (for F-distribution p-values).

The beta continued-fraction follows the classical Lentz algorithm as
described in standard numerical analysis texts (public domain mathematics).
"""

from __future__ import annotations

import math

import numpy as np


def argrel_greater(x: np.ndarray, order: int) -> np.ndarray:
    """Indices of strict local maxima: x[i] > x[i±s] for all s in 1..order
    (out-of-range neighbors clip to the boundary, so boundary points are
    never extrema — matching scipy's default 'clip' mode)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n == 0:
        return np.array([], dtype=int)
    keep = np.ones(n, dtype=bool)
    idx = np.arange(n)
    for s in range(1, order + 1):
        left = x[np.clip(idx - s, 0, n - 1)]
        right = x[np.clip(idx + s, 0, n - 1)]
        keep &= (x > left) & (x > right)
    return idx[keep]


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(F_stat: float, d1: float, d2: float) -> float:
    """Survival function of the F distribution: P(F > F_stat)."""
    if not np.isfinite(F_stat) or F_stat < 0:
        return float("nan")
    return betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * F_stat))
