"""Small statistical utilities for the model tier (scipy-free)."""

from __future__ import annotations

import numpy as np

# Coefficients of Acklam's rational approximation to the inverse normal CDF
# (a widely published public-domain algorithm; relative error < 1.15e-9).
_A = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
_B = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01]
_C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
_D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00]


def norm_ppf(p: float) -> float:
    """Inverse standard normal CDF."""
    if not 0.0 < p < 1.0:
        if p == 0.0:
            return -np.inf
        if p == 1.0:
            return np.inf
        return float("nan")
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = np.sqrt(-2 * np.log(p))
        return (((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4])
                * q + _C[5]) / ((((_D[0] * q + _D[1]) * q + _D[2]) * q
                                 + _D[3]) * q + 1)
    if p <= p_high:
        q = p - 0.5
        r = q * q
        return (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4])
                * r + _A[5]) * q / (((((_B[0] * r + _B[1]) * r + _B[2]) * r
                                      + _B[3]) * r + _B[4]) * r + 1)
    q = np.sqrt(-2 * np.log(1 - p))
    return -(((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4])
             * q + _C[5]) / ((((_D[0] * q + _D[1]) * q + _D[2]) * q
                              + _D[3]) * q + 1)


def lagmat(x: np.ndarray, lags: int) -> np.ndarray:
    """[x_{t-1} ... x_{t-lags}] for t = lags..n-1 (2-D x stacks columns)."""
    x = np.asarray(x, dtype=float)
    if x.ndim == 1:
        return np.column_stack([x[lags - k: len(x) - k]
                                for k in range(1, lags + 1)])
    return np.hstack([x[lags - k: len(x) - k, :]
                      for k in range(1, lags + 1)])


def ols(y: np.ndarray, X: np.ndarray):
    """(beta, resid, rss)."""
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    rss = float(resid.T @ resid) if resid.ndim == 1 else resid
    return beta, resid, rss
