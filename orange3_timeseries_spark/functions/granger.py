"""Granger causality (``functions.py:433-492``), NumPy-only.

For an ordered pair (antecedent a, consequent c) and lag L, the ssr-F-test
compares OLS fits of ``c_t`` on:

- restricted:   const + c_{t-1..t-L}
- unrestricted: const + c_{t-1..t-L} + a_{t-1..t-L}

``F = ((RSS_r - RSS_u)/L) / (RSS_u/(n - 2L - 1))`` with p-value from the F
survival function (regularized incomplete beta — ``_extrema.f_sf``),
matching statsmodels ``grangercausalitytests``'s ``ssr_ftest``.

The reported row per pair is the first lag in 1..max_lag with p < alpha
(``functions.py:476-487``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from orange3_timeseries_spark.functions._extrema import f_sf


def _lagmat(x: np.ndarray, lags: int) -> np.ndarray:
    """Columns [x_{t-1}, ..., x_{t-lags}] for t = lags..n-1."""
    n = len(x)
    return np.column_stack([x[lags - k: n - k] for k in range(1, lags + 1)])


def _rss(y: np.ndarray, X: np.ndarray) -> float:
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    return float(resid @ resid)


def granger_f_test(a: np.ndarray, c: np.ndarray, lag: int
                   ) -> Tuple[float, float]:
    """(F, p) for 'a Granger-causes c' at the given lag."""
    a = np.asarray(a, dtype=float)
    c = np.asarray(c, dtype=float)
    y = c[lag:]
    n = len(y)
    const = np.ones((n, 1))
    Xr = np.hstack((_lagmat(c, lag), const))
    Xu = np.hstack((_lagmat(c, lag), _lagmat(a, lag), const))
    rss_r = _rss(y, Xr)
    rss_u = _rss(y, Xu)
    dof = n - 2 * lag - 1
    if dof <= 0 or rss_u <= 0:
        return float("nan"), float("nan")
    F = (rss_r - rss_u) / lag / (rss_u / dof)
    return F, f_sf(F, lag, dof)


def first_significant_lag(a: np.ndarray, c: np.ndarray, max_lag: int,
                          alpha: float = 0.05
                          ) -> Tuple[Optional[int], Optional[float]]:
    """First lag in 1..max_lag with p < alpha, else (None, None)."""
    for lag in range(1, max_lag + 1):
        try:
            _, p = granger_f_test(a, c, lag)
        except np.linalg.LinAlgError:
            return None, None
        if np.isfinite(p) and p < alpha:
            return lag, float(p)
    return None, None


def granger_causality_arrays(columns: Sequence[np.ndarray],
                             names: Sequence[str], max_lag: int = 10,
                             alpha: float = 0.05) -> List[list]:
    """All ordered pairs; rows [lag, p, antecedent, consequent]
    (``functions.py:465-492``)."""
    res = []
    for i, ante in enumerate(names):
        for j, cons in enumerate(names):
            if i == j:
                continue
            lag, p = first_significant_lag(columns[i], columns[j],
                                           max_lag, alpha)
            if lag:
                res.append([lag, p, ante, cons])
    return res
