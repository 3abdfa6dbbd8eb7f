"""Classical seasonal decomposition (``functions.py:348-430``), NumPy-only.

Reproduces the reference pipeline exactly:

1. classical decomposition (the statsmodels ``seasonal_decompose``
   algorithm): centered moving-average trend (window ``period+1`` with
   half-weight ends when the period is even), by-period means of the
   detrended series normalized to zero-mean (additive) / unit-mean
   (multiplicative) seasonality;
2. seasonally adjusted = observed - seasonal (additive) or
   observed / seasonal (multiplicative);
3. the trend's NaN edges are **linearly extrapolated from the first/last 3
   fitted points** (``_interp_trend``, ``functions.py:377-394``);
4. residual recomputed against the extrapolated trend;
5. source NaNs re-applied to adjusted/trend/residual (``:411-415``).

Output column order per variable: (season. adj., seasonal, trend, residual)
(``:417-424``).
"""

from __future__ import annotations

import numpy as np


def _ma_trend(x: np.ndarray, period: int) -> np.ndarray:
    """Two-sided centered moving average (statsmodels convolution filter)."""
    n = len(x)
    if period % 2 == 0:
        filt = np.concatenate(([0.5], np.ones(period - 1), [0.5])) / period
    else:
        filt = np.ones(period) / period
    half = len(filt) // 2
    trend = np.full(n, np.nan)
    conv = np.convolve(x, filt[::-1], mode="valid")
    trend[half: half + len(conv)] = conv
    return trend


def _interp_trend(trend: np.ndarray) -> np.ndarray:
    """Linear extrapolation of the trend's NaN edges from the first/last 3
    fitted points (``functions.py:377-394``)."""
    trend = trend.copy()
    isfin = np.isfinite(trend)
    first = int(np.argmax(isfin))
    last = len(trend) - 1 - int(np.argmax(isfin[::-1]))
    d = 3
    first_last = min(first + d, last)
    last_first = max(first, last - d)

    if first_last > first:
        A = np.column_stack((np.arange(first, first_last),
                             np.ones(first_last - first)))
        k, n0 = np.linalg.lstsq(A, trend[first:first_last], rcond=None)[0]
        trend[:first] = np.arange(0, first) * k + n0
    if last > last_first:
        A = np.column_stack((np.arange(last_first, last),
                             np.ones(last - last_first)))
        k, n0 = np.linalg.lstsq(A, trend[last_first:last], rcond=None)[0]
        trend[last + 1:] = np.arange(last + 1, len(trend)) * k + n0
    return trend


def seasonal_decompose_arrays(x: np.ndarray, model: str = "multiplicative",
                              period: int = 12):
    """Decompose one (interpolated) series; returns
    (adjusted, seasonal, trend, residual) with the reference's
    edge-extrapolated trend.  NaN re-application is the caller's job
    (it needs the pre-interpolation mask)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    trend = _ma_trend(x, period)
    detrended = x - trend if model == "additive" else x / trend
    period_avgs = np.array([np.nanmean(detrended[i::period])
                            for i in range(period)])
    if model == "additive":
        period_avgs -= np.mean(period_avgs)
    else:
        period_avgs /= np.mean(period_avgs)
    seasonal = np.tile(period_avgs, n // period + 1)[:n]

    if model == "additive":
        adjusted = x - seasonal
    else:
        adjusted = x / seasonal
    trend = _interp_trend(trend)
    resid = adjusted - trend if model == "additive" else adjusted / trend
    return adjusted, seasonal, trend, resid
