"""Autocorrelation / partial autocorrelation (``functions.py:177-246``),
NumPy-only.

- :func:`acf_values` computes the biased (denominator n) FFT-based ACF,
  matching statsmodels ``acf(x, fft=True, adjusted=False)``.
- :func:`pacf_values` runs the Levinson-Durbin recursion on the biased
  autocovariance, matching statsmodels ``pacf(method='ldb')``.
- The public functions return only the **significant** lags — strict local
  maxima of |corr| with neighborhood order 3 (``_significant_acf``,
  ``functions.py:177-189``) — as (lag, value) rows.
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.functions._extrema import argrel_greater


def acf_values(x: np.ndarray, nlags: int) -> np.ndarray:
    """Biased ACF at lags 0..nlags via FFT."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    xd = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n - 1)))
    fx = np.fft.rfft(xd, nfft)
    acov = np.fft.irfft(fx * np.conjugate(fx), nfft)[:n] / n
    return acov[:nlags + 1] / acov[0]


def pacf_values(x: np.ndarray, nlags: int) -> np.ndarray:
    """PACF at lags 0..nlags via Levinson-Durbin on the biased
    autocovariance (statsmodels 'ldb')."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    xd = x - x.mean()
    acov = np.array([np.dot(xd[: n - k], xd[k:]) for k in range(nlags + 1)]) / n
    pacf = np.zeros(nlags + 1)
    pacf[0] = 1.0
    # Levinson-Durbin recursion
    phi = np.zeros((nlags + 1, nlags + 1))
    pacf_den = acov[0]
    for k in range(1, nlags + 1):
        num = acov[k] - np.dot(phi[k - 1, 1:k], acov[1:k][::-1])
        phi[k, k] = num / pacf_den
        for j in range(1, k):
            phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf_den = pacf_den * (1.0 - phi[k, k] ** 2)
        pacf[k] = phi[k, k]
    return pacf


def _significant(corr: np.ndarray) -> np.ndarray:
    lags = argrel_greater(np.abs(corr), 3)
    return np.column_stack((lags, corr[lags])) if len(lags) else \
        np.empty((0, 2))


def autocorrelation(x, *, nlags=None):
    """Significant ACF peaks as (lag, acf) rows; default
    ``nlags = 0.9 * len(x)`` (``functions.py:215-216``)."""
    x = np.asarray(x, dtype=float).ravel()
    if nlags is None:
        nlags = int(0.9 * len(x))
    return _significant(acf_values(x, nlags))


def partial_autocorrelation(x, *, nlags=None):
    """Significant PACF peaks as (lag, pacf) rows; default
    ``nlags = min(len(x)//2 - 1, len(x) - 1)`` (``functions.py:243-244``)."""
    x = np.asarray(x, dtype=float).ravel()
    if nlags is None:
        nlags = min(len(x) // 2 - 1, len(x) - 1)
    return _significant(pacf_values(x, nlags))


def ccf_values(x: np.ndarray, y: np.ndarray, nlags: int):
    """Biased cross-correlation of two aligned series at lags
    -nlags..nlags: ccf[k] = Σ_t (x_t-x̄)(y_{t+k}-ȳ) / (n·σx·σy) with
    population σ — the two-sided companion of :func:`acf_values`
    (positive lag: y leads x by k observations).

    Returns (lags, values); empty when either series is constant
    (denominator zero) — callers skip such series rather than emit
    inf/nan rows."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = len(x)
    den = n * x.std() * y.std()
    if den == 0 or n < 2:
        return [], []
    xd = x - x.mean()
    yd = y - y.mean()
    lags, vals = [], []
    for k in range(-nlags, nlags + 1):
        if abs(k) > n - 1:
            continue
        if k >= 0:
            s = np.dot(xd[:n - k], yd[k:])
        else:
            s = np.dot(xd[-k:], yd[:n + k])
        lags.append(k)
        vals.append(s / den)
    return lags, vals


def holt_state(x: np.ndarray, alpha: float, beta: float):
    """Final (level, trend) of the Holt recursion — the persistable
    model state.  ``None`` for series shorter than 2 observations."""
    x = np.asarray(x, dtype=float)
    if len(x) < 2:
        return None
    l = x[0]
    b = x[1] - x[0]
    for t in range(1, len(x)):
        l_new = alpha * x[t] + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    return (float(l), float(b))


def holt_forecast_from_state(level: float, trend: float, horizon: int):
    """ŷ_{n+h} = l_n + h·b_n from a saved Holt state."""
    return [level + (h + 1) * trend for h in range(horizon)]


def holt_values(x: np.ndarray, alpha: float, beta: float, horizon: int):
    """Holt linear-trend exponential smoothing with the standard
    initialization l₁ = x₁, b₁ = x₂ − x₁ and recursion
    l_t = α·x_t + (1−α)(l+b),  b_t = β(l_t − l_prev) + (1−β)b —
    expression order matches the recursive-CTE oracle exactly.
    Returns the h-step forecasts ŷ_{n+h} = l_n + h·b_n.  Split into
    :func:`holt_state` + :func:`holt_forecast_from_state` so the model
    registry serves a saved state bit-identically BY CONSTRUCTION."""
    st = holt_state(x, alpha, beta)
    if st is None:
        return []
    return holt_forecast_from_state(st[0], st[1], horizon)


def holt_winters_values(x: np.ndarray, m: int, alpha: float, beta: float,
                        gamma: float, horizon: int):
    """Additive Holt-Winters (level + trend + m-period season) with the
    classical initialization l = mean(x₁..m), b = (mean(x_{m+1..2m}) −
    mean(x₁..m))/m, s_i = x_i − l, recursion from t = m+1:

        l_t = α(x_t − s_{t−m}) + (1−α)(l + b)
        b_t = β(l_t − l_prev) + (1−β)b
        s_t = γ(x_t − l_t) + (1−γ)s_{t−m}

    Forecast ŷ_{n+h} = l + h·b + s_{n+h−m·⌈h/m⌉}.  Expression order
    mirrors the recursive-CTE oracle; needs ≥ 2m observations.  Split
    into :func:`holt_winters_state` + :func:`hw_forecast_from_state`
    for registry serving."""
    st = holt_winters_state(x, m, alpha, beta, gamma)
    if st is None:
        return []
    return hw_forecast_from_state(st[0], st[1], st[2], horizon)


def holt_winters_state(x: np.ndarray, m: int, alpha: float, beta: float,
                       gamma: float):
    """Final (level, trend, season[m]) of the additive Holt-Winters
    recursion; the season list is the ROTATED buffer (element 0 is the
    h=1 season).  ``None`` for series shorter than 2m."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 2 * m:
        return None
    l = float(np.mean(x[:m]))
    b = (float(np.mean(x[m:2 * m])) - l) / m
    season = [x[i] - l for i in range(m)]
    for t in range(m, n):
        s_old = season[0]
        l_new = alpha * (x[t] - s_old) + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
        season = season[1:] + [gamma * (x[t] - l_new)
                               + (1 - gamma) * s_old]
    return (float(l), float(b), [float(s) for s in season])


def hw_forecast_from_state(level: float, trend: float, season,
                           horizon: int):
    """ŷ_{n+h} = l + h·b + season[(h−1) mod m] from a saved HW state."""
    m = len(season)
    return [level + h * trend + season[(h - 1) % m]
            for h in range(1, horizon + 1)]


def holt_damped_values(x, alpha: float, beta: float, phi: float,
                       horizon: int):
    """Damped-trend Holt (Gardner & McKenzie 1985): the trend is
    discounted by ``phi`` in both the recursion and the forecast,

        l_t = α·x_t + (1−α)(l + φ·b)
        b_t = β(l_t − l_prev) + (1−β)·φ·b
        ŷ_{n+h} = l + (φ + φ² + ... + φ^h)·b

    — the flat-ish long-horizon behavior real demand series want
    (``phi = 1`` reduces exactly to :func:`holt_values`).  Expression
    order mirrors the recursive-CTE oracle.  Split into
    :func:`holt_damped_state` + :func:`damped_forecast_from_state`
    for registry serving."""
    st = holt_damped_state(x, alpha, beta, phi)
    if st is None:
        return []
    return damped_forecast_from_state(st[0], st[1], phi, horizon)


def holt_damped_state(x, alpha: float, beta: float, phi: float):
    """Final (level, trend) of the damped-trend Holt recursion;
    ``None`` for series shorter than 2 observations."""
    x = np.asarray(x, dtype=float)
    if len(x) < 2:
        return None
    l = x[0]
    b = x[1] - x[0]
    for t in range(1, len(x)):
        l_new = alpha * x[t] + (1 - alpha) * (l + phi * b)
        b = beta * (l_new - l) + (1 - beta) * phi * b
        l = l_new
    return (float(l), float(b))


def damped_forecast_from_state(level: float, trend: float, phi: float,
                               horizon: int):
    """ŷ_{n+h} = l + (φ + … + φ^h)·b from a saved damped-Holt state —
    the cumulative damp sum accumulates in the SAME order as the fit
    path always did, so serving is bit-faithful."""
    out = []
    damp = 0.0
    for h in range(1, horizon + 1):
        damp += phi ** h
        out.append(level + damp * trend)
    return out


def theta_values(x, alpha: float, horizon: int):
    """Theta method (Assimakopoulos & Nikolopoulos 2000, θ = 2, the M3
    competition winner): decompose into the θ=0 line (the OLS linear
    trend a + b·t, long-run drift) and the θ=2 line (2x_t − (a + b·t),
    doubled local curvature), SES-smooth the θ=2 line, and average the
    two h-step extrapolations:

        ŷ_{n+h} = ((a + b·(n+h)) + l_n) / 2

    with ``l_n`` the SES level (l_1 = θ2_1; l_t = α·θ2_t + (1−α)l).
    The OLS uses centered closed-form slope/intercept (1-indexed t), so
    a ``regr_slope``-based oracle replays it; the SES level folds to the
    closed geometric-weight sum the oracle uses.  Split into
    :func:`theta_state` + :func:`theta_forecast_from_state` for
    registry serving."""
    st = theta_state(x, alpha)
    if st is None:
        return []
    return theta_forecast_from_state(st[0], st[1], st[2], st[3], horizon)


def theta_state(x, alpha: float):
    """Final (a, b, l, n) of the Theta fit: OLS intercept/slope of the
    θ=0 line, the SES level of the θ=2 line, and the series length —
    everything the forecast needs.  ``None`` for n < 3."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 3:
        return None
    t = np.arange(1, n + 1, dtype=float)
    tbar = t.mean()
    xbar = x.mean()
    b = float(((t - tbar) * (x - xbar)).sum() / ((t - tbar) ** 2).sum())
    a = xbar - b * tbar
    theta2 = 2.0 * x - (a + b * t)
    l = theta2[0]
    for v in theta2[1:]:
        l = alpha * v + (1 - alpha) * l
    return (float(a), float(b), float(l), int(n))


def theta_forecast_from_state(a: float, b: float, l: float, n: int,
                              horizon: int):
    """ŷ_{n+h} = ((a + b·(n+h)) + l)/2 from a saved Theta state."""
    return [((a + b * (n + h)) + l) / 2.0
            for h in range(1, horizon + 1)]
