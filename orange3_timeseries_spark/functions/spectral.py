"""Spectral analysis: periodogram + Lomb-Scargle (``functions.py:52-174``),
NumPy-only (no scipy in the runtime).

- :func:`periodogram` mirrors ``functions.py:76-106``: detrend ('diff' or
  polynomial), boxcar density periodogram, drop the first ``len//1000``
  unstable bins, convert frequencies to periods, keep significant local
  maxima of the min-max-scaled power (``argrelextrema order=5``,
  ``functions.py:63-73``).
- :func:`periodogram_nonequispaced` mirrors ``functions.py:109-174``:
  Lomb-Scargle with the auto period grid from the 5th/80th gap percentiles
  and the same significance filter; normalization ``2/(n*var)``.
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.functions._extrema import argrel_greater


def _detrend(x: np.ndarray, kind):
    """'diff', False, or polynomial order (``functions.py:52-60``)."""
    x = np.asarray(x, dtype=float)
    if kind == "diff":
        return np.diff(x)
    if isinstance(kind, str):
        kind = dict(constant=0, linear=1, quadratic=2, cubic=3)[kind]
    if kind is False or kind is None:
        return x
    t = np.arange(len(x), dtype=float)
    coef = np.polyfit(t, x, int(kind))
    return x - np.polyval(coef, t)


def significant_periods(periods, pgram):
    """Min-max scale the power and keep strict local maxima with
    neighborhood order 5 (``functions.py:63-73``)."""
    if pgram.size == 0:
        return periods, pgram
    periods = periods[::-1]
    pgram = pgram[::-1]
    ptp = np.ptp(pgram)
    pgram = (pgram - pgram.min()) / (ptp if ptp else 1)
    sig = argrel_greater(pgram, 5)
    return periods[sig], pgram[sig]


def _density_periodogram(x: np.ndarray, fs: float = 1.0):
    """One-sided boxcar density periodogram (scipy ``periodogram``
    defaults): |rfft|^2 / (fs * n), doubled except DC and Nyquist."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    spec = np.abs(np.fft.rfft(x)) ** 2 / (fs * n)
    if n % 2 == 0:
        spec[1:-1] *= 2
    else:
        spec[1:] *= 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    return freqs, spec


def spectral_entropy(x, *, detrend="diff"):
    """Normalized spectral (Shannon) entropy of the detrended series and
    the number of contributing bins, ``(H, K)``.

    ``H = −Σ p_k ln p_k / ln K`` over the one-sided density periodogram
    bins k ≥ 1 (DC excluded — after 'diff' detrending the DC term is
    the telescoped endpoint difference, pure level information), with
    ``p_k = P_k / Σ P``.  H → 0 for a pure tone (maximally
    forecastable), → 1 for white noise; ``1 − H`` is the
    "forecastability" Ω of Goerg (2013).  Returns ``(nan, 0)`` when
    fewer than 2 bins exist or total power is 0."""
    xd = _detrend(x, detrend)
    _, spec = _density_periodogram(xd)
    spec = spec[1:]
    k = len(spec)
    if k < 2:
        return float("nan"), 0
    total = spec.sum()
    if not total > 0:
        return float("nan"), 0
    p = spec / total
    nz = p[p > 0]
    h = float(-(nz * np.log(nz)).sum() / np.log(k))
    return h, k


def periodogram(x, *, detrend="diff", fs: float = 1.0):
    """Return (periods, scaled_power) of significant spectral peaks."""
    x = _detrend(x, detrend)
    freqs, pgram = _density_periodogram(x, fs)
    skip = len(x) // 1000  # unstable leading bins on long series
    freqs, pgram = freqs[skip:], pgram[skip:]
    with np.errstate(divide="ignore"):
        periods = 1.0 / freqs
    return significant_periods(periods, pgram)


def _lombscargle(times: np.ndarray, x: np.ndarray,
                 freqs: np.ndarray) -> np.ndarray:
    """Classic (unnormalized, uncentered) Lomb-Scargle periodogram,
    matching scipy ``lombscargle`` defaults.  Vectorized O(n * m)."""
    t = np.asarray(times, dtype=float)[None, :]
    y = np.asarray(x, dtype=float)[None, :]
    w = np.asarray(freqs, dtype=float)[:, None]
    # one sin/cos pair per (freq, t); double-angle and angle-subtraction
    # identities replace the other two trig evaluations (2x fewer trig
    # calls on the m-by-n grid — the hot loop at many series)
    swt = np.sin(w * t)
    cwt = np.cos(w * t)
    sin2 = 2.0 * swt * cwt            # sin(2wt)
    cos2 = cwt * cwt - swt * swt      # cos(2wt)
    tau = np.arctan2(sin2.sum(axis=1), cos2.sum(axis=1)) / (2.0 * w[:, 0])
    wtau = w[:, 0] * tau
    sw, cw = np.sin(wtau)[:, None], np.cos(wtau)[:, None]
    c = cwt * cw + swt * sw           # cos(wt - wtau)
    s = swt * cw - cwt * sw           # sin(wt - wtau)
    yc = np.sum(y * c, axis=1)
    ys = np.sum(y * s, axis=1)
    cc = np.sum(c * c, axis=1)
    ss = np.sum(s * s, axis=1)
    return 0.5 * (yc ** 2 / cc + ys ** 2 / ss)


def periodogram_nonequispaced(times, x, *, freqs=None, period_low=None,
                              period_high=None, n_periods=1000,
                              detrend="linear"):
    """Lomb-Scargle for non-equispaced series (``functions.py:109-174``)."""
    times = np.asarray(times, dtype=float)
    x = _detrend(x, detrend)
    if detrend == "diff":
        times = times[1:]
    if freqs is None:
        percentile = np.percentile(np.diff(times), [5, 80])
        if period_low is None:
            period_low = percentile[0]
        if period_high is None:
            period_high = max(200 * period_low, percentile[1])
        periods = np.linspace(period_high, period_low, n_periods)
        freqs = 2 * np.pi / periods
    else:
        periods = 2 * np.pi / np.asarray(freqs, dtype=float)
    pgram = _lombscargle(times, x, freqs)
    pgram = pgram * 2 / (len(x) * x.std() ** 2)
    return significant_periods(periods, pgram)
