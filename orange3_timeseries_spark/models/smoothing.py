"""Exponential-smoothing models under the reference's model contract.

``HoltWinters`` wraps the Holt / Holt-Winters recursions
(functions/correlation.py) in the ``BaseModel`` API
(fit / predict / fittedvalues / residuals, forecast-table naming
contract), so smoothing models drop into everything the ARIMA/VAR pair
already works with — including rolling-origin ``model_evaluation`` and
the per-series distributed fit wrappers.

Forecast intervals are the large-sample approximation
ŷ ± z·σ̂_resid·√h (σ̂ from one-step in-sample residuals) — smoothing
models carry no closed-form state covariance here; documented as
approximate, monotone-widening in h.
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.models._stats import norm_ppf
from orange3_timeseries_spark.models.base import BaseModel


class HoltWinters(BaseModel):
    """Holt linear trend (``m=None``) or additive Holt-Winters
    (``m`` = season length, needs ≥ 2m observations)."""

    REQUIRES_STATIONARY = False
    SUPPORTS_VECTOR = False

    def __init__(self, m: int = None, alpha: float = 0.5,
                 beta: float = 0.3, gamma: float = 0.4):
        super().__init__()
        self.m = m
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.gamma = float(gamma)
        self.order = (m or 0,)

    def _fit(self, endog, exog):
        if exog is not None:
            raise ValueError("HoltWinters supports no exogenous terms")
        x = np.asarray(endog, dtype=float)
        if x.ndim != 1:
            raise ValueError("HoltWinters is univariate")
        a, b_, g, m = self.alpha, self.beta, self.gamma, self.m
        fitted = np.full(len(x), np.nan)
        if m is None:
            if len(x) < 2:
                raise ValueError("need at least 2 observations")
            l = x[0]
            b = x[1] - x[0]
            for t in range(1, len(x)):
                fitted[t] = l + b
                l_new = a * x[t] + (1 - a) * (l + b)
                b = b_ * (l_new - l) + (1 - b_) * b
                l = l_new
            season = []
        else:
            if len(x) < 2 * m:
                raise ValueError(f"need at least {2 * m} observations")
            l = float(np.mean(x[:m]))
            b = (float(np.mean(x[m:2 * m])) - l) / m
            season = [x[i] - l for i in range(m)]
            for t in range(m, len(x)):
                s_old = season[0]
                fitted[t] = l + b + s_old
                l_new = a * (x[t] - s_old) + (1 - a) * (l + b)
                b = b_ * (l_new - l) + (1 - b_) * b
                l = l_new
                season = season[1:] + [g * (x[t] - l_new)
                                       + (1 - g) * s_old]
        resid = x - fitted
        sd = float(np.nanstd(resid)) if np.isfinite(resid).any() else 0.0
        self.results = {"level": l, "trend": b, "season": season,
                        "resid_sd": sd, "fitted": fitted}

    def _fittedvalues(self):
        return self.results["fitted"]

    def _predict(self, steps, exog, alpha):
        if exog is not None:
            raise ValueError("HoltWinters supports no exogenous terms")
        r = self.results
        l, b, season = r["level"], r["trend"], r["season"]
        fc = np.empty(steps)
        for h in range(1, steps + 1):
            s = season[(h - 1) % len(season)] if season else 0.0
            fc[h - 1] = l + h * b + s
        z = norm_ppf(1 - alpha / 2.0)
        half = z * r["resid_sd"] * np.sqrt(np.arange(1, steps + 1))
        return fc, fc - half, fc + half
