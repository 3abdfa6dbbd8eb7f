"""Vector autoregression VAR(p) in pure NumPy (cf. the reference's
statsmodels wrapper, ``models.py:331-403``).

Fit is the standard multivariate least squares: stack deterministic trend
terms (per ``trend`` in {'nc'/'n', 'c', 'ct', 'ctt'} — the reference's
statsmodels convention, ``models.py:342-346``) with ``p`` lags of all
variables and solve one OLS per equation jointly.

Order selection (``ic`` in {'aic','bic','hqic','fpe','magic'}) refits at
each lag 0..maxlags and minimizes the criterion; ``'magic'`` averages the
selected order across all four criteria and floors, mirroring
``models.py:387-391`` (``sum(ic_results.values()) // len(ic_results)``).

Forecast confidence intervals use the normal quantile times the square
root of the diagonal of the h-step forecast MSE matrices
``Sigma_h = sum_{i<h} Psi_i Sigma Psi_i'`` — exactly the reference's
workaround for the broken upstream ``forecast_interval``
(``models.py:393-402``).
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.models._stats import norm_ppf
from orange3_timeseries_spark.models.base import BaseModel

IC_MAGIC = "magic"
_ICS = ("aic", "bic", "hqic", "fpe")


def _trend_terms(trend: str, nobs: int, offset: int = 0) -> np.ndarray:
    """Deterministic regressor block: shape (nobs, n_trend)."""
    t = np.arange(offset + 1, offset + nobs + 1, dtype=float)
    if trend in ("nc", "n"):
        return np.empty((nobs, 0))
    if trend == "c":
        return np.ones((nobs, 1))
    if trend == "ct":
        return np.column_stack((np.ones(nobs), t))
    if trend == "ctt":
        return np.column_stack((np.ones(nobs), t, t ** 2))
    raise ValueError(f"unknown trend {trend!r}")


def _design(y: np.ndarray, p: int, trend: str):
    """(Z, target) for VAR(p): rows t = p..n-1, regressors =
    [trend | y_{t-1} | ... | y_{t-p}]."""
    n, k = y.shape
    rows = n - p
    blocks = [_trend_terms(trend, rows, offset=p)]
    for lag in range(1, p + 1):
        blocks.append(y[p - lag: n - lag])
    Z = np.hstack(blocks)
    return Z, y[p:]


class _VarResults:
    def __init__(self, coefs, trend_coefs, sigma_u, resid, fitted, k_ar,
                 neqs, nobs, trend, ics):
        self.coefs = coefs            # (p, k, k): coefs[i] = A_{i+1}
        self.trend_coefs = trend_coefs  # (n_trend, k)
        self.sigma_u = sigma_u        # (k, k) residual covariance (df-adj)
        self.resid = resid
        self.fitted = fitted
        self.k_ar = k_ar
        self.neqs = neqs
        self.nobs = nobs
        self.trend = trend
        self.aic = ics["aic"]
        self.bic = ics["bic"]
        self.hqic = ics["hqic"]
        self.fpe = ics["fpe"]

    def psi_weights(self, steps: int) -> np.ndarray:
        """MA-representation matrices Psi_0..Psi_{steps-1}."""
        k, p = self.neqs, self.k_ar
        psi = np.zeros((steps, k, k))
        psi[0] = np.eye(k)
        for h in range(1, steps):
            acc = np.zeros((k, k))
            for i in range(1, min(h, p) + 1):
                acc += self.coefs[i - 1] @ psi[h - i]
            psi[h] = acc
        return psi

    def mse(self, steps: int) -> np.ndarray:
        """Forecast-error covariance for horizons 1..steps: (steps, k, k)."""
        psi = self.psi_weights(steps)
        out = np.zeros((steps, self.neqs, self.neqs))
        acc = np.zeros((self.neqs, self.neqs))
        for h in range(steps):
            acc = acc + psi[h] @ self.sigma_u @ psi[h].T
            out[h] = acc
        return out

    def forecast(self, y_hist: np.ndarray, steps: int) -> np.ndarray:
        """Recursive point forecast from the last k_ar rows of history."""
        p, k = self.k_ar, self.neqs
        hist = list(np.asarray(y_hist, dtype=float)[-p:]) if p else []
        out = np.zeros((steps, k))
        n_tr = self.trend_coefs.shape[0]
        for h in range(steps):
            tr = _trend_terms(self.trend, 1, offset=self.nobs + self.k_ar + h)
            val = tr @ self.trend_coefs if n_tr else np.zeros((1, k))
            val = val.ravel()
            for i in range(1, p + 1):
                val = val + self.coefs[i - 1] @ hist[-i]
            out[h] = val
            if p:
                hist.append(val)
        return out


def _fit_var(y: np.ndarray, p: int, trend: str) -> _VarResults:
    n, k = y.shape
    Z, target = _design(y, p, trend)
    rows = Z.shape[0]
    if Z.shape[1]:
        beta, *_ = np.linalg.lstsq(Z, target, rcond=None)
    else:
        beta = np.zeros((0, k))
    fitted = Z @ beta if Z.shape[1] else np.zeros_like(target)
    resid = target - fitted
    n_trend = _trend_terms(trend, 1).shape[1]
    trend_coefs = beta[:n_trend]
    coefs = np.zeros((p, k, k))
    for lag in range(p):
        # block for lag i+1 occupies rows n_trend + i*k .. + k; each column
        # of beta is one equation, so A_i[eq, :] = beta[rows, eq].T
        coefs[lag] = beta[n_trend + lag * k: n_trend + (lag + 1) * k].T

    df_model = n_trend + p * k
    df_resid = max(rows - df_model, 1)
    sigma_ml = resid.T @ resid / rows
    sigma_u = resid.T @ resid / df_resid
    sign, logdet = np.linalg.slogdet(
        sigma_ml if np.linalg.det(sigma_ml) > 0 else
        sigma_ml + 1e-12 * np.eye(k))
    ld = logdet if sign > 0 else -np.inf
    free = p * k * k + k * n_trend
    ics = {
        "aic": ld + 2.0 / rows * free,
        "bic": ld + np.log(rows) / rows * free,
        "hqic": ld + 2.0 * np.log(np.log(max(rows, 3))) / rows * free,
        "fpe": ((rows + df_model) / max(rows - df_model, 1)) ** k
               * np.exp(ld),
    }
    return _VarResults(coefs, trend_coefs, sigma_u, resid, fitted, p, k,
                       rows, trend, ics)


class VAR(BaseModel):
    """Vector auto-regression (API parity with ``models.py:331-403``)."""

    SUPPORTS_VECTOR = True
    MAX_LAGS = staticmethod(lambda arr: int(12 * (len(arr) / 10) ** 0.5))

    def __init__(self, maxlags=None, ic=None, trend="c"):
        super().__init__()
        self.ic = ic
        self.trend = trend
        self._ic_magic = ic == IC_MAGIC
        self.order = (maxlags,)
        self._maxlags = maxlags

    def __str__(self):
        args = ("auto" if self._maxlags is None else self._maxlags,
                self.ic, self.trend if self.trend != "c" else None)
        return "VAR({})".format(",".join(str(a) for a in args if a))

    def select_order(self, maxlags: int, y: np.ndarray) -> dict:
        """Minimizing lag per criterion over 0..maxlags."""
        best = {ic: (np.inf, 0) for ic in _ICS}
        for p in range(0, maxlags + 1):
            if y.shape[0] - p <= p * y.shape[1] + 3:
                break
            r = _fit_var(y, p, self.trend)
            for ic in _ICS:
                v = getattr(r, ic)
                if v < best[ic][0]:
                    best[ic] = (v, p)
        return {ic: p for ic, (_, p) in best.items()}

    def _fit(self, endog, exog):
        y = np.asarray(endog, dtype=float)
        if y.ndim == 1:
            y = y[:, None]
        if exog is not None:
            x = np.asarray(exog, dtype=float)
            if x.ndim == 1:
                x = x[:, None]
            y = np.column_stack((y, x)) if y.size else x
        # drop rows with NaN (reference fits interpolated data upstream)
        y = y[~np.isnan(y).any(axis=1)]

        maxlags = self._maxlags
        if maxlags is None:
            maxlags = min(self.MAX_LAGS(y), max((len(y) - 2) // (y.shape[1] + 1), 1))
        if self._ic_magic:
            sel = self.select_order(maxlags, y)
            p = sum(sel.values()) // len(sel)
        elif self.ic in _ICS:
            p = self.select_order(maxlags, y)[self.ic]
        else:
            p = maxlags
        self.order = (p,)
        self._y = y
        self.results = _fit_var(y, p, self.trend)

    def _predict(self, steps, exog, alpha):
        assert 0 < alpha < 1
        res = self.results
        y = (np.asarray(exog, dtype=float) if exog is not None
             else self._y)[-res.k_ar:] if res.k_ar else np.empty((0, res.neqs))
        forecast = res.forecast(y, steps)
        q = norm_ppf(1 - alpha / 2)
        sigma = np.sqrt(np.abs(np.diagonal(res.mse(steps), axis1=1, axis2=2)))
        err = q * sigma
        # shape (steps, k) each — transpose handled by as_table layer
        return forecast, forecast - err, forecast + err

    def _fittedvalues(self):
        return self.results.fitted

    def residuals(self):
        self._check_fitted()
        return self.results.resid
