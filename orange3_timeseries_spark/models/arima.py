"""ARIMA(p, d, q) in pure NumPy via Hannan-Rissanen two-stage estimation
(cf. the reference's statsmodels wrapper, ``models.py:279-328``; the
estimation algorithm itself follows the published Hannan-Rissanen method —
long-AR residual proxy, then OLS on AR + MA lag regressors).

Forecast confidence intervals use the MA(infinity) psi-weight expansion of
the integrated process: ``var_h = sigma^2 * sum_{i<h} psi_i^2``, CI =
forecast ± z_{1-alpha/2} * sqrt(var_h) — the standard Box-Jenkins interval
(what ``results.get_forecast().conf_int()`` produces for Gaussian ARIMA,
``models.py:312-316``).

Exogenous regressors (ARIMAX, ``use_exog`` — ``models.py:301-310``) enter
the stage-2 OLS linearly; forecasting then requires future exog rows.
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.models._stats import lagmat, norm_ppf, ols
from orange3_timeseries_spark.models.base import BaseModel


class _ArimaResults:
    def __init__(self, const, phi, theta, beta_exog, sigma2, resid,
                 fitted_diff, aic, bic):
        self.const = const
        self.phi = phi
        self.theta = theta
        self.beta_exog = beta_exog
        self.sigma2 = sigma2
        self.resid = resid
        self.fitted_diff = fitted_diff
        self.aic = aic
        self.bic = bic


def arma_psi_weights(phi: np.ndarray, theta: np.ndarray, d: int,
                     n: int) -> np.ndarray:
    """First n psi weights of the ARIMA(p,d,q) MA(infinity) expansion:
    psi(B) = theta(B) / (phi(B) * (1-B)^d)."""
    # AR polynomial of the integrated process: phi(B)*(1-B)^d
    ar = np.array([1.0] + [-p for p in phi])
    for _ in range(d):
        ar = np.convolve(ar, [1.0, -1.0])
    ma = np.array([1.0] + list(theta))
    psi = np.zeros(n)
    psi[0] = 1.0
    for i in range(1, n):
        acc = ma[i] if i < len(ma) else 0.0
        for j in range(1, min(i, len(ar) - 1) + 1):
            acc -= ar[j] * psi[i - j]
        psi[i] = acc
    return psi


def arma_forecast_diff(const, phi, theta, w_hist, e_hist,
                       steps: int) -> np.ndarray:
    """Point forecasts on the DIFFERENCED scale: the exact conditional
    ARMA recursion ``ARIMA._predict`` runs (future innovations zero,
    left-to-right accumulation).  Shared by the live model and the
    model registry's refit-free serving — the recursion only reads the
    last ``len(phi)`` of ``w_hist`` and last ``len(theta)`` of
    ``e_hist``, so tails are sufficient."""
    p, q = len(phi), len(theta)
    w_ext = list(w_hist)
    e_ext = list(e_hist)
    e_hist_len = len(e_ext)
    preds_diff = []
    for _h in range(steps):
        val = const
        for i in range(p):
            val += phi[i] * w_ext[-1 - i]
        for j in range(q):
            idx = len(e_ext) - 1 - j
            # future innovations are zero
            e_val = 0.0 if idx >= e_hist_len else e_ext[idx]
            val += theta[j] * e_val
        preds_diff.append(val)
        w_ext.append(val)
        e_ext.append(0.0)
    return np.array(preds_diff)


def integrate_forecast(preds_diff: np.ndarray, y_levels,
                       d: int) -> np.ndarray:
    """Integrate a differenced-scale forecast ``d`` times, anchored at
    the last observed levels (needs the last ``max(d, 1)`` of
    ``y_levels``)."""
    if not d:
        return preds_diff
    forecast = preds_diff.copy()
    tail = np.asarray(y_levels, dtype=float)
    for k in range(d, 0, -1):
        base = np.diff(tail, k - 1)[-1]
        forecast = base + np.cumsum(forecast)
    return forecast


def _ne_ols_quantized(y, X, scales):
    """Normal-equation OLS for the ``quantize=`` firewall path:
    ``(beta, resid, rss)`` from a Gram system accumulated in EXACT
    integer units.

    Each regressor column is snapped to its decimal grid (``scales[j]``
    units per 1.0: 100 for the constant and the 0.01-grid series
    columns, 1000 for the 3dp-rounded innovation proxies) and the
    normal-equation entries are computed as int64 sums — exact, hence
    identical no matter which order any engine accumulates them in —
    then descaled by one power-of-ten division per entry.  This is the
    only formulation that survives a cross-engine replay: float Gram
    sums differ by accumulation order (~1e-13 relative, enough to
    straddle the coefficient rounding boundary for a few series per
    thousand), and ROUNDED float Gram sums are worse — sums of
    decimal-grid products land EXACTLY on rounding-grid ties, where
    engines' tie rules and 1-ulp noise pick different grid points.

    Falls back to plain :func:`ols` when the data is not on the assumed
    grid (max unit-snap error > 1e-6) — off-grid inputs have no replay
    oracle to protect.  Magnitude budget (ENFORCED below — np.int64
    matmuls wrap silently): falls back to plain :func:`ols` unless
    ``max|unit|² · n_rows < 2^62``; typical inputs sit at |units| <=
    ~5e5, squared products <= ~2.5e11, sums over <=1e5 rows <= ~2.5e16
    < 2^63; entries above 2^53 convert to double deterministically
    (same exact integer -> same nearest double on every engine)."""
    s = np.asarray(scales, dtype=float)
    U = X * s
    Ur = np.rint(U)
    Uy = y * 100.0
    Uyr = np.rint(Uy)
    # the TARGET must be on the grid too: the last observation appears
    # only in y (never in the lag matrix), so checking X alone would
    # let an off-grid final value through and silently misquantize it
    if np.abs(U - Ur).max() > 1e-6 or np.abs(Uy - Uyr).max() > 1e-6:
        return ols(y, X)
    # enforce the documented magnitude budget BEFORE the int64 matmuls:
    # each Gram entry is a sum of n_rows unit products, and np.int64
    # wraps silently on overflow — wrong coefficients with no error.
    # Mirrors the budget_ok guard on the stage-1 proxy path.
    umax = max(float(np.abs(Ur).max(initial=0.0)),
               float(np.abs(Uyr).max(initial=0.0)), 1.0)
    if umax * umax * max(Ur.shape[0], 1) >= 2 ** 62:
        return ols(y, X)
    U = Ur.astype(np.int64)
    uy = Uyr.astype(np.int64)
    A = (U.T @ U).astype(float) / np.outer(s, s)
    b = (U.T @ uy).astype(float) / (s * 100.0)
    try:
        beta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        beta, *_ = np.linalg.lstsq(A, b, rcond=None)
    resid = y - X @ beta
    return beta, resid, float(resid @ resid)


class ARIMA(BaseModel):
    """Autoregressive integrated moving average model (API parity with
    ``models.py:279-328``)."""

    REQUIRES_STATIONARY = False

    def __init__(self, order=(1, 0, 0), use_exog=False, method="hr",
                 quantize=None):
        """``method='hr'`` (default): Hannan-Rissanen two-stage
        conditional least squares — closed-form, deterministic, the fast
        path for millions of distributed per-series fits; numerically it
        tracks the deprecated statsmodels ARMA(css-mle + constant)
        goldens the reference's own test file keeps in comments
        (``tests/test_models.py:16-19``).

        ``method='mle'``: exact Gaussian MLE via the Kalman filter
        (``models/_kalman.py``) with the current statsmodels trend
        convention (constant term only when d == 0) — matches the
        reference's live SARIMAX goldens (``tests/test_models.py:21-27``).
        ~100x the fit cost of 'hr'; still milliseconds per series.

        ``quantize=k`` rounds the HR stage coefficients and stage-1
        residual proxies to ``k`` decimals at each stage boundary — a
        determinism firewall (same spirit as
        ``train_ivf_centroids(id_col=...)``'s per-round centroid
        rounding) so an independent engine replaying the fit through
        normal-equation elimination lands on bit-identical coefficients
        instead of chasing solver float noise.  On this path the OLS
        stages solve the NORMAL EQUATIONS with the Gram sums accumulated
        in EXACT integer units (see :func:`_ne_ols_quantized`) and the
        stage-1 residual proxies round to 3 decimals — otherwise the two
        engines' different Gram accumulation orders (pairwise vs
        sequential sums) leave the coefficients ~1e-12 apart, close
        enough to straddle the k-decimal rounding boundary at volume.
        The perturbation is orders of magnitude below statistical
        estimation error; default ``None`` leaves the numerics untouched
        (plain ``lstsq``).
        """
        super().__init__()
        self.order = tuple(order)
        self.use_exog = use_exog
        if method not in ("hr", "mle"):
            raise ValueError("method must be 'hr' or 'mle'")
        self.method = method
        self.quantize = quantize

    def __str__(self):
        return "{}({})".format(
            "AR{}MA{}".format("I" if self.order[1] else "",
                              "X" if self.use_exog else ""),
            ",".join(map(str, self.order)))

    # ------------------------------------------------------------------ fit
    def _fit(self, endog, exog):
        p, d, q = self.order
        y = np.asarray(endog, dtype=float).ravel()
        if not self.use_exog:
            exog = None
        X = np.asarray(exog, dtype=float) if exog is not None else None
        if X is not None and X.ndim == 1:
            # a single regressor arrives 1-D; as a row-matrix it would
            # slice to ZERO regression columns downstream
            X = X.reshape(-1, 1)
        self._y_levels = y.copy()
        w = np.diff(y, d) if d else y.copy()
        Xd = X[d:] if (X is not None and d) else X

        n = len(w)
        if n <= p + q + 1:
            raise ValueError("series too short for the requested order")

        # stage 1: long AR to proxy the innovations
        m = min(max(2 * (p + q), 10, p, q), max(n // 2, 1))
        if q > 0:
            if n <= m + 1:
                m = max(n - 2, 1)
            Z = np.column_stack((np.ones(n - m), lagmat(w, m)))
            if self.quantize is None:
                beta1, e_tail, _ = ols(w[m:], Z)
            else:
                beta1, e_tail, _ = _ne_ols_quantized(
                    w[m:], Z, [100.0] * (m + 1))
            if self.quantize is not None:
                beta1 = np.round(beta1, self.quantize)
                # proxies on the 3dp grid: coarse enough that the two
                # engines' ulp-apart predictions snap to the same grid
                # point, fine enough (1e-3 on residual-scale values)
                # to leave the stage-2 fit statistically untouched --
                # and 1000-units keep the stage-2 integer Gram exact.
                # The snap itself is EXACT int64 half-away arithmetic
                # (w on 0.01-grid x100, beta1 on the 10^-k grid x10^k,
                # so the residual in 100*10^k units is an exact int):
                # a float dot + np.round would both accumulate
                # engine-specific association error AND break ties
                # half-to-even where SQL round goes half-away
                Zs = Z * 100.0
                ws = w[m:] * 100.0
                Zr, wr_ = np.rint(Zs), np.rint(ws)
                bscale = 10 ** int(self.quantize)
                # int64 budget: |w|*100*bscale and the (m+1)-term dot of
                # |Z|*100 x |beta|*bscale must both stay under 2^62 —
                # silently wrapped products would poison the proxies
                zmax = max(np.abs(Zr).max(), np.abs(wr_).max(), 1.0)
                bmax = max(np.abs(beta1).max(), 1.0)
                budget_ok = (zmax * bscale * max(bmax, 1.0)
                             * (Z.shape[1] + 1)) < 2 ** 62
                if (bscale % 10 == 0 and budget_ok
                        and np.abs(Zs - Zr).max() <= 1e-6
                        and np.abs(ws - wr_).max() <= 1e-6):
                    bu = np.rint(beta1 * bscale).astype(np.int64)
                    ru = (wr_.astype(np.int64) * bscale
                          - Zr.astype(np.int64) @ bu)
                    den = (100 * bscale) // 1000
                    eu = np.sign(ru) * ((np.abs(ru) + den // 2) // den)
                    e3 = eu / 1000.0
                else:  # off-grid input: no oracle contract to protect
                    e3 = np.round(w[m:] - Z @ beta1, 3)
                e = np.concatenate((np.zeros(m), e3))
            else:
                e = np.concatenate((np.zeros(m), w[m:] - Z @ beta1))
        else:
            e = np.zeros(n)

        # stage 2: OLS of w_t on const + w lags + e lags (+ exog)
        r = max(p, q)
        rows = n - r
        parts = [np.ones((rows, 1))]
        if p:
            parts.append(lagmat(w, p)[r - p:] if r > p else lagmat(w, p))
        if q:
            eq = lagmat(e, q)
            parts.append(eq[r - q:] if r > q else eq)
        if Xd is not None:
            parts.append(np.atleast_2d(Xd)[r:].reshape(rows, -1))
        Z2 = np.hstack(parts)
        target = w[r:]
        if self.quantize is None or Xd is not None:
            # exog columns have no decimal-grid contract -> plain OLS
            beta, resid, rss = ols(target, Z2)
        else:
            beta, resid, rss = _ne_ols_quantized(
                target, Z2, [100.0] * (1 + p) + [1000.0] * q)
        if self.quantize is not None:
            beta = np.round(beta, self.quantize)
            resid = target - Z2 @ beta
            rss = float(resid @ resid)

        const = float(beta[0])
        phi = np.array(beta[1:1 + p], dtype=float)
        theta = np.array(beta[1 + p:1 + p + q], dtype=float)
        beta_exog = np.array(beta[1 + p + q:], dtype=float) \
            if Xd is not None else None

        sigma2 = rss / rows
        k = 1 + p + q + (len(beta_exog) if beta_exog is not None else 0)
        loglik = -0.5 * rows * (np.log(2 * np.pi * sigma2) + 1)
        aic = 2 * k - 2 * loglik
        bic = k * np.log(rows) - 2 * loglik

        fitted_diff = np.concatenate((w[:r], target - resid))
        if self.method == "mle":
            self._refit_mle(w, p, q, const, phi, theta,
                            Xd=Xd, beta_hr=beta_exog)
            return
        if self.quantize is not None:
            # sigma2 rides into the psi-weight CI width: rss is a sum of
            # ~n squared residuals whose accumulation ORDER differs
            # between NumPy (pairwise) and a SQL replay (sequential), a
            # ~1e-13 relative gap that surfaces as interval-bound
            # rounding flips at volume.  Quantize it onto a 1e-4 grid —
            # far coarser than the gap, far finer than any CI use —
            # AFTER the information criteria, so AIC/BIC (and the
            # auto-order replay built on them) keep the raw value.
            # Snap through the shared half-away kernel, not np.round
            # (banker's half-even) — SQL round is half away from zero,
            # and the single-tie-rule contract lives in _rounding.py.
            from orange3_timeseries_spark.functions._rounding import (
                half_up_exact,
            )
            sigma2 = float(half_up_exact(sigma2 * 1e4)) / 1e4
        self.results = _ArimaResults(const, phi, theta, beta_exog,
                                     float(sigma2), resid, fitted_diff,
                                     float(aic), float(bic))
        self._w = w
        self._e = np.concatenate((np.zeros(r), resid))
        self._exog = Xd

    def _refit_mle(self, w, p, q, const_hr, phi_hr, theta_hr,
                   Xd=None, beta_hr=None):
        """Exact-MLE refinement: Kalman likelihood maximized from the
        Hannan-Rissanen starting values.  Trend follows the current
        statsmodels ARIMA convention the reference wraps: a mean term
        only when d == 0 (differencing absorbs the level, so SARIMAX
        fits the differenced series zero-mean).  With exog (ARIMAX,
        ``models.py:301-310``) the state-space observation picks up the
        regression effects: w_t = mu + x_t' beta + z_t, z ~ ARMA —
        beta estimated jointly in the same likelihood search."""
        from orange3_timeseries_spark.models._kalman import fit_arma_mle

        d = self.order[1]
        with_mean = d == 0
        denom = 1.0 - float(np.sum(phi_hr))
        start_mu = const_hr / denom if with_mean and abs(denom) > 1e-8 \
            else None
        mu, phi, theta, beta, sigma2, loglik, v = fit_arma_mle(
            w, p, q, with_mean,
            start_phi=phi_hr, start_theta=theta_hr, start_mu=start_mu,
            X=Xd, start_beta=beta_hr)
        # store the intercept form the forecast recursion uses:
        # w_t = const + sum phi_i w_{t-i} + ...  with const = mu*(1-sum phi)
        const = float(mu * (1.0 - np.sum(phi))) if with_mean else 0.0
        n = len(w)
        k = ((1 if with_mean else 0) + p + q + 1  # + sigma2, statsmodels
             + (len(beta) if beta is not None else 0))
        aic = 2 * k - 2 * loglik
        bic = k * np.log(n) - 2 * loglik
        resid = v if v is not None else np.zeros(n)
        fitted_diff = w - resid
        self.results = _ArimaResults(const, phi, theta, beta,
                                     float(sigma2), resid, fitted_diff,
                                     float(aic), float(bic))
        self.results.loglik = float(loglik)
        self.results.mu = float(mu)
        self._w = w
        self._e = resid
        self._exog = Xd

    # -------------------------------------------------------------- predict
    def _predict(self, steps, exog, alpha):
        p, d, q = self.order
        res = self.results
        w = self._w
        e_hist = self._e
        X_fut = None
        if self.use_exog and res.beta_exog is not None:
            if exog is None:
                raise ValueError("ARIMAX forecast requires future exog")
            X_fut = np.atleast_2d(np.asarray(exog, dtype=float))

        if self.method == "mle" and res.beta_exog is not None:
            # regression with ARMA errors: the recursion runs on the
            # regression RESIDUAL z = w - mu - X beta (the lagged terms
            # must have their own exog effect removed — unlike the HR
            # form where beta sits alongside the lag regressors), then
            # mu + x_fut' beta is added back per step.
            mu = res.mu
            z_ext = list(w - mu - self._exog @ res.beta_exog)
            e_ext = list(e_hist)
            preds_diff = []
            for h in range(steps):
                zval = 0.0
                for i in range(p):
                    zval += res.phi[i] * z_ext[-1 - i]
                for j in range(q):
                    idx = len(e_ext) - 1 - j
                    e_val = 0.0 if idx >= len(e_hist) else e_ext[idx]
                    zval += res.theta[j] * e_val
                preds_diff.append(mu + float(X_fut[h] @ res.beta_exog)
                                  + zval)
                z_ext.append(zval)
                e_ext.append(0.0)
            preds_diff = np.array(preds_diff)
            if d:
                forecast = preds_diff.copy()
                tail = self._y_levels
                for k in range(d, 0, -1):
                    base = np.diff(tail, k - 1)[-1]
                    forecast = base + np.cumsum(forecast)
            else:
                forecast = preds_diff
            psi = arma_psi_weights(res.phi, res.theta, d, steps)
            var_h = res.sigma2 * np.cumsum(psi ** 2)
            z_q = norm_ppf(1 - alpha / 2)
            err = z_q * np.sqrt(var_h)
            return forecast, forecast - err, forecast + err

        if X_fut is None:
            # the persistable recursion — shared with the model
            # registry's refit-free serving path (models/registry.py),
            # so "saved model forecasts bit-identically" is structural
            preds_diff = arma_forecast_diff(res.const, res.phi,
                                            res.theta, w, e_hist, steps)
        else:
            w_ext = list(w)
            e_ext = list(e_hist)
            preds_diff = []
            for h in range(steps):
                val = res.const
                for i in range(p):
                    val += res.phi[i] * w_ext[-1 - i]
                for j in range(q):
                    idx = len(e_ext) - 1 - j
                    # future innovations are zero
                    e_val = 0.0 if idx >= len(e_hist) else e_ext[idx]
                    val += res.theta[j] * e_val
                val += float(X_fut[h] @ res.beta_exog)
                preds_diff.append(val)
                w_ext.append(val)
                e_ext.append(0.0)
            preds_diff = np.array(preds_diff)

        forecast = integrate_forecast(preds_diff, self._y_levels, d)

        psi = arma_psi_weights(res.phi, res.theta, d, steps)
        var_h = res.sigma2 * np.cumsum(psi ** 2)
        z = norm_ppf(1 - alpha / 2)
        err = z * np.sqrt(var_h)
        return forecast, forecast - err, forecast + err

    def _fittedvalues(self):
        """In-sample one-step predictions on the *levels* scale
        (the reference's ``typ='levels'`` for d>0, ``models.py:324-328``)."""
        p, d, q = self.order
        fitted_diff = self.results.fitted_diff
        if not d:
            return fitted_diff
        y = self._y_levels
        # fitted level at t = y_{t-1} + ... (sum of lower-order diffs) +
        # fitted d-th difference; reconstruct via the identity
        # w_t = Δ^d y_t  =>  ŷ_t = y_t - (w_t - ŵ_t)
        w = self._w
        resid_full = np.concatenate(
            (np.zeros(len(w) - len(self.results.resid)), self.results.resid))
        return y[d:] - (w - fitted_diff)  # == y - residual on level scale
