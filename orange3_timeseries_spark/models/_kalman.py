"""Exact Gaussian ARMA likelihood via the Kalman filter, pure NumPy —
the estimation core behind ``ARIMA(method='mle')`` (the reference wraps
statsmodels' state-space ARIMA, ``models.py:279-328``; this reimplements
the same published machinery: Harvey's ARMA state-space form, stationary
initialization, concentrated sigma^2, Monahan's stationarity transform,
Nelder-Mead maximization).

Driver-side cost is nil — the per-series fit runs inside the Arrow
workers exactly like the Hannan-Rissanen path; an MLE fit of a
(2,1,0)-order model on a 150-point series is a few hundred 3x3 filter
passes (~ms).
"""

from __future__ import annotations

import numpy as np


def harvey_system(phi: np.ndarray, theta: np.ndarray):
    """Harvey's ARMA(p, q) state-space matrices: state dim
    m = max(p, q+1); alpha_{t+1} = T alpha_t + R eps_{t+1};
    y_t = alpha_t[0]."""
    p, q = len(phi), len(theta)
    m = max(p, q + 1)
    T = np.zeros((m, m))
    T[:p, 0] = phi
    T[:m - 1, 1:] = np.eye(m - 1)
    R = np.zeros(m)
    R[0] = 1.0
    R[1:q + 1] = theta
    return T, R


def stationary_cov(T: np.ndarray, RRt: np.ndarray) -> np.ndarray:
    """Solve P = T P T' + RR' (discrete Lyapunov) by the Kronecker
    inverse — exact for the small state dims ARMA produces."""
    m = T.shape[0]
    A = np.eye(m * m) - np.kron(T, T)
    vec = np.linalg.solve(A, RRt.ravel())
    return vec.reshape(m, m)


def arma_loglik_concentrated(w: np.ndarray, phi: np.ndarray,
                             theta: np.ndarray):
    """Exact log-likelihood of zero-mean ARMA(p, q) with sigma^2
    concentrated out.  Returns ``(loglik, sigma2_hat, innovations,
    innovation_vars)`` — innovations are the one-step prediction errors
    v_t with variances sigma2_hat * f_t."""
    w = np.asarray(w, dtype=float)
    n = len(w)
    T, R = harvey_system(np.asarray(phi, float), np.asarray(theta, float))
    m = T.shape[0]
    RRt = np.outer(R, R)
    try:
        P = stationary_cov(T, RRt)
    except np.linalg.LinAlgError:
        return -np.inf, np.nan, None, None
    if not np.isfinite(P).all():
        return -np.inf, np.nan, None, None
    a = np.zeros(m)
    ssq = 0.0
    sumlogf = 0.0
    v_all = np.empty(n)
    f_all = np.empty(n)
    for t in range(n):
        f = P[0, 0]
        if not np.isfinite(f) or f <= 0:
            return -np.inf, np.nan, None, None
        v = w[t] - a[0]
        v_all[t] = v
        f_all[t] = f
        ssq += v * v / f
        sumlogf += np.log(f)
        K = P[:, 0] / f
        a = T @ (a + K * v)
        P_post = P - np.outer(K, P[0, :])
        P = T @ P_post @ T.T + RRt
    sigma2 = ssq / n
    if sigma2 <= 0:
        return -np.inf, np.nan, None, None
    loglik = -0.5 * (n * np.log(2 * np.pi) + sumlogf
                     + n * np.log(sigma2) + n)
    return float(loglik), float(sigma2), v_all, f_all


def ar_transparams(x: np.ndarray) -> np.ndarray:
    """Monahan's transform: unconstrained R^p -> stationary AR
    coefficients (via partial autocorrelations in (-1, 1) and the
    Levinson-Durbin recursion) — the standard device that lets an
    unconstrained optimizer search only the stationary region."""
    x = np.asarray(x, dtype=float)
    r = x / np.sqrt(1.0 + x * x)
    y = r.copy()
    for j in range(1, len(r)):
        y[:j] = y[:j] - r[j] * y[:j][::-1]
    return y


def ar_untransparams(phi: np.ndarray) -> np.ndarray:
    """Inverse of :func:`ar_transparams` (for starting values); falls
    back to zeros when the start is outside the stationary region."""
    phi = np.asarray(phi, dtype=float)
    p = len(phi)
    if p == 0:
        return np.empty(0)
    r = np.zeros(p)
    y = phi.copy()
    for j in range(p - 1, 0, -1):
        rj = y[j]
        if abs(rj) >= 1:
            return np.zeros(p)
        r[j] = rj
        prev = (y[:j] + rj * y[:j][::-1]) / (1.0 - rj * rj)
        y = np.concatenate([prev, [0.0] * (p - j)])
    if abs(y[0]) >= 1:
        return np.zeros(p)
    r[0] = y[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        x = r / np.sqrt(1.0 - r * r)
    return np.nan_to_num(x)


def nelder_mead(f, x0, xatol=1e-8, fatol=1e-10, max_iter=5000):
    """Minimal Nelder-Mead simplex minimizer (NumPy-only; standard
    reflection/expansion/contraction/shrink coefficients)."""
    x0 = np.asarray(x0, dtype=float)
    n = len(x0)
    if n == 0:
        return x0, f(x0)
    sim = np.vstack([x0] + [
        x0 + (0.05 if x0[i] != 0 else 0.00025) * np.eye(n)[i]
        for i in range(n)])
    fsim = np.array([f(x) for x in sim])
    for _ in range(max_iter):
        order = np.argsort(fsim)
        sim, fsim = sim[order], fsim[order]
        if (np.max(np.abs(sim[1:] - sim[0])) <= xatol
                and np.max(np.abs(fsim[1:] - fsim[0])) <= fatol):
            break
        centroid = sim[:-1].mean(axis=0)
        xr = centroid + (centroid - sim[-1])
        fr = f(xr)
        if fr < fsim[0]:
            xe = centroid + 2.0 * (centroid - sim[-1])
            fe = f(xe)
            sim[-1], fsim[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fsim[-2]:
            sim[-1], fsim[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (sim[-1] - centroid)
            fc = f(xc)
            if fc < fsim[-1]:
                sim[-1], fsim[-1] = xc, fc
            else:
                sim[1:] = sim[0] + 0.5 * (sim[1:] - sim[0])
                fsim[1:] = [f(x) for x in sim[1:]]
    order = np.argsort(fsim)
    return sim[order][0], fsim[order][0]


def fit_arma_mle(w: np.ndarray, p: int, q: int, with_mean: bool,
                 start_phi=None, start_theta=None, start_mu=None,
                 X=None, start_beta=None):
    """Exact MLE of ARMA(p, q) (+ optional mean, + optional exogenous
    regression effects) on ``w``.

    With ``X`` (n x k design matrix) the model is regression with ARMA
    errors — ``w_t = mu + x_t' beta + z_t`` where z is zero-mean
    ARMA(p, q) — i.e. the exog convention of statsmodels SARIMAX, which
    the reference exposes through ``use_exog`` (``models.py:301-310``).
    beta is estimated jointly with the ARMA parameters by the same
    Nelder-Mead search (unconstrained coordinates).

    Returns ``(mu, phi, theta, beta, sigma2, loglik, innovations)``;
    ``beta`` is None when ``X`` is None.  The ARMA parameter space is
    searched through Monahan's transform (AR and MA both), so every
    iterate is stationary and invertible — matching statsmodels'
    ``enforce_stationarity/invertibility`` defaults.
    """
    w = np.asarray(w, dtype=float)
    phi0 = np.zeros(p) if start_phi is None else np.asarray(start_phi, float)
    th0 = np.zeros(q) if start_theta is None else np.asarray(start_theta,
                                                             float)
    mu0 = float(np.mean(w)) if start_mu is None else float(start_mu)
    if X is not None:
        X = np.atleast_2d(np.asarray(X, dtype=float))
        if X.shape[0] != len(w):
            X = X.reshape(len(w), -1)
        k = X.shape[1]
        beta0 = np.asarray(start_beta, float).ravel() \
            if start_beta is not None else np.empty(0)
        if len(beta0) != k:
            beta0 = np.zeros(k)
    else:
        k = 0
        beta0 = np.empty(0)
    x0 = np.concatenate([
        [mu0] if with_mean else [],
        ar_untransparams(phi0),
        ar_untransparams(-th0),  # MA uses the same transform on -theta
        beta0])

    def unpack(x):
        i = 1 if with_mean else 0
        mu = x[0] if with_mean else 0.0
        phi = ar_transparams(x[i:i + p]) if p else np.empty(0)
        theta = -ar_transparams(x[i + p:i + p + q]) if q else np.empty(0)
        beta = x[i + p + q:i + p + q + k] if k else None
        return mu, phi, theta, beta

    def neg_loglik(x):
        mu, phi, theta, beta = unpack(x)
        z = w - mu if beta is None else w - mu - X @ beta
        ll, _, _, _ = arma_loglik_concentrated(z, phi, theta)
        return -ll if np.isfinite(ll) else 1e300

    xbest, _ = nelder_mead(neg_loglik, x0)
    mu, phi, theta, beta = unpack(xbest)
    z = w - mu if beta is None else w - mu - X @ beta
    ll, sigma2, v, f = arma_loglik_concentrated(z, phi, theta)
    return mu, phi, theta, beta, sigma2, ll, v
