"""Model base contract mirroring the reference's ``_BaseModel``
(``models.py:19-277``): ``fit(endog, exog)``, ``predict(steps, alpha,
as_table)`` -> (forecast, ci_low, ci_high), ``fittedvalues()``,
``residuals()``, ``errors()``, ``copy()/clear()``, ``max_order``.

The forecast-table naming contract (``models.py:210-228``) is preserved:
``"{var} (forecast)"``, ``"{var} ({p}%CI low)"``, ``"{var} ({p}%CI high)"``;
fitted/residual tables use ``"{var} (fitted)"`` / ``"{var} (residuals)"``
(``models.py:99,127``) — these names ARE the API the reference's consumers
key on (SURVEY §1.4).
"""

from __future__ import annotations

from copy import deepcopy
from typing import Optional, Sequence

import numpy as np


class NotFittedError(ValueError, AttributeError):
    """Raised when predictions are requested before fit()."""


class BaseModel:
    REQUIRES_STATIONARY = True
    SUPPORTS_VECTOR = False

    def __init__(self):
        self.results = None
        self.order = ()
        self._endog = None
        self._var_names: Optional[Sequence[str]] = None

    # ------------------------------------------------------------------ api
    def fit(self, endog, exog=None, var_names=None):
        endog = np.asarray(endog, dtype=float)
        if endog.size == 0:
            raise ValueError("Input series are empty. Nothing to learn.")
        # trailing-NaN target truncation (``models.py:137-150``)
        if endog.ndim == 1:
            defined = np.where(~np.isnan(endog))[0]
            if len(defined):
                endog = endog[: defined[-1] + 1]
                if exog is not None:
                    exog = np.asarray(exog, dtype=float)[: len(endog)]
        self._endog = endog
        self._var_names = list(var_names) if var_names else None
        self._fit(endog, exog)
        return self

    def _fit(self, endog, exog):
        raise NotImplementedError

    def _predict(self, steps, exog, alpha):
        raise NotImplementedError

    def _fittedvalues(self) -> np.ndarray:
        raise NotImplementedError

    def _check_fitted(self):
        if self.results is None:
            raise NotFittedError(
                "Model must be fitted first (see fit() method)")

    def predict(self, steps=1, exog=None, *, alpha=0.05, as_table=False):
        """Forecast -> (forecast, ci_low, ci_high) arrays, or the
        naming-contract table (list of column dicts) with ``as_table``."""
        self._check_fitted()
        forecast, low, high = self._predict(steps, exog, alpha)
        if not as_table:
            return np.asarray([forecast, low, high])
        return self._as_forecast_columns(forecast, low, high,
                                         int((1 - alpha) * 100))

    def fittedvalues(self, as_table: bool = False):
        """In-sample predictions; with ``as_table``, the naming-contract
        columns ``"{var} (fitted)"`` (``models.py:99``)."""
        self._check_fitted()
        fitted = self._fittedvalues()
        if not as_table:
            return fitted
        return self._named_columns(fitted, "fitted")

    def residuals(self, as_table: bool = False):
        """In-sample residuals; with ``as_table``, columns
        ``"{var} (residuals)"`` (``models.py:127``)."""
        self._check_fitted()
        endog = self._endog
        fitted = self._fittedvalues()
        resid = endog[-len(fitted):] - fitted
        if not as_table:
            return resid
        return self._named_columns(resid, "residuals")

    def _named_columns(self, arr, suffix):
        arr = np.asarray(arr, dtype=float)
        if arr.ndim == 1:
            arr = arr[:, None]
        return {f"{name} ({suffix})": arr[:, i]
                for i, name in enumerate(self._names(arr.shape[1]))}

    def errors(self) -> dict:
        """In-sample error measures (``models.py:192-208``)."""
        from orange3_timeseries_spark.functions.metrics import (
            mae, mape, pocid, r2, rmse,
        )
        self._check_fitted()
        true = self._endog if self._endog.ndim == 1 else self._endog[:, 0]
        pred = self._fittedvalues()
        if pred.ndim > 1:
            pred = pred[:, 0]
        return dict(r2=r2(true, pred), mae=mae(true, pred),
                    rmse=rmse(true, pred), mape=mape(true, pred),
                    pocid=pocid(true, pred))

    def _names(self, n_vars):
        if self._var_names and len(self._var_names) >= n_vars:
            return list(self._var_names[:n_vars])
        return [str(i) for i in range(n_vars)]

    def _as_forecast_columns(self, forecast, low, high, confidence):
        forecast = np.asarray(forecast, dtype=float)
        low = np.asarray(low, dtype=float)
        high = np.asarray(high, dtype=float)
        if forecast.ndim == 1:  # univariate: (steps,) -> (steps, 1)
            forecast = forecast[:, None]
            low = low[:, None]
            high = high[:, None]
        n_vars = forecast.shape[1]
        cols = {}
        for i, name in enumerate(self._names(n_vars)):
            cols[f"{name} (forecast)"] = forecast[:, i]
            cols[f"{name} ({confidence}%CI low)"] = low[:, i]
            cols[f"{name} ({confidence}%CI high)"] = high[:, i]
        return cols

    @property
    def max_order(self):
        return max((o for o in self.order if o is not None), default=0)

    @staticmethod
    def forecast_column_metadata(names, confidence: int) -> dict:
        """The reference's variable cross-links (``models.py:216-222``:
        ``low.ci_percent = high.ci_percent = confidence`` and
        ``mean.ci_attrs = (low, high)``) as plain column-metadata dicts —
        the Spark-native carrier is ``StructField.metadata`` (attached by
        :func:`models.spark.forecast_wide_table`), which chart-style
        consumers can key on to pair a forecast column with its CI
        columns."""
        meta = {}
        for name in names:
            lo = f"{name} ({confidence}%CI low)"
            hi = f"{name} ({confidence}%CI high)"
            meta[f"{name} (forecast)"] = {"ci_attrs": [lo, hi]}
            meta[lo] = {"ci_percent": confidence}
            meta[hi] = {"ci_percent": confidence}
        return meta

    def clear(self):
        self.results = None
        self._endog = None
        self._var_names = None

    def copy(self):
        return deepcopy(self)
