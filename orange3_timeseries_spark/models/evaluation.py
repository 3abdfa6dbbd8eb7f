"""Rolling-origin model evaluation (cf. ``functions.py:495-582`` in the
reference): for fold f in 1..n_folds, fit on ``y[:-f*steps]``, forecast
``steps`` ahead, pool all out-of-fold predictions, then score pooled
true-vs-pred with RMSE / MAE / MAPE / POCID / R2 plus in-sample AIC/BIC;
one extra "(in-sample)" row per model scores the full-fit fitted values.

Output shape matches the reference exactly: a list of lists with the
header row ``['Model', 'RMSE', 'MAE', 'MAPE', 'POCID', 'R²', 'AIC',
'BIC']`` and two rows per model.
"""

from __future__ import annotations

import numpy as np

from orange3_timeseries_spark.functions.metrics import (
    mae, mape, pocid, r2, rmse,
)

HEADER = ["Model", "RMSE", "MAE", "MAPE", "POCID", "R²", "AIC", "BIC"]


def _score_vector(model, true, pred):
    true = np.asanyarray(true, dtype=float)
    pred = np.asanyarray(pred, dtype=float)
    nonnan = ~np.isnan(true)
    if not nonnan.all():
        pred = pred[nonnan]
        true = true[nonnan]
    row = [str(getattr(model, "name", model))]
    if pred.size:
        row.extend(score(true, pred)
                   for score in (rmse, mae, mape, pocid, r2))
    else:
        row.extend(["err"] * 5)
    try:
        row.extend([model.results.aic, model.results.bic])
    except Exception:
        row.extend(["err"] * 2)
    return row


def model_evaluation(y, models, n_folds, forecast_steps, *, exog=None,
                     var_names=None, callback=None):
    """Evaluate ``models`` on a series with rolling-origin CV.

    ``y``: 1-D target array (or 2-D with target in column 0 for vector
    models). Mirrors ``functions.py:495-582``; the fold slicing
    ``train_end = -fold*steps`` and the double slice
    ``true_y[train_end:][:steps]`` are preserved verbatim.
    """
    y = np.asarray(y, dtype=float)
    true_y = y if y.ndim == 1 else y[:, 0]
    max_lag = max(m.max_order for m in models)
    if n_folds * forecast_steps + max_lag > len(true_y):
        raise ValueError(
            "Supplied time series is too short for this many folds "
            "/ step size. Retry with fewer iterations.")

    res = [list(HEADER)]
    for model in models:
        full_true, full_pred = [], []
        for fold in range(1, n_folds + 1):
            train_end = -fold * forecast_steps
            try:
                model.fit(y[:train_end],
                          exog=None if exog is None else exog[:train_end],
                          var_names=var_names)
                pred, _, _ = model.predict(forecast_steps)
            except Exception:
                continue
            finally:
                if callback:
                    callback()
            full_true.extend(true_y[train_end:][:forecast_steps])
            full_pred.extend(np.c_[pred][:, 0] if np.ndim(pred) > 1
                             else np.ravel(pred)[:forecast_steps])
        res.append(_score_vector(model, full_true, full_pred))

        try:
            model.fit(y, exog=exog, var_names=var_names)
            fitted = model.fittedvalues()
            if fitted.ndim > 1:
                fitted = fitted[..., 0]
        except Exception:
            row = ["err"] * 8
        else:
            row = _score_vector(model, true_y[-len(fitted):], fitted)
        row[0] = str(row[0]) + " (in-sample)"
        res.append(row)
    return res
