"""Seasonal-trend forecasting with tolerance intervals ("prophet-lite") —
the modeling half of the reference's fb_Prophet detector
(/root/reference/src/algorithms/fb_prophet.py:130-199): fit a forecast on
each series' history, derive an uncertainty band, and flag observations
outside their nearest-bound interval.

Prophet's additive model for the reference's use case (uncertainty band
lookup) reduces to trend + seasonality + residual spread; this fits an
OLS model over a [1, t, hinge changepoints, sin/cos harmonics] basis per
series with plain numpy — deterministic, dependency-free, vectorized
(the piecewise-linear trend is Prophet's own construction, Taylor &
Letham 2018 eq. 4, with ridge in place of the Laplace prior on the
slope deltas; n_changepoints=0 stays pure OLS) — and emits
(ts, yhat, yhat_lower, yhat_upper) with a z * residual-std band. The
verdict path is the shared as-of band check (operators/asof.py), exactly
where the reference looks up the nearest forecast bound.

Scale: one bucketed per-series scan to FIT + PREDICT (sequential
machinery), then the band check's own strategy; no driver-side loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from anomaly_detection_spark.operators.sequential import (
    _grouped,
    _out_schema,
    _per_series,
)


def _design(t: np.ndarray, period: float, harmonics: int,
            changepoints: np.ndarray | None = None) -> np.ndarray:
    cols = [np.ones_like(t), t]
    if changepoints is not None:
        # Prophet's piecewise-linear trend: one hinge max(0, t - s) per
        # potential changepoint (Taylor & Letham 2018, eq. 4 — the
        # a(t)·δ term with the slope deltas as hinge coefficients)
        for s in changepoints:
            cols.append(np.maximum(0.0, t - s))
    for h in range(1, harmonics + 1):
        w = 2.0 * np.pi * h * t / period
        cols.append(np.sin(w))
        cols.append(np.cos(w))
    return np.stack(cols, axis=1)


def seasonal_forecast(
    df: DataFrame, keys, order: str, value: str, *,
    period: float, harmonics: int = 2, z: float = 3.0,
    n_changepoints: int = 0, changepoint_range: float = 0.8,
    changepoint_ridge: float = 1.0, extra_cols=(),
) -> DataFrame:
    """Per-series in-sample forecast + tolerance band: columns yhat,
    yhat_lower, yhat_upper (band = z * residual std, Prophet-style
    constant-width interval).

    ``n_changepoints > 0`` adds Prophet's piecewise-linear trend:
    potential changepoints at uniform quantiles of the observed
    timestamps' first ``changepoint_range`` (Prophet's default layout),
    hinge slope-deltas shrunk by an L2 penalty ``changepoint_ridge``
    (the ridge analog of Prophet's Laplace changepoint prior; only the
    hinge columns are penalized, so trend/seasonality stay OLS-exact).
    The default 0 keeps the original pure-OLS numerics bit-for-bit."""
    keys_l = keys if isinstance(keys, (list, tuple)) else [keys]
    cols = list(keys_l) + [order] + list(extra_cols)

    def one(g: pd.DataFrame) -> pd.DataFrame:
        t = g[order].to_numpy(dtype=np.float64)
        y = g[value].to_numpy(dtype=np.float64)
        t0 = t - t[0]
        cps = None
        if n_changepoints > 0 and len(t0) > 2:
            qs = np.linspace(0.0, changepoint_range,
                             n_changepoints + 2)[1:-1]
            cps = np.unique(np.quantile(t0, qs))
        A = _design(t0, period, harmonics, cps)
        k = A.shape[1]
        if len(y) <= k + 2:
            yhat = np.full_like(y, np.nan)
            band = np.full_like(y, np.nan)
        else:
            if cps is not None:
                # ridge on the hinge block only, solved as an AUGMENTED
                # least squares (sqrt-penalty rows appended) rather than
                # the normal equations: lstsq stays rank-deficiency-safe
                # when the unpenalized columns are collinear (constant
                # order column, aliased harmonics), where solve() on
                # A'A + P would raise or explode
                P = np.zeros(k)
                P[2:2 + len(cps)] = changepoint_ridge
                A_aug = np.vstack([A, np.diag(np.sqrt(P))])
                y_aug = np.concatenate([y, np.zeros(k)])
                coef, *_ = np.linalg.lstsq(A_aug, y_aug, rcond=None)
            else:
                coef, *_ = np.linalg.lstsq(A, y, rcond=None)
            yhat = A @ coef
            resid_std = float(np.std(y - yhat, ddof=min(k, len(y) - 1)))
            band = np.full_like(y, z * resid_std)
        o = g[cols].copy()
        o["yhat"] = yhat
        o["yhat_lower"] = yhat - band
        o["yhat_upper"] = yhat + band
        return o

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _per_series(pdf, keys_l, one)

    select_cols = list(dict.fromkeys([*cols, value]))  # value may be in extras
    return _grouped(
        df.select(*select_cols), keys_l, order, fn,
        _out_schema(df, cols,
                    "yhat double, yhat_lower double, yhat_upper double"))


def forecast_band_check(
    df: DataFrame, keys, order: str, value: str, *,
    period: float, harmonics: int = 2, z: float = 3.0,
    n_changepoints: int = 0, changepoint_range: float = 0.8,
    changepoint_ridge: float = 1.0, extra_cols=(), out: str = "code",
) -> DataFrame:
    """fb_Prophet-style verdict: observation outside its forecast interval
    -> Error; rows with no fit (short series) Undefined. The band here is
    indexed at the observation's own timestamp (in-sample), which is the
    degenerate exact case of the reference's nearest-timestamp bound
    lookup; for a PRE-FIT forecast table use asof.asof_band_check."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark.codes import UNDEFINED_CODE

    fc = seasonal_forecast(df, keys, order, value, period=period,
                           harmonics=harmonics, z=z,
                           n_changepoints=n_changepoints,
                           changepoint_range=changepoint_range,
                           changepoint_ridge=changepoint_ridge,
                           extra_cols=tuple(extra_cols) + (value,))
    code = (
        F.when(F.col("yhat").isNull() | F.isnan("yhat"),
               F.lit(UNDEFINED_CODE))
        .when((F.col(value) < F.col("yhat_lower"))
              | (F.col(value) > F.col("yhat_upper")), F.lit(-1))
        .otherwise(F.lit(1))
    )
    return fc.withColumn(out, code)
