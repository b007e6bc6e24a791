"""Residual whiteness + stationarity tests.

Semantics from ref src/validation/residual_tests.rs and stationarity.rs:
- ljung_box (:37): Q = n(n+2)·Σ_{k=1..h} r_k²/(n−k), ~χ²(h)
- box_pierce (:180): Q = n·Σ r_k², ~χ²(h)
- durbin_watson (:131): Σ(e_t−e_{t−1})²/Σe_t²
- kpss_test (:285): level-stationarity KPSS — η = Σ S_t²/(n²·σ̂²_long),
  long-run variance via Bartlett window with the Newey-West lag
  floor(4(n/100)^0.25); critical values 10/5/2.5/1% = .347/.463/.574/.739
- adf is in features.np_features.augmented_dickey_fuller.

χ² p-values use the Wilson-Hilferty normal approximation (scipy-free),
documented as an approximation; reject/fail-to-reject verdicts are exact
at usual thresholds.
"""

from __future__ import annotations

import math

import numpy as np

from anofox_forecast_spark.evaluation.metrics import winkler_score
from anofox_forecast_spark.features.np_features import autocorrelation


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of χ²(k) via Wilson-Hilferty."""
    if x <= 0:
        return 1.0
    z = ((x / k) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * k))) / math.sqrt(2.0 / (9.0 * k))
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def ljung_box(resid: np.ndarray, lags: int = 10) -> dict:
    n = resid.size
    lags = min(lags, n - 1)
    q = 0.0
    for k in range(1, lags + 1):
        r = autocorrelation(resid, k)
        q += r * r / (n - k)
    q *= n * (n + 2.0)
    p = _chi2_sf(q, lags)
    return {"statistic": float(q), "p_value": float(p), "lags": lags,
            "white_noise": p > 0.05}


def box_pierce(resid: np.ndarray, lags: int = 10) -> dict:
    n = resid.size
    lags = min(lags, n - 1)
    q = n * sum(autocorrelation(resid, k) ** 2 for k in range(1, lags + 1))
    p = _chi2_sf(q, lags)
    return {"statistic": float(q), "p_value": float(p), "lags": lags,
            "white_noise": p > 0.05}


def durbin_watson(resid: np.ndarray) -> float:
    denom = float((resid**2).sum())
    if denom == 0.0:
        return 2.0
    return float((np.diff(resid) ** 2).sum() / denom)


_KPSS_CRIT = {0.10: 0.347, 0.05: 0.463, 0.025: 0.574, 0.01: 0.739}


def kpss_test(y: np.ndarray, lags: int | None = None) -> dict:
    n = y.size
    if lags is None:
        lags = int(4 * (n / 100.0) ** 0.25)
    e = y - y.mean()
    s = np.cumsum(e)
    # long-run variance, Bartlett kernel
    gamma0 = float((e * e).sum()) / n
    lrv = gamma0
    for k in range(1, lags + 1):
        w = 1.0 - k / (lags + 1.0)
        lrv += 2.0 * w * float((e[k:] * e[:-k]).sum()) / n
    if lrv <= 0:
        lrv = gamma0 if gamma0 > 0 else 1e-300
    eta = float((s * s).sum()) / (n * n * lrv)
    return {
        "statistic": eta,
        "lags": lags,
        "critical_values": dict(_KPSS_CRIT),
        "stationary_5pct": eta < _KPSS_CRIT[0.05],
    }


def interval_calibration(
    y: np.ndarray,
    kernel,
    horizon: int = 6,
    level: float = 0.95,
    initial_train: int | None = None,
    step: int = 1,
    season_length: int = 1,
    **params,
) -> dict:
    """Rolling-origin interval calibration (ref tests/interval_calibration.rs
    :21-50): empirical coverage rate vs the nominal level + mean Winkler
    score W = (hi−lo) + (2/α)·max(lo−y, 0) + (2/α)·max(y−hi, 0)."""
    n = y.size
    start = initial_train if initial_train is not None else max(n // 2, 8)
    alpha = 1.0 - level
    covered = total = 0
    winkler_sum = 0.0
    origin = start
    while origin + horizon <= n:
        train = y[:origin]
        actual = y[origin : origin + horizon]
        try:
            r = kernel(train, horizon, level, season_length, **params)
        except Exception:
            origin += step
            continue
        inside = (actual >= r.lo) & (actual <= r.hi)
        covered += int(inside.sum())
        total += horizon
        # one source of truth for the formula (metrics.winkler_score);
        # it returns the MEAN over the fold, so scale back to a sum
        winkler_sum += winkler_score(actual, r.lo, r.hi, alpha) * horizon
        origin += step
    if total == 0:
        return {"coverage": np.nan, "nominal": level, "winkler": np.nan, "n": 0}
    return {
        "coverage": covered / total,
        "nominal": level,
        "winkler": winkler_sum / total,
        "n": total,
    }
