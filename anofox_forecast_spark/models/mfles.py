"""MFLES — Median-Fourier-Linear-Exponential-Smoothing boosting.

Semantics from ref src/models/mfles.rs (statsforecast-compatible, fresh
numpy implementation):

- transform: multiplicative (log) when seasonal & all-positive, else
  z-standardize (:728-755)
- boosting (:830-975): per round — (a) Fourier-seasonal OLS on residuals
  every round (lr 0.9), accepted only if it lowers MSE; (b) linear trend on
  odd rounds (lr 0.9; Siegel repeated medians when robust, auto-enabled
  when residual CoV > 0.7); (c) SES-ensemble (rolling-mean window 2, lr 1)
  on even rounds > 4 with a 1e-4 round penalty; stop after 6 consecutive
  non-improvements; max 50 rounds
- trend state accumulates median[n-1] + linear[-2:] + ses[-1] (:804-970)
- predict (:597-690): slope = trend[1]−trend[0], penalized by the R² of
  the first accepted linear fit (trend_penalty default on); seasonal =
  last-cycle tiling; inverse transform
- Fourier order: 5 / 10 / 15 for period <10 / <70 / else (:227-239);
  design matrix cos-then-sin per harmonic over t = 1..n (:269-292)
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import z_for_level
from anofox_forecast_spark.models.kernels import InsufficientData, KernelResult


def _set_fourier(period: int) -> int:
    if period < 10:
        return 5
    if period < 70:
        return 10
    return 15


def _fourier_design(n: int, period: int, order: int) -> np.ndarray:
    order = max(min(order, period // 2), 1)
    t = np.arange(1, n + 1, dtype=np.float64)
    cols = []
    for k in range(1, order + 1):
        freq = 2.0 * np.pi * k / period
        cols.append(np.cos(freq * t))
        cols.append(np.sin(freq * t))
    return np.column_stack(cols)


def _ols_project(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    return X @ coef, coef


def _fast_ols_line(y: np.ndarray) -> np.ndarray:
    n = y.size
    if n < 2:
        return y.copy()
    x = np.arange(n, dtype=np.float64)
    denom = n * (x * x).sum() - x.sum() ** 2
    if abs(denom) < 1e-10:
        return np.full(n, y.mean())
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / denom
    intercept = (y.sum() - slope * x.sum()) / n
    return intercept + slope * x


def _siegel_line(y: np.ndarray, max_samples: int = 100) -> np.ndarray:
    """Siegel repeated medians (sampled, ref :423-465)."""
    n = y.size
    if n < 2:
        return y.copy()
    step = max(n // max_samples, 1)
    idx = np.arange(0, n, step)
    slopes = []
    for i in idx:
        s = [(y[j] - y[i]) / (j - i) for j in idx if j != i]
        if s:
            slopes.append(np.median(s))
    slope = float(np.median(slopes)) if slopes else 0.0
    intercept = float(np.median(y[idx] - slope * idx))
    return intercept + slope * np.arange(n, dtype=np.float64)


def _rolling_mean_head_kept(y: np.ndarray, window: int) -> np.ndarray:
    out = y.copy()
    for i in range(window, y.size):
        out[i] = y[i - window + 1 : i + 1].mean()
    return out


def mfles(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 12,
    max_rounds: int = 50,
    seasonal_lr: float = 0.9,
    trend_lr: float = 0.9,
    rs_lr: float = 1.0,
    robust: bool | None = None,
    multiplicative: bool | None = None,
    trend_penalty: bool = True,
    fourier_order: int | None = None,
) -> KernelResult:
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    y = np.asarray(y, dtype=np.float64)
    season = m if m and m > 1 else 0

    use_mult = (
        multiplicative
        if multiplicative is not None
        else (season > 0 and (y > 0.0).all())
    )
    if use_mult:
        z = np.log(y)
        mean_v = std_v = None
    else:
        mean_v = y.mean()
        std_v = max(y.std(), 1e-10)
        z = (y - mean_v) / std_v

    def inverse(v):
        return np.exp(v) if use_mult else mean_v + v * std_v

    order = fourier_order if fourier_order is not None else _set_fourier(season or 12)
    k = max(min(order, (season or 12) // 2), 1)
    Xf = _fourier_design(n, season, order) if season > 0 else None

    fitted = np.zeros(n)
    seasonal_component = np.zeros(n)
    med = float(np.median(z))
    fitted += med
    trend_accum = np.array([med, med])
    mse = None
    equal = 0
    penalty_val = None
    robust_mode = bool(robust)

    def calc_mse(f):
        return float(((z - f) ** 2).mean())

    for rnd in range(max_rounds):
        resids = z - fitted
        if rnd == 0 and not robust_mode and robust is None:
            std_r = resids.std()
            mean_r = abs(resids.mean())
            cov = std_r / mean_r if mean_r > 1e-10 else 0.0
            if use_mult and cov > 0.7:
                robust_mode = True
        cur = calc_mse(fitted)
        if mse is None:
            mse = cur
        elif mse <= cur:
            if equal == 6:
                break
            equal += 1
        else:
            mse = cur
            equal = 0

        if Xf is not None:
            seas, coeffs = _ols_project(Xf, resids)
            seas *= seasonal_lr
            comp_mse = calc_mse(fitted + seas)
            if mse is None or mse > comp_mse:
                mse = comp_mse
                fitted += seas
                seasonal_component += seas

        resids = z - fitted
        if rnd % 2 == 1:
            line = _siegel_line(resids) if robust_mode else _fast_ols_line(resids)
            line = line * trend_lr
            comp_mse = calc_mse(fitted + line)
            if mse is None or mse > comp_mse:
                mse = comp_mse
                fitted += line
                trend_accum[0] += line[-2] if n >= 2 else line[-1]
                trend_accum[1] += line[-1]
                if rnd == 1 and penalty_val is None:
                    ss_res = float(((resids - line / trend_lr) ** 2).sum())
                    ss_tot = float(((resids - resids.mean()) ** 2).sum())
                    penalty_val = 0.0 if ss_tot < 1e-10 else 1.0 - ss_res / ss_tot
        elif rnd > 4 and rnd % 2 == 0:
            resids = z - fitted
            ses = _rolling_mean_head_kept(resids, 2) * rs_lr
            comp_mse = calc_mse(fitted + ses)
            if mse is None or mse > comp_mse + 1e-4 * mse:
                mse = comp_mse
                fitted += ses
                trend_accum += ses[-1]

    seasonality = (
        seasonal_component[n - season :]
        if season > 0 and n >= season
        else (seasonal_component if season > 0 else None)
    )

    fitted_orig = inverse(fitted)
    resid_orig = y - fitted_orig

    last_point = trend_accum[1]
    slope = trend_accum[1] - trend_accum[0]
    if trend_penalty and penalty_val is not None:
        slope *= max(penalty_val, 0.0)
    hs = np.arange(1, h + 1, dtype=np.float64)
    pred = slope * hs + last_point
    if seasonality is not None and seasonality.size:
        pred = pred + seasonality[(np.arange(h)) % seasonality.size]
    yhat = inverse(pred)

    # CI: sample variance of original-scale residuals, flat (ref :1065-1090)
    if resid_orig.size > 1:
        variance = float(((resid_orig - resid_orig.mean()) ** 2).sum() / (resid_orig.size - 1))
    else:
        variance = 0.0
    zq = z_for_level(level)
    # ref mfles.rs:1104-1146: sd·sqrt(h) widening (h 1-based), sample
    # variance of residuals — not a flat band
    se = np.sqrt(variance) * np.sqrt(np.arange(1, h + 1, dtype=np.float64))
    return KernelResult(
        yhat, yhat - zq * se, yhat + zq * se, fitted_orig, resid_orig,
        {"multiplicative": use_mult, "robust": robust_mode,
         "penalty": penalty_val, "fourier_order": order},
    )
