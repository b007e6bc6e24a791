"""Intermittent-demand kernels: Croston (Classic/SBA), TSB, ADIDA, IMAPA,
plus SeasonalES (per-slot SES).

Semantics from ref src/models/intermittent/ and exponential/seasonal_es.rs
(statsforecast-compatible; fresh numpy implementations):

- Croston (croston.rs): demands = y[y>0]; intervals = zeros-since-last+1;
  SES(α=0.1 default) each; ŷ = demand/interval, SBA ×(1−α/2); optimized
  variant: NM over combined one-step MSE, α∈[0.01,0.99], tol 1e-4.
- TSB (tsb.rs): SES on non-zero demands + SES on 0/1 occurrence, both via
  statsforecast `_ses_forecast` (fitted[i]=α·x[i−1]+(1−α)·fitted[i−1]);
  ŷ = demand·probability; α_d = α_p = 0.1 default.
- ADIDA (adida.rs): bucket = round(mean inter-demand interval) (first
  interval = first-nonzero-index+1); aggregate dropping the remainder at
  the BEGINNING; α by 101-point grid over [0.1,0.3]; SES; ÷ bucket.
- IMAPA (imapa.rs): ADIDA at every level 1..max, forecasts averaged.
- SeasonalES (seasonal_es.rs): SES per seasonal slot, slot series starts at
  init_idx = slot + (n mod m); optimized variant multi-start NM (0.1/0.3/
  0.5/0.7, 200 iters, tol 1e-6) over total per-slot SSE / n.
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead, z_for_level
from anofox_forecast_spark.models.kernels import (
    InsufficientData,
    KernelResult,
    _interval,
    mean_sq,
)


def _ses_final_level(x: np.ndarray, alpha: float, default: float = 1.0) -> float:
    if x.size == 0:
        return default
    lvl = x[0]
    for v in x[1:]:
        lvl = alpha * v + (1.0 - alpha) * lvl
    return float(lvl)


def _demands_intervals(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """statsforecast _demand/_intervals (ref croston.rs:110-132)."""
    demands = y[y > 0.0]
    nz = np.flatnonzero(y != 0.0)
    if nz.size == 0:
        return demands, np.empty(0)
    # "zeros since last nonzero + 1" == position difference; the first
    # interval counts zeros from the series start (= index + 1)
    intervals = np.empty(nz.size, dtype=np.float64)
    intervals[0] = nz[0] + 1
    intervals[1:] = np.diff(nz)
    return demands, intervals


def croston(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    alpha: float = 0.1,
    variant: str = "classic",
    optimize: bool = False,
) -> KernelResult:
    """Croston Classic / SBA / SBA-optimized (ref croston.rs)."""
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    demands, intervals = _demands_intervals(y)
    if demands.size < 2 or intervals.size == 0:
        raise InsufficientData("need >= 2 demand occurrences")

    if optimize:
        def mse(p):
            a = p[0]
            if a <= 0.01 or a >= 0.99:
                return np.inf
            dl, sse = demands[0], 0.0
            for d in demands[1:]:
                e = d - dl
                sse += e * e
                dl = a * d + (1 - a) * dl
            il = intervals[0]
            for iv in intervals[1:]:
                e = iv - il
                sse += e * e
                il = a * iv + (1 - a) * il
            return sse / (demands.size + intervals.size - 2)

        pt = nelder_mead(mse, [0.1], [(0.01, 0.99)], tolerance=1e-4)
        alpha = float(np.clip(pt[0], 0.01, 0.99))
    sba = variant in ("sba", "sba_optimized")

    def correct(d, iv):
        base = d / max(iv, 0.001)
        return base * (1.0 - alpha / 2.0) if sba else base

    d_level = _ses_final_level(demands, alpha)
    i_level = _ses_final_level(intervals, alpha)
    fc = correct(d_level, i_level)

    # fitted: forecast BEFORE updating at each demand point (ref :213-236)
    fitted = np.zeros(n)
    dl, il = demands[0], intervals[0]
    demand_idx = 0
    periods_since = 0
    for i in range(n):
        fitted[i] = correct(dl, il)
        if y[i] > 0.0:
            if demand_idx > 0:
                dl = alpha * y[i] + (1 - alpha) * dl
                il = alpha * periods_since + (1 - alpha) * il
            demand_idx += 1
            periods_since = 0
        periods_since += 1
    resid = y - fitted

    # CI: sample variance of residuals, flat (ref :335-346)
    if resid.size > 1:
        variance = float(((resid - resid.mean()) ** 2).sum() / (resid.size - 1))
    else:
        variance = 1.0
    yhat = np.full(h, fc)
    lo, hi = _interval(yhat, np.full(h, np.sqrt(variance)), level)
    return KernelResult(yhat, lo, hi, fitted, resid, {"alpha": alpha, "variant": variant})


def croston_sba(y, h, level=0.95, m=1, alpha=0.1):
    return croston(y, h, level, m, alpha=alpha, variant="sba")


def croston_sba_optimized(y, h, level=0.95, m=1):
    return croston(y, h, level, m, variant="sba_optimized", optimize=True)


def _sf_ses_forecast(x: np.ndarray, alpha: float) -> tuple[float, np.ndarray]:
    """statsforecast _ses_forecast (ref tsb.rs:82-100): fitted[i] =
    α·x[i−1] + (1−α)·fitted[i−1]; fitted[0]=NaN; returns one-step forecast."""
    if x.size == 0:
        return 0.0, np.empty(0)
    fitted = np.empty(x.size)
    fitted[0] = x[0]
    c = 1.0 - alpha
    for i in range(1, x.size):
        fitted[i] = alpha * x[i - 1] + c * fitted[i - 1]
    fc = alpha * x[-1] + c * fitted[-1]
    fitted[0] = np.nan
    return float(fc), fitted


def tsb(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    alpha_d: float = 0.1,
    alpha_p: float = 0.1,
) -> KernelResult:
    """Teunter-Syntetos-Babai (ref tsb.rs)."""
    n = y.size
    if n < 2:
        raise InsufficientData(f"need 2, got {n}")
    if np.all(y == 0.0):
        z = np.zeros(n)
        return KernelResult(np.zeros(h), np.zeros(h), np.zeros(h), z, z,
                            {"alpha_d": alpha_d, "alpha_p": alpha_p})
    demands = y[y > 0.0]
    probs = (y != 0.0).astype(np.float64)
    d_fc, d_fit = _sf_ses_forecast(demands, alpha_d)
    p_fc, p_fit = _sf_ses_forecast(probs, alpha_p)

    # expand demand fitted back to the full series (ref tsb.rs:148-172)
    d_exp = np.full(n, np.nan)
    di = 0
    for i in range(n):
        if y[i] > 0.0:
            d_exp[i] = d_fit[di] if di < d_fit.size else d_fc
            di += 1
        else:
            if di > 0:
                d_exp[i] = d_fit[di - 1] if di <= d_fit.size else d_fc
    fitted = d_exp * p_fit
    resid = np.where(np.isnan(fitted), np.nan, y - fitted)

    fc = d_fc * p_fc
    yhat = np.full(h, fc)
    valid = resid[~np.isnan(resid)]
    sigma = np.sqrt(mean_sq(valid))
    lo, hi = _interval(yhat, np.full(h, sigma), level)
    return KernelResult(yhat, lo, hi, fitted, resid,
                        {"alpha_d": alpha_d, "alpha_p": alpha_p,
                         "demand": d_fc, "probability": p_fc})


def _adida_intervals(y: np.ndarray) -> np.ndarray:
    """ADIDA/IMAPA intervals: first = first-nonzero-index+1 (ref adida.rs:77-97)."""
    nz = np.flatnonzero(y != 0.0)
    if nz.size == 0:
        return np.empty(0)
    out = np.empty(nz.size, dtype=np.float64)
    out[0] = nz[0] + 1
    out[1:] = np.diff(nz)
    return out


def _aggregate_drop_head(y: np.ndarray, level: int) -> np.ndarray:
    if level <= 1:
        return y.copy()
    rem = y.size % level
    cut = y[rem:]
    return cut.reshape(-1, level).sum(axis=1)


def _grid_alpha(agg: np.ndarray) -> float:
    """101-point grid over [0.1, 0.3] minimizing SES SSE (ref adida.rs:150-171)."""
    if agg.size < 2:
        return 0.1
    best_a, best_sse = 0.1, np.inf
    for i in range(101):
        a = 0.1 + 0.2 * i / 100.0
        lvl, sse = agg[0], 0.0
        for v in agg[1:]:
            e = v - lvl
            sse += e * e
            lvl = a * v + (1 - a) * lvl
        if sse < best_sse:
            best_sse, best_a = sse, a
    return best_a


def adida(y: np.ndarray, h: int, level: float = 0.95, m: int = 1) -> KernelResult:
    """Aggregate-Disaggregate Intermittent Demand Approach (ref adida.rs)."""
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    if np.all(y == 0.0):
        z = np.zeros(n)
        return KernelResult(np.zeros(h), np.zeros(h), np.zeros(h), z, z, {"level": 1})
    intervals = _adida_intervals(y)
    agg_level = max(int(round(float(intervals.mean()))), 1)
    agg = _aggregate_drop_head(y, agg_level)
    if agg.size == 0:
        raise InsufficientData("aggregated series empty")
    alpha = _grid_alpha(agg)
    fc = _ses_final_level(agg, alpha, default=0.0) / agg_level
    fitted = np.full(n, fc)
    resid = y - fitted
    yhat = np.full(h, fc)
    sigma = np.sqrt(mean_sq(resid))
    lo, hi = _interval(yhat, np.full(h, sigma), level)
    return KernelResult(yhat, lo, hi, fitted, resid,
                        {"alpha": alpha, "level": agg_level})


def imapa(y: np.ndarray, h: int, level: float = 0.95, m: int = 1) -> KernelResult:
    """IMAPA: average ADIDA forecasts over levels 1..mean-interval (ref imapa.rs)."""
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    if np.all(y == 0.0):
        z = np.zeros(n)
        return KernelResult(np.zeros(h), np.zeros(h), np.zeros(h), z, z, {"levels": [1]})
    intervals = _adida_intervals(y)
    max_level = max(int(round(float(intervals.mean()))), 1)
    fcs = []
    for lv in range(1, max_level + 1):
        agg = _aggregate_drop_head(y, lv)
        if agg.size == 0:
            continue
        alpha = _grid_alpha(agg)
        fcs.append(_ses_final_level(agg, alpha, default=0.0) / lv)
    if not fcs:
        raise InsufficientData("no valid aggregation level")
    fc = float(np.mean(fcs))
    fitted = np.full(n, fc)
    resid = y - fitted
    yhat = np.full(h, fc)
    sigma = np.sqrt(mean_sq(resid))
    lo, hi = _interval(yhat, np.full(h, sigma), level)
    return KernelResult(yhat, lo, hi, fitted, resid, {"levels": list(range(1, max_level + 1))})


def seasonal_es(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 12,
    alpha: float = 0.1,
    optimize: bool = False,
) -> KernelResult:
    """SES applied independently per seasonal slot (ref seasonal_es.rs).

    Slot series for slot s: y[s + (n mod m)], y[s + (n mod m) + m], …;
    forecast cycles the per-slot final levels starting at slot 0.
    """
    n = y.size
    if n < m:
        raise InsufficientData(f"need {m}, got {n}")

    def slot_series(s: int) -> np.ndarray:
        return y[s + (n % m)::m]

    if optimize:
        def sse_total(p):
            a = p[0]
            if a <= 0.001 or a >= 0.999:
                return np.finfo(np.float64).max
            total = 0.0
            for s in range(m):
                sv = slot_series(s)
                if sv.size == 0:
                    continue
                lvl = sv[0]
                for v in sv:
                    e = v - lvl
                    total += e * e
                    lvl = a * v + (1 - a) * lvl
            return total / n

        best_a, best_v = 0.1, np.inf
        for a0 in (0.1, 0.3, 0.5, 0.7):
            pt = nelder_mead(sse_total, [a0], [(0.001, 0.999)],
                             max_iter=200, tolerance=1e-6)
            v = sse_total(pt)
            if v < best_v:
                best_v, best_a = v, float(pt[0])
        alpha = float(np.clip(best_a, 0.001, 0.999))

    seasonal_values = np.full(m, np.nan)
    fitted = np.full(n, np.nan)
    for s in range(m):
        idxs = np.arange(s + (n % m), n, m)
        if idxs.size == 0:
            continue
        sv = y[idxs]
        lvl = sv[0]
        for j, v in enumerate(sv):
            fitted[idxs[j]] = lvl
            lvl = alpha * v + (1 - alpha) * lvl
        seasonal_values[s] = lvl
    resid = np.where(np.isnan(fitted), np.nan, y - fitted)
    valid = resid[np.isfinite(resid)]
    variance = mean_sq(valid)

    hs = np.arange(h)
    yhat = seasonal_values[hs % m]
    z = z_for_level(level)
    # ref seasonal_es.rs:342-363: se = sqrt(variance * sqrt(1 + 0.1h))
    # (the fan factor multiplies the VARIANCE before the final sqrt)
    se = np.sqrt(variance * np.sqrt(1.0 + 0.1 * hs))
    return KernelResult(yhat, yhat - z * se, yhat + z * se, fitted, resid,
                        {"alpha": alpha})
