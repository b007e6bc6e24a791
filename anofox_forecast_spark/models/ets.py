"""ETS (Error-Trend-Seasonal) state-space kernel + AutoETS selection.

Semantics from ref src/models/exponential/ets.rs and auto_ets.rs (fresh
numpy implementation):

- spec = Error{A,M} × Trend{N,A,Ad} × Seasonal{N,A,M}
  (ref ets.rs:13-52; short names :119-136)
- one parameterized recursion covers all 9 trend×seasonal combos
  (ref :826-915 fit table == :380-508 likelihood table)
- initialization (ref :288-357): trend-nonseasonal → OLS on first
  maxn=min(max(10,2m),n) points (1-indexed x, statsforecast-style);
  seasonal → first-cycle mean level + cross-cycle trend; else y[0]
- optimizer (ref :509-731): NM max_iter=2000 tol=1e-10; AAN gets
  multi-start α∈{.1,.3,.5,.8,.99} optimizing (α,β,l0,b0) with wide state
  bounds; damped φ ∈ [0.8, 0.98]
- gaussian log-likelihood → AIC/AICc/BIC with k = smoothing params +
  damping + initial states (ref :755-764, :936-941)
- AutoETS: grid over candidate specs skipping unstable M/*A/A combos,
  min-AICc selection (ref auto_ets.rs:143-200)
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead
from anofox_forecast_spark.models.kernels import (
    InsufficientData,
    KernelResult,
    _damped_sum,
    _interval,
    mean_sq,
)

_LN_2PI = float(np.log(2.0 * np.pi))


def _ets_init(y: np.ndarray, m: int, trend: str, seasonal: str):
    """Heuristic initial (level, trend, seasonals) — ref ets.rs:288-357."""
    n = y.size
    has_trend = trend != "N"
    has_seasonal = seasonal != "N"
    if has_trend and not has_seasonal:
        maxn = min(n, max(10, 2 * m))
        xs = np.arange(1, maxn + 1, dtype=np.float64)
        yy = y[:maxn]
        x_mean = (maxn + 1) / 2.0
        y_mean = yy.mean()
        ss_xx = float(((xs - x_mean) ** 2).sum())
        b = float(((xs - x_mean) * (yy - y_mean)).sum() / ss_xx) if ss_xx > 0 else 0.0
        level, tr = y_mean - b * x_mean, b
    elif has_seasonal and n >= m:
        level = float(y[:m].mean())
        if has_trend and n >= 2 * m:
            tr = float(((y[m : 2 * m] - y[:m]) / m).sum() / m)
        else:
            tr = 0.0
    else:
        level = float(y[0])
        tr = float(y[1] - y[0]) if has_trend and n >= 2 else 0.0
    if has_seasonal and n >= m:
        if seasonal == "A":
            seas = y[:m] - level
        else:
            seas = np.where(abs(level) > 1e-10, y[:m] / level, 1.0).astype(np.float64)
    else:
        seas = np.empty(0)
    return level, tr, seas


def _ets_run(
    y: np.ndarray,
    m: int,
    error: str,
    trend: str,
    seasonal: str,
    alpha: float,
    beta: float,
    gamma: float,
    phi: float,
    level0: float,
    trend0: float,
    seas0: np.ndarray,
    collect: bool,
):
    """One pass of the unified ETS recursion (ref ets.rs:380-508 / :826-915).

    Returns (neg_log_likelihood, level, trend, seasonals, fitted, resid).
    """
    n = y.size
    has_seasonal = seasonal != "N"
    start = m if has_seasonal else 0
    level, tr = level0, trend0
    s = seas0.copy() if has_seasonal else None
    fitted = np.empty(n) if collect else None
    resid = np.zeros(n) if collect else None
    if collect and start:
        fitted[:start] = y[:start]
    damp = phi if trend == "Ad" else 1.0
    sum_sq = 0.0
    sum_log_y = 0.0
    count = 0
    for t in range(start, n):
        si = t % m if has_seasonal else 0
        sv = s[si] if has_seasonal else 1.0
        if trend == "N":
            base = level
        else:
            base = level + damp * tr
        if seasonal == "A":
            f = base + sv
        elif seasonal == "M":
            f = base * sv
        else:
            f = base
        e = y[t] - f
        if error == "M" and abs(f) > 1e-10:
            se_ = e / f
        else:
            se_ = e
        sum_sq += se_ * se_
        if error == "M":
            sum_log_y += np.log(abs(y[t])) if y[t] != 0.0 else 0.0
        count += 1
        if collect:
            fitted[t] = f
            resid[t] = e
        level_prev = level
        # deseasonalized observation feeding the level
        if seasonal == "A":
            obs = y[t] - sv
        elif seasonal == "M":
            obs = y[t] / sv if abs(sv) > 1e-10 else y[t]
        else:
            obs = y[t]
        if trend == "N":
            level = alpha * obs + (1.0 - alpha) * level
        else:
            level = alpha * obs + (1.0 - alpha) * (level_prev + damp * tr)
            tr = beta * (level - level_prev) + (1.0 - beta) * damp * tr
        if seasonal == "A":
            s[si] = gamma * (y[t] - level) + (1.0 - gamma) * sv
        elif seasonal == "M":
            if abs(level) > 1e-10:
                s[si] = gamma * (y[t] / level) + (1.0 - gamma) * sv
    if count == 0:
        return np.finfo(np.float64).max, level, tr, s, fitted, resid
    sigma2 = sum_sq / count
    if sigma2 <= 0:
        sigma2 = 1e-300
    ll = -0.5 * count * (1.0 + np.log(sigma2) + _LN_2PI)
    if error == "M":
        ll -= sum_log_y
    return -ll, level, tr, s, fitted, resid


def _optimize(y, m, error, trend, seasonal):
    """Parameter (+ initial-state for AAN) optimization — ref ets.rs:509-731."""
    has_trend = trend != "N"
    has_seasonal = seasonal != "N"
    damped = trend == "Ad"
    init_level, init_trend, seas0 = _ets_init(y, m, trend, seasonal)
    nm = dict(max_iter=2000, tolerance=1e-10)

    def nll(alpha, beta=0.0, gamma=0.0, phi=1.0, l0=None, b0=None):
        return _ets_run(
            y, m, error, trend, seasonal, alpha, beta, gamma, phi,
            init_level if l0 is None else l0,
            init_trend if b0 is None else b0,
            seas0, False,
        )[0]

    if has_trend and not damped and not has_seasonal:
        # AAN/MAN: multi-start over alpha, optimizing (α, β, l0, b0)
        y_min, y_max = float(y.min()), float(y.max())
        rng = y_max - y_min
        bounds = [
            (0.0001, 0.9999), (0.0001, 0.9999),
            (y_min - rng, y_max + rng), (-rng, rng),
        ]
        best, best_val = None, np.inf
        for a0 in (0.1, 0.3, 0.5, 0.8, 0.99):
            pt = nelder_mead(
                lambda p: nll(p[0], beta=p[1], l0=p[2], b0=p[3]),
                [a0, 0.01, init_level, init_trend], bounds, **nm,
            )
            v = nll(pt[0], beta=pt[1], l0=pt[2], b0=pt[3])
            if v < best_val:
                best, best_val = pt, v
        a = float(np.clip(best[0], 0.0001, 0.9999))
        b = float(np.clip(best[1], 0.0001, 0.9999))
        return a, b, 0.0, 1.0, float(best[2]), float(best[3]), seas0
    if not has_trend and not has_seasonal:
        pt = nelder_mead(lambda p: nll(p[0]), [0.3], [(0.0001, 0.9999)], **nm)
        return (
            float(np.clip(pt[0], 0.0001, 0.9999)), 0.0, 0.0, 1.0,
            init_level, init_trend, seas0,
        )
    if not has_trend and has_seasonal:
        pt = nelder_mead(
            lambda p: nll(p[0], gamma=p[1]), [0.3, 0.1],
            [(0.0001, 0.9999)] * 2, **nm,
        )
        return (
            float(np.clip(pt[0], 0.0001, 0.9999)), 0.0,
            float(np.clip(pt[1], 0.0001, 0.9999)), 1.0,
            init_level, init_trend, seas0,
        )
    if has_trend and has_seasonal and not damped:
        pt = nelder_mead(
            lambda p: nll(p[0], beta=p[1], gamma=p[2]), [0.3, 0.1, 0.1],
            [(0.0001, 0.9999)] * 3, **nm,
        )
        return (
            float(np.clip(pt[0], 0.0001, 0.9999)),
            float(np.clip(pt[1], 0.0001, 0.9999)),
            float(np.clip(pt[2], 0.0001, 0.9999)), 1.0,
            init_level, init_trend, seas0,
        )
    if has_trend and not has_seasonal and damped:
        pt = nelder_mead(
            lambda p: nll(p[0], beta=p[1], phi=p[2]), [0.3, 0.1, 0.98],
            [(0.0001, 0.9999), (0.0001, 0.9999), (0.8, 0.98)], **nm,
        )
        return (
            float(np.clip(pt[0], 0.0001, 0.9999)),
            float(np.clip(pt[1], 0.0001, 0.9999)), 0.0,
            float(np.clip(pt[2], 0.8, 0.98)),
            init_level, init_trend, seas0,
        )
    # damped + seasonal
    pt = nelder_mead(
        lambda p: nll(p[0], beta=p[1], gamma=p[2], phi=p[3]),
        [0.3, 0.1, 0.1, 0.98],
        [(0.0001, 0.9999), (0.0001, 0.9999), (0.0001, 0.9999), (0.8, 0.98)],
        **nm,
    )
    return (
        float(np.clip(pt[0], 0.0001, 0.9999)),
        float(np.clip(pt[1], 0.0001, 0.9999)),
        float(np.clip(pt[2], 0.0001, 0.9999)),
        float(np.clip(pt[3], 0.8, 0.98)),
        init_level, init_trend, seas0,
    )


def _num_params(m: int, trend: str, seasonal: str) -> int:
    k = 1 + 1  # alpha + initial level
    if trend != "N":
        k += 2  # beta + initial trend
    if trend == "Ad":
        k += 1  # phi
    if seasonal != "N":
        k += 1 + m  # gamma + initial seasonals
    return k


def ets(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    spec: str = "ANN",
) -> KernelResult:
    """Fit one ETS spec and forecast.

    ``spec`` like "ANN", "AAN", "AAdN", "AAA", "MAM" (trend "Ad" spelled
    inline). Needs n ≥ 2m (seasonal) / 2. Params NM-optimized.
    """
    error, rest = spec[0], spec[1:]
    if rest.startswith("Ad"):
        trend, seasonal = "Ad", rest[2:]
    else:
        trend, seasonal = rest[0], rest[1:]
    if error not in "AM" or trend not in ("N", "A", "Ad") or seasonal not in "NAM":
        raise ValueError(f"bad ETS spec {spec!r}")
    n = y.size
    has_seasonal = seasonal != "N"
    min_len = 2 * m if has_seasonal else 2
    if n < min_len:
        raise InsufficientData(f"need {min_len}, got {n}")

    a, b, g, ph, l0, b0, seas0 = _optimize(y, m, error, trend, seasonal)
    _, lvl, tr, seas, fitted, resid = _ets_run(
        y, m, error, trend, seasonal, a, b, g, ph, l0, b0, seas0, True
    )
    start = m if has_seasonal else 0
    variance = mean_sq(resid[start:])
    k = _num_params(m, trend, seasonal)
    ll = -0.5 * n * (1.0 + np.log(max(variance, 1e-300)) + _LN_2PI)
    aic = -2.0 * ll + 2.0 * k
    aicc = -2.0 * ll + 2.0 * k * n / max(n - k - 1.0, 1.0)
    bic = -2.0 * ll + k * np.log(n)

    hs = np.arange(1, h + 1)
    if trend == "N":
        trend_comp = np.zeros(h)
    elif trend == "Ad":
        trend_comp = np.array([_damped_sum(ph, int(k_)) for k_ in hs]) * tr
    else:
        trend_comp = hs * tr
    base = lvl + trend_comp
    if has_seasonal:
        sidx = (n + hs - 1) % m
        yhat = base + seas[sidx] if seasonal == "A" else base * seas[sidx]
        kfac = (hs - 1) // m + 1
    else:
        yhat = base
        kfac = hs
    lo, hi = _interval(yhat, np.sqrt(variance * kfac), level)
    return KernelResult(
        yhat, lo, hi, fitted, resid,
        {"spec": spec, "alpha": a, "beta": b, "gamma": g, "phi": ph,
         "aic": aic, "aicc": aicc, "bic": bic, "loglik": ll},
    )


def _candidates(has_seasonal: bool, allow_mult_error=True,
                allow_mult_seasonal=True, allow_damped=True,
                additive_only=False) -> list[str]:
    """Candidate grid — ref auto_ets.rs:143-191 (skips M,{A,Ad},A)."""
    errors = ["A"] if (additive_only or not allow_mult_error) else ["A", "M"]
    trends = ["N", "A", "Ad"] if allow_damped else ["N", "A"]
    if not has_seasonal:
        seasonals = ["N"]
    elif additive_only or not allow_mult_seasonal:
        seasonals = ["N", "A"]
    else:
        seasonals = ["N", "A", "M"]
    out = []
    for e in errors:
        for t in trends:
            for s in seasonals:
                if e == "M" and t in ("A", "Ad") and s == "A":
                    continue
                out.append(e + t + s)
    return out


def auto_ets(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    criterion: str = "aicc",
    additive_only: bool = False,
) -> KernelResult:
    """Grid-fit candidate specs, pick min criterion (default AICc).

    ref src/models/exponential/auto_ets.rs:12-51, :194-200. Failed candidate
    fits are skipped (reference propagates per-spec Result the same way).
    """
    has_seasonal = m > 1 and y.size >= 2 * m
    best: KernelResult | None = None
    best_score = np.inf
    scores = {}
    for spec in _candidates(has_seasonal, additive_only=additive_only):
        try:
            res = ets(y, h, level, m, spec=spec)
        except Exception:
            continue
        score = res.params[criterion]
        scores[spec] = score
        if np.isfinite(score) and score < best_score:
            best, best_score = res, score
    if best is None:
        raise InsufficientData("no ETS candidate fit succeeded")
    best.params["scores"] = scores
    best.params["selected"] = best.params["spec"]
    return best
