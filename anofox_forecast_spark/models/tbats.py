"""TBATS — trigonometric-seasonal state space with Box-Cox and damped trend.

Semantics from ref src/models/tbats/model.rs + auto.rs (statsforecast-style
formulation; fresh numpy implementation):

- state x = [level, trend?, s1_cos, s1_sin, …]; observation
  y = level + φ·trend + Σ cos-components (w = [1, φ, 1, 0, 1, 0, …], :398)
- transition: level ← level + φ·trend + α·e; trend ← φ·trend + β·e;
  per-harmonic rotation [[cos,sin],[−sin,cos]] + (γ₁, γ₂)·e (:518-594)
- Box-Cox: λ estimated by minimizing the CoV of the transformed series
  (NM, bounds [0,1], 50 iters, tol 1e-4, :352-383); applied when all
  values are positive
- harmonics per period: centered-MA(2m) detrend → Fourier OLS for
  h = 1..min(m/2, 6), AIC selection (:143-220)
- parameter optimization: NM over (α, β?, φ?, γ₁…, γ₂…) with the
  reference's starts/bounds (α 0.09 [.001,.999]; β 0.05 [−.5,.5];
  φ 0.98 [.8,.999]; γ 0 [−.1,.1]) minimizing filter SSE (:597-700)
- AIC = −2·(−n/2·(1+ln(2π·σ²))) + 2k, k = 2 + λ? + trend/damped +
  2·periods + 2·Σk harmonics (:749-771, :860-864)
- AutoTBATS (auto.rs): candidates {trend, no-trend, damped} × {Box-Cox
  on/off when possible}, min-AIC.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead, z_for_level
from anofox_forecast_spark.models.kernels import InsufficientData, KernelResult

_LN_2PI = float(np.log(2.0 * np.pi))


def _bc(v: np.ndarray, lam: float) -> np.ndarray:
    if abs(lam) < 1e-10:
        return np.log(v)
    return (v**lam - 1.0) / lam


def _inv_bc(v: np.ndarray, lam: float) -> np.ndarray:
    if abs(lam) < 1e-10:
        return np.exp(v)
    inner = lam * v + 1.0
    return np.where(inner > 0, np.abs(inner) ** (1.0 / lam), 0.0)


def _estimate_lambda(y: np.ndarray) -> float:
    if (y <= 0).any():
        return 1.0

    def obj(p):
        t = _bc(y, p[0])
        mean = t.mean()
        if abs(mean) < 1e-10:
            return np.finfo(np.float64).max
        return t.var() / (mean * mean)

    pt = nelder_mead(obj, [0.5], [(0.0, 1.0)], max_iter=50, tolerance=1e-4)
    return float(np.clip(pt[0], 0.0, 1.0))


def _find_harmonics(z: np.ndarray, period: int) -> tuple[int, np.ndarray]:
    n = z.size
    window = 2 * period
    trend = np.empty(n)
    half = window // 2
    for i in range(n):
        s = max(i - half, 0)
        e = min(i + half + 1, n)
        trend[i] = z[s:e].mean()
    det = z - trend
    max_k = min(max(period // 2, 1), 6)
    t = np.arange(n, dtype=np.float64)
    best_k, best_aic, best_resid = 1, np.inf, det
    for hcount in range(1, max_k + 1):
        cols = []
        for j in range(1, hcount + 1):
            freq = 2.0 * np.pi * j / period
            cols.append(np.cos(freq * t))
            cols.append(np.sin(freq * t))
        X = np.column_stack(cols)
        coef, *_ = np.linalg.lstsq(X, det, rcond=None)
        resid = det - X @ coef
        sse = float((resid**2).sum())
        aic = n * np.log(max(sse / n, 1e-300)) + 2.0 * (2 * hcount + 1)
        if aic < best_aic:
            best_k, best_aic, best_resid = hcount, aic, resid
    return best_k, best_resid + trend - trend  # residuals of the seasonal fit


class _TbatsSpec:
    def __init__(self, periods, ks, use_trend, damped):
        self.periods = list(periods)
        self.ks = list(ks)
        self.use_trend = use_trend
        self.damped = damped
        self.base = 2 if use_trend else 1
        self.dim = self.base + sum(2 * k for k in ks)


def _filter(z, spec: _TbatsSpec, alpha, beta, phi, g1s, g2s, collect=False):
    n = z.size
    state = np.zeros(spec.dim)
    state[0] = z.mean()
    # precompute rotations
    rots = []
    pos = spec.base
    for period, k in zip(spec.periods, spec.ks):
        for j in range(k):
            freq = 2.0 * np.pi * (j + 1) / period
            rots.append((pos + 2 * j, pos + 2 * j + 1, np.cos(freq), np.sin(freq)))
        pos += 2 * k
    cos_idx = [r[0] for r in rots]
    fitted = np.empty(n) if collect else None
    resid = np.empty(n) if collect else None
    sse = 0.0
    for t in range(n):
        level = state[0]
        trend = state[1] if spec.use_trend else 0.0
        seasonal = float(state[cos_idx].sum()) if cos_idx else 0.0
        pred = level + phi * trend + seasonal
        e = z[t] - pred
        sse += e * e
        if collect:
            fitted[t] = pred
            resid[t] = e
        state[0] = level + phi * trend + alpha * e
        if spec.use_trend:
            state[1] = phi * trend + beta * e
        gi = 0
        pos = spec.base
        for pi, (period, k) in enumerate(zip(spec.periods, spec.ks)):
            for j in range(k):
                ic, isn, c, s = rots[gi]
                oc, os = state[ic], state[isn]
                state[ic] = c * oc + s * os + g1s[pi] * e
                state[isn] = -s * oc + c * os + g2s[pi] * e
                gi += 1
            pos += 2 * k
    return sse, state, fitted, resid


def tbats(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 12,
    periods: Sequence[int] | None = None,
    use_trend: bool = True,
    damped: bool = False,
    use_box_cox: bool | None = None,
) -> KernelResult:
    periods = list(periods) if periods else [m]
    n = y.size
    min_required = max(max(periods), 10)
    if n < min_required:
        raise InsufficientData(f"need {min_required}, got {n}")
    y = np.asarray(y, dtype=np.float64)

    do_bc = (use_box_cox if use_box_cox is not None else True) and (y > 0).all()
    lam = _estimate_lambda(y) if do_bc else 1.0
    z = _bc(y, lam) if do_bc else y.copy()

    ks = []
    resid_chain = z.copy()
    for p in periods:
        k, resid_chain = _find_harmonics(resid_chain, p)
        ks.append(k)
    spec = _TbatsSpec(periods, ks, use_trend, damped)

    npds = len(periods)
    init = [0.09]
    bounds = [(0.001, 0.999)]
    if use_trend:
        init.append(0.05)
        bounds.append((-0.5, 0.5))
        if damped:
            init.append(0.98)
            bounds.append((0.8, 0.999))
    init += [0.0] * (2 * npds)
    bounds += [(-0.1, 0.1)] * (2 * npds)

    def unpack(p):
        alpha = p[0]
        idx = 1
        beta = 0.0
        phi = 1.0 if use_trend else 0.0
        if use_trend:
            beta = p[idx]; idx += 1
            if damped:
                phi = p[idx]; idx += 1
        g1s = p[idx : idx + npds]
        g2s = p[idx + npds : idx + 2 * npds]
        return alpha, beta, phi, g1s, g2s

    pt = nelder_mead(lambda p: _filter(z, spec, *unpack(p))[0], init, bounds)
    alpha, beta, phi, g1s, g2s = unpack(pt)

    sse, state, fitted_t, resid_t = _filter(z, spec, alpha, beta, phi, g1s, g2s, True)
    sigma2 = sse / n
    ll = -0.5 * n * (1.0 + np.log(2.0 * np.pi * max(sigma2, 1e-300)))
    k_params = 2 + (1 if do_bc else 0) + (1 if use_trend else 0) + (1 if damped else 0) \
        + 2 * npds + sum(2 * k for k in ks)
    aic = -2.0 * ll + 2.0 * k_params

    fitted = _inv_bc(fitted_t, lam) if do_bc else fitted_t
    resid = y - fitted

    # forecast: propagate F without error correction (ref :869-930)
    rots = []
    pos = spec.base
    for period, k in zip(spec.periods, spec.ks):
        for j in range(k):
            freq = 2.0 * np.pi * (j + 1) / period
            rots.append((pos + 2 * j, pos + 2 * j + 1, np.cos(freq), np.sin(freq)))
        pos += 2 * k
    cos_idx = [r[0] for r in rots]
    st = state.copy()
    preds_t = np.empty(h)
    for step in range(h):
        lvl = st[0]
        tr = st[1] if use_trend else 0.0
        seasonal = float(st[cos_idx].sum()) if cos_idx else 0.0
        preds_t[step] = lvl + phi * tr + seasonal
        st[0] = lvl + phi * tr
        if use_trend:
            st[1] = phi * tr
        for ic, isn, c, s in rots:
            oc, os = st[ic], st[isn]
            st[ic] = c * oc + s * os
            st[isn] = -s * oc + c * os
    yhat = _inv_bc(preds_t, lam) if do_bc else preds_t

    zq = z_for_level(level)
    hs = np.arange(1, h + 1, dtype=np.float64)
    se_t = np.sqrt(sigma2 * hs)
    if do_bc:
        lo = _inv_bc(preds_t - zq * se_t, lam)
        hi = _inv_bc(preds_t + zq * se_t, lam)
    else:
        lo = yhat - zq * se_t
        hi = yhat + zq * se_t
    return KernelResult(
        yhat, lo, hi, fitted, resid,
        {"lambda": lam if do_bc else None, "fourier_k": ks, "alpha": float(alpha),
         "beta": float(beta), "phi": float(phi), "aic": float(aic)},
    )


def auto_tbats(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 12,
    periods: Sequence[int] | None = None,
) -> KernelResult:
    """Min-AIC over {trend, no-trend, damped} × {Box-Cox on/off}."""
    periods = list(periods) if periods else [m]
    can_bc = (np.asarray(y) > 0).all()
    configs = []
    for trend_cfg in (("trend", True, False), ("no_trend", False, False),
                      ("damped", True, True)):
        for bc in ([True, False] if can_bc else [False]):
            configs.append((trend_cfg[0], trend_cfg[1], trend_cfg[2], bc))
    best, best_aic, scores = None, np.inf, {}
    for name, use_trend, damped, bc in configs:
        try:
            r = tbats(y, h, level, m, periods, use_trend, damped, use_box_cox=bc)
        except Exception:
            continue
        key = f"{name}{'+bc' if bc else ''}"
        scores[key] = r.params["aic"]
        if np.isfinite(r.params["aic"]) and r.params["aic"] < best_aic:
            best, best_aic = r, r.params["aic"]
            best.params["selected"] = key
    if best is None:
        raise InsufficientData("no TBATS candidate fit")
    best.params["scores"] = scores
    return best
