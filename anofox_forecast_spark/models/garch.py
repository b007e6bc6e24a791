"""GARCH(p, q) kernel (ref src/models/garch.rs, statsforecast-compatible).

- σ² recursion (ref :173-218): σ²_k = ω + Σ flip(α)·x²_{k−p..k} +
  Σ flip(β)·σ²_{k−q..k}; σ²_0 = sample variance; computed on the ORIGINAL
  values (statsforecast convention), likelihood on demeaned residuals.
- MLE: NM over (ω, α…, β…), bounds ω∈[0,1e4], α/β∈[0,0.999], stationarity
  Σα+Σβ < 1 enforced by the objective; multi-start (ref :286-300);
  1000 iters tol 1e-10.
- predict (ref :453-540): simulated innovations with numpy legacy seed(1)
  standard normals — reproduced exactly via np.random.RandomState(1) —
  ŷ_k = ε_k·√σ²̂_k; intervals from the variance forecast recursion where
  future y enters as √σ².
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead, z_for_level
from anofox_forecast_spark.models.kernels import InsufficientData, KernelResult

_LN_2PI = float(np.log(2.0 * np.pi))


def _seq_var(x: np.ndarray) -> float:
    """Population variance with SEQUENTIAL accumulation (ref garch.rs:183-185
    sums scalar-by-scalar; numpy's pairwise x.var() differs in the last ulps
    on trending series, which is enough to branch the NM path)."""
    mean = 0.0
    for v in x.tolist():
        mean += v
    mean /= x.size
    s = 0.0
    for v in x.tolist():
        d = v - mean
        s += d * d
    return s / x.size


def _sigma2_series(x: np.ndarray, omega: float, alpha, beta, p: int, q: int) -> np.ndarray:
    n = x.size
    out = np.full(n, np.nan)
    out[0] = _seq_var(x)
    a_f = alpha[::-1]
    b_f = beta[::-1]
    for k in range(max(p, q), n):
        s = omega + float(a_f @ (x[k - p : k] ** 2)) if p else omega
        if q:
            window = out[k - q : k]
            s += float(np.nansum(b_f * window))
        out[k] = s
    return out


def garch(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    p: int = 1,
    q: int = 1,
) -> KernelResult:
    n = y.size
    if n < p + q + 10:
        raise InsufficientData(f"need {p + q + 10}, got {n}")
    y = np.asarray(y, dtype=np.float64)
    mean = y.mean()
    resid = y - mean
    max_lag = max(p, q)

    def neg_ll(params):
        omega = params[0]
        alpha = np.asarray(params[1 : p + 1])
        beta = np.asarray(params[p + 1 :])
        if alpha.sum() + beta.sum() >= 0.9999:
            return np.finfo(np.float64).max
        if omega < 0 or (alpha < 0).any() or (beta < 0).any():
            return np.finfo(np.float64).max
        s2 = _sigma2_series(y, omega, alpha, beta, p, q)
        nll = 0.0
        for k in range(max_lag, n):
            s = s2[k]
            if not (s > 0):
                continue
            nll += 0.5 * (_LN_2PI + np.log(s) + resid[k] ** 2 / s)
        return nll if np.isfinite(nll) else np.finfo(np.float64).max

    bounds = [(0.0, 10000.0)] + [(0.0, 0.999)] * (p + q)
    starts = [
        [0.1] * (p + q + 1),
        [0.01, 0.05, 0.9], [0.0, 0.01, 0.95], [0.001, 0.001, 0.99],
        [0.02, 0.02, 0.02], [0.1, 0.1, 0.1], [0.5, 0.1, 0.8],
    ]
    best, best_v = np.array([0.1] * (p + q + 1)), np.inf
    for s0 in starts:
        if len(s0) != p + q + 1:
            continue
        pt = nelder_mead(neg_ll, s0, bounds, max_iter=1000, tolerance=1e-10)
        v = neg_ll(pt)
        if v < best_v:
            best, best_v = pt, v
    omega = max(float(best[0]), 0.0)
    alpha = np.clip(best[1 : p + 1], 0.0, None)
    beta = np.clip(best[p + 1 :], 0.0, None)

    s2 = _sigma2_series(y, omega, alpha, beta, p, q)
    y_tail = y[-p:].copy() if p else np.empty(0)
    s2_tail = s2[-q:].copy() if q else np.empty(0)

    # variance forecast recursion, future y = sqrt(sigma²) (ref :332-395)
    yv = np.concatenate([y_tail, np.full(h, np.nan)])
    sv = np.concatenate([s2_tail, np.full(h, np.nan)])
    a_f = alpha[::-1]
    b_f = beta[::-1]
    for k in range(h):
        s = omega
        if p:
            s += float(a_f @ (yv[k : k + p] ** 2))
        if q:
            s += float(np.nansum(b_f * sv[k : k + q]))
        yv[p + k] = np.sqrt(s)
        sv[q + k] = s
    var_fc = sv[q:] if q else sv[-h:]

    # point forecast = seeded innovations × conditional sd (ref :453-520)
    errors = np.random.RandomState(1).randn(h)
    yhat = errors * np.sqrt(var_fc)
    z = z_for_level(level)
    lo = yhat - z * np.sqrt(var_fc)
    hi = yhat + z * np.sqrt(var_fc)
    fitted = np.full(n, mean)
    return KernelResult(
        yhat, lo, hi, fitted, resid,
        {"omega": omega, "alpha": list(map(float, alpha)),
         "beta": list(map(float, beta)),
         "unconditional_variance": omega / (1 - alpha.sum() - beta.sum())
         if alpha.sum() + beta.sum() < 1 else omega * 10.0},
    )
