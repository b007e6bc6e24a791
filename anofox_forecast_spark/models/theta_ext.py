"""Theta family extensions: OTM, DSTM, DOTM, AutoTheta + Ensemble.

Semantics (fresh numpy implementations) from:
- OptimizedTheta (ref src/models/theta/optimized.rs): optimizes (α, θ) by
  3-step-ahead MSE with multi-start NM (starts (.1,2),(.3,2),(.5,2),(.1,3),
  (.3,1.5); bounds α∈[0.01,0.99], θ∈[1,10]; 200 iters, tol 1e-6), then
  runs the STM machinery with those parameters (:409-445).
- DynamicTheta / DynamicOptimizedTheta (ref src/models/theta/dynamic.rs):
  per-step update of linear coefficients
  Bn = ((i−1)Bn + 6(y−ȳ)/(i+1))/(i+2), An = ȳ − Bn(i+2)/2 (:444-476);
  forecast μ_i = level + (1−1/θ)(An·β^i + Bn(1−β^{i+1})/α) (:509-515);
  init: level=ȳ₀=y[0], (An,Bn) by OLS on first min(10,n) points (:415-441);
  DOTM optimizes (α,θ) by 1-step MSE, starts (.1,2),(.3,2),(.5,2),(.1,3)
  (:532-567).
- AutoTheta (ref src/models/theta/auto.rs:155-240): fit STM/OTM/DSTM/DOTM,
  select min in-sample MSE of residuals; needs n ≥ 6.
- Ensemble (ref src/models/ensemble/model.rs:85-141): Mean | Median |
  WeightedMSE (inverse fitted-MSE, normalized) combination of member
  forecasts; intervals combined the same way.
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead
from anofox_forecast_spark.models.kernels import (
    InsufficientData,
    KernelResult,
    _interval,
    _theta_decompose,
    _theta_seasonal_test,
    mean_sq,
    theta,
)


def _prepare_seasonal(y: np.ndarray, m: int):
    """Shared Theta preprocessing: test → decompose → deseasonalize."""
    n = y.size
    should = m >= 4 and n >= 2 * m and _theta_seasonal_test(y, m)
    multiplicative = True
    full, last_cycle = np.empty(0), np.empty(0)
    if should:
        if (y <= 0.0).any():
            multiplicative = False
        else:
            _, lc = _theta_decompose(y, m, True)
            if lc.size and (lc < 0.01).any():
                multiplicative = False
        full, last_cycle = _theta_decompose(y, m, multiplicative)
    if full.size:
        des = (
            y / np.where(np.abs(full) < 1e-10, 1.0, full)
            if multiplicative
            else y - full
        )
    else:
        des = y.astype(np.float64)
    return des, full, last_cycle, multiplicative


def optimized_theta(
    y: np.ndarray, h: int, level: float = 0.95, m: int = 0
) -> KernelResult:
    """OTM: (α, θ) optimized by 3-step-ahead MSE (ref optimized.rs:409-445)."""
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    des, *_ = _prepare_seasonal(y, m)
    xs = np.arange(n, dtype=np.float64)
    x_mean, y_mean = (n - 1) / 2.0, des.mean()
    ss_xx = float(((xs - x_mean) ** 2).sum())
    b = float(((xs - x_mean) * (des - y_mean)).sum() / ss_xx) if ss_xx > 0 else 0.0

    steps = 3

    def mse(p):
        a, th = p[0], p[1]
        if a <= 0.01 or a >= 0.99 or not (1.0 <= th <= 10.0):
            return np.finfo(np.float64).max
        if des.size < steps + 2:
            return np.finfo(np.float64).max
        lvl, sse, count = des[0], 0.0, 0
        for i in range(1, des.size - steps):
            for k in range(1, steps + 1):
                if i + k < des.size:
                    f = lvl + (1.0 - 1.0 / th) * b * (1.0 / a + (k - 1.0))
                    e = des[i + k - 1] - f
                    sse += e * e
                    count += 1
            lvl = a * des[i] + (1.0 - a) * lvl
        return sse / count if count else np.finfo(np.float64).max

    best, best_v = (0.3, 2.0), np.inf
    for start in ((0.1, 2.0), (0.3, 2.0), (0.5, 2.0), (0.1, 3.0), (0.3, 1.5)):
        pt = nelder_mead(mse, list(start), [(0.01, 0.99), (1.0, 10.0)],
                         max_iter=200, tolerance=1e-6)
        v = mse(pt)
        if v < best_v:
            best_v = v
            best = (float(np.clip(pt[0], 0.01, 0.99)), float(np.clip(pt[1], 1.0, 10.0)))
    a, th = best
    return theta(y, h, level, m, theta_param=th, alpha=a, drift_in_fitted=True)


def _dynamic_init(des: np.ndarray):
    """level=y[0], ȳ=y[0], (An,Bn) OLS on first min(10,n) (ref :415-441)."""
    n = des.size
    init_n = min(n, 10)
    xs = np.arange(init_n, dtype=np.float64)
    x_mean = (init_n - 1) / 2.0
    y_mean = des[:init_n].mean()
    ss_xx = float(((xs - x_mean) ** 2).sum())
    bn = float(((xs - x_mean) * (des[:init_n] - y_mean)).sum() / ss_xx) if ss_xx > 0 else 0.0
    an = y_mean - bn * x_mean
    return float(des[0]), float(des[0]), an, bn


def _dynamic_mse(des: np.ndarray, alpha: float, th: float) -> float:
    if des.size < 3:
        return np.finfo(np.float64).max
    level, meany, an, bn = _dynamic_init(des)
    beta = 1.0 - alpha
    sse, count = 0.0, 0
    for i in range(1, des.size):
        f = level + (1.0 - 1.0 / th) * (an * beta**i + bn * (1.0 - beta ** (i + 1)) / alpha)
        e = des[i] - f
        sse += e * e
        count += 1
        level = alpha * des[i] + beta * level
        new_meany = (i * meany + des[i]) / (i + 1.0)
        bn = ((i - 1.0) * bn + 6.0 * (des[i] - meany) / (i + 1.0)) / (i + 2.0)
        an = new_meany - bn * (i + 2.0) / 2.0
        meany = new_meany
    return sse / count if count else np.finfo(np.float64).max


def dynamic_theta(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 0,
    alpha: float = 0.1,
    theta_param: float = 2.0,
    optimize: bool = False,
) -> KernelResult:
    """DSTM/DOTM: Theta with per-step dynamic (An, Bn) (ref dynamic.rs)."""
    n = y.size
    if n < 4:
        raise InsufficientData(f"need 4, got {n}")
    des, full, last_cycle, multiplicative = _prepare_seasonal(y, m)

    if optimize:
        best, best_v = (0.1, 2.0), np.inf
        for start in ((0.1, 2.0), (0.3, 2.0), (0.5, 2.0), (0.1, 3.0)):
            pt = nelder_mead(
                lambda p: _dynamic_mse(des, p[0], p[1])
                if (0.01 < p[0] < 0.99 and 1.0 <= p[1] <= 10.0)
                else np.finfo(np.float64).max,
                list(start), [(0.01, 0.99), (1.0, 10.0)],
                max_iter=200, tolerance=1e-6,
            )
            v = _dynamic_mse(des, float(np.clip(pt[0], 0.01, 0.99)),
                             float(np.clip(pt[1], 1.0, 10.0)))
            if v < best_v:
                best_v = v
                best = (float(np.clip(pt[0], 0.01, 0.99)), float(np.clip(pt[1], 1.0, 10.0)))
        alpha, theta_param = best

    beta = 1.0 - alpha
    lvl, meany, an, bn = _dynamic_init(des)
    fitted = np.empty(n)
    resid = np.zeros(n)
    if full.size:
        fitted[0] = des[0] * full[0] if multiplicative else des[0] + full[0]
    else:
        fitted[0] = des[0]
    for i in range(1, n):
        f_des = lvl + (1.0 - 1.0 / theta_param) * (
            an * beta**i + bn * (1.0 - beta ** (i + 1)) / alpha
        )
        f = f_des
        if full.size:
            f = f_des * full[i] if multiplicative else f_des + full[i]
        fitted[i] = f
        resid[i] = y[i] - f
        lvl = alpha * des[i] + beta * lvl
        new_meany = (i * meany + des[i]) / (i + 1.0)
        bn = ((i - 1.0) * bn + 6.0 * (des[i] - meany) / (i + 1.0)) / (i + 2.0)
        an = new_meany - bn * (i + 2.0) / 2.0
        meany = new_meany

    yhat = np.empty(h)
    for k in range(1, h + 1):
        i = n + k - 1
        yhat[k - 1] = lvl + (1.0 - 1.0 / theta_param) * (
            an * beta**i + bn * (1.0 - beta ** (i + 1)) / alpha
        )
    if last_cycle.size:
        seas = last_cycle[np.arange(h) % m]
        yhat = yhat * seas if multiplicative else yhat + seas

    variance = mean_sq(resid[1:]) if n > 1 else 0.0
    beta2 = beta * beta
    ih = np.arange(1, h + 1)
    if abs(1.0 - beta2) < 1e-10:
        factor = ih.astype(np.float64)
    else:
        factor = np.where(ih == 1, 1.0,
                          1.0 + beta2 * (1.0 - beta2 ** (ih - 1)) / (1.0 - beta2))
    lo, hi = _interval(yhat, np.sqrt(variance * factor), level)
    return KernelResult(yhat, lo, hi, fitted, resid,
                        {"alpha": alpha, "theta": theta_param})


def dynamic_optimized_theta(y, h, level=0.95, m=0):
    return dynamic_theta(y, h, level, m, optimize=True)


def auto_theta(y: np.ndarray, h: int, level: float = 0.95, m: int = 0) -> KernelResult:
    """Best of STM/OTM/DSTM/DOTM by in-sample residual MSE (ref auto.rs).

    Selection details mirror ref auto.rs:154-224 exactly: STM/OTM are fit
    WITH the seasonal decomposition, but DSTM/DOTM are fit on the raw series
    (``DynamicTheta::new(0.1)`` / ``::optimized()`` take no seasonal period);
    the score is MSE over residuals[1:] (ref :135-145 skips the first
    residual, which is structurally 0).
    """
    if y.size < 6:
        raise InsufficientData(f"need 6, got {y.size}")
    candidates = {
        "STM": lambda: theta(y, h, level, m),
        "OTM": lambda: optimized_theta(y, h, level, m),
        "DSTM": lambda: dynamic_theta(y, h, level, 0),
        "DOTM": lambda: dynamic_optimized_theta(y, h, level, 0),
    }
    best, best_name, best_mse = None, None, np.inf
    scores = {}
    for name, fn in candidates.items():
        try:
            r = fn()
        except Exception:
            continue
        tail = r.residuals[1:]
        valid = tail[np.isfinite(tail)]
        mse = mean_sq(valid)
        scores[name] = mse
        if mse < best_mse:
            best, best_name, best_mse = r, name, mse
    if best is None:
        raise InsufficientData("no theta variant fit")
    best.params["selected"] = best_name
    best.params["scores"] = scores
    return best


def ensemble(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    models: tuple = ("ses", "theta", "random_walk_drift"),
    method: str = "mean",
    weights: "tuple | list | None" = None,
) -> KernelResult:
    """Combine member model forecasts (ref ensemble/model.rs:85-141).

    method ∈ {"mean", "median", "weighted_mse", "custom"}; weighted_mse
    weights by normalized inverse MSE of members' fitted values; custom
    uses caller-supplied ``weights`` (one per model, sum-normalized —
    ref model.rs:174-186), validated against the MODEL count before
    fitting, like the reference.
    """
    from anofox_forecast_spark.models.registry import get_model

    if method == "custom":
        # validated against the MODEL count before fitting (model.rs:176-181)
        if weights is None or len(weights) != len(models):
            raise ValueError(
                f"custom weights length ({0 if weights is None else len(weights)}) "
                f"doesn't match model count ({len(models)})"
            )
        # w / w.sum() with sum <= 0 (e.g. [1, -1]) or non-finite entries
        # would silently produce NaN forecasts (ADVICE r4; the ref shares
        # the gap — model.rs:184-186 — but weighted_mse here already
        # guards sum > 0, so custom does too)
        wchk = np.asarray(weights, dtype=np.float64)
        if not np.all(np.isfinite(wchk)) or wchk.sum() <= 0:
            raise ValueError(
                "custom weights must be finite with a positive sum "
                f"(got sum={wchk.sum()!r})"
            )
    results = []
    for name in models:
        try:
            results.append(get_model(name)(y, h, level, m))
        except Exception:
            # ref propagates any member-fit error (model.rs:166 `?`); a
            # custom-weight vector would silently misalign with survivors
            if method == "custom":
                raise
            continue
    if not results:
        raise InsufficientData("no ensemble member fit")
    P = np.vstack([r.yhat for r in results])
    L = np.vstack([r.lo for r in results])
    U = np.vstack([r.hi for r in results])
    if method == "mean":
        yhat, lo, hi = P.mean(0), L.mean(0), U.mean(0)
    elif method == "median":
        yhat, lo, hi = np.median(P, 0), np.median(L, 0), np.median(U, 0)
    elif method == "weighted_mse":
        ws = []
        for r in results:
            if r.fitted.size == y.size:
                d = y - r.fitted
                d = d[np.isfinite(d)]
                ws.append(1.0 / max(mean_sq(d), 1e-10))
            else:
                ws.append(0.0)
        w = np.asarray(ws)
        w = w / w.sum() if w.sum() > 0 else np.full(len(results), 1.0 / len(results))
        yhat, lo, hi = w @ P, w @ L, w @ U
    elif method == "custom":
        w = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()  # sum-normalized like the ref (model.rs:184-186)
        yhat, lo, hi = w @ P, w @ L, w @ U
    else:
        raise ValueError(f"unknown method {method!r}")
    return KernelResult(yhat, lo, hi, params={"members": len(results), "method": method})
