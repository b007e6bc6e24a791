"""ARIMA / SARIMA / AutoARIMA kernels.

Semantics from ref src/models/arima/ (fresh numpy implementation):

- difference/integrate (diff.rs:11-93): iterative first differences;
  integration re-cumsums from the per-level last values of the original.
- seasonal difference/integrate (diff.rs:35-52, model.rs:840-867):
  z_t − z_{t−s}, inverted against the retained tail of the
  non-seasonally-differenced series.
- ARIMA CSS (model.rs:230-256): conditional sum of squares with CENTERED
  AR terms (ar_i · (y_{t−1−i} − intercept)) + MA on running residuals;
  NM over (intercept, ar…, ma…), AR/MA bounds ±0.99, start
  intercept=mean, coeffs 0.1/(i+1), 1000 iters tol 1e-8.
- SARIMA CSS (model.rs:880-1030): UNCENTERED AR/SAR terms + multiplicative
  interaction terms (−ar·sar at lag i+1+(j+1)s for AR; +ma·sma for MA);
  NM 2000 iters.
- fit order (model.rs:1366-1456): regular differencing d first, then
  seasonal D; integration inverts seasonal first, then regular.
- intervals (model.rs:594-624): σ²·h cumulative variance.
- AutoARIMA (auto_arima.rs): d from the variance-ratio
  suggest_differencing (diff.rs:102-130) ± 1 neighbor; grid-stepwise
  candidate set {(0,0),(1,0),(0,1),(1,1),(2,0),(0,2),(2,1),(1,2),(2,2)}
  (+ 13 seasonal cores × (P,Q) grid capped by max_P/max_Q when s>1);
  min-AIC selection; needs n ≥ 10 (3s seasonal). The ref's validation
  export caps seasonal orders at (1,1,1)
  (examples/validation/forecast_export.rs:311-313) — with those caps our
  search reproduces the ref's per-series selections bit-exactly on 9/11
  corpus series (tests/test_statsforecast_parity.py).
"""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.models._numerics import nelder_mead
from anofox_forecast_spark.models.kernels import (
    InsufficientData,
    KernelResult,
    _interval,
    mean_sq,
)

_LN_2PI = float(np.log(2.0 * np.pi))


def difference(y: np.ndarray, d: int) -> np.ndarray:
    out = np.asarray(y, dtype=np.float64)
    for _ in range(d):
        if out.size <= 1:
            break
        out = np.diff(out)
    return out


def seasonal_difference(y: np.ndarray, D: int, s: int) -> np.ndarray:
    out = np.asarray(y, dtype=np.float64)
    for _ in range(D):
        if out.size <= s:
            break
        out = out[s:] - out[:-s]
    return out


def integrate(diff_fc: np.ndarray, original: np.ndarray, d: int) -> np.ndarray:
    """Invert d regular differences for a forecast continuation
    (ref diff.rs:55-93)."""
    result = np.asarray(diff_fc, dtype=np.float64).copy()
    for level in range(d - 1, -1, -1):
        init = difference(original, level)[-1] if level > 0 else original[-1]
        result = init + np.cumsum(result)
    return result


def seasonal_integrate(diff_fc: np.ndarray, last_values: np.ndarray, D: int, s: int) -> np.ndarray:
    """Invert D seasonal differences using the retained history tail
    (ref model.rs:840-867)."""
    result = np.asarray(diff_fc, dtype=np.float64).copy()
    for _ in range(D):
        hist = np.asarray(last_values, dtype=np.float64)
        integrated = np.empty(result.size)
        for h in range(result.size):
            if h < s:
                idx = hist.size - s + h
                prev = hist[idx] if 0 <= idx < hist.size else 0.0
            else:
                prev = integrated[h - s]
            integrated[h] = result[h] + prev
        result = integrated
    return result


def suggest_differencing(y: np.ndarray, max_d: int = 2) -> int:
    """Variance-ratio heuristic (ref diff.rs:102-130; SAMPLE variance n−1,
    ref simd::variance_sample — the ratio near the 0.9 cut is sensitive to
    the denominator because the diffed series is one element shorter)."""
    if y.size < 3:
        return 0
    var0 = y.var(ddof=1)
    d1 = np.diff(y)
    if d1.size < 2:
        return 0
    var1 = d1.var(ddof=1)
    if var0 > 0 and var1 / var0 < 0.9:
        d2 = np.diff(d1)
        if d2.size >= 2:
            var2 = d2.var(ddof=1)
            if var1 > 0 and var2 / var1 < 0.9 and var2 < var0 and max_d >= 2:
                return 2
        return min(1, max_d)
    return 0


def _css_arima(z: np.ndarray, p: int, q: int, ar, ma, intercept: float) -> float:
    """Non-seasonal CSS, centered AR convention (ref model.rs:230-256).

    The AR contribution is vectorized with the SAME per-t accumulation order
    as the scalar recursion (intercept, then ar lags in order), so the float
    result is bit-identical; only the MA residual recursion stays a loop
    (it is an IIR filter — inherently sequential).
    """
    n = z.size
    start = max(p, q)
    if n <= start:
        return np.finfo(np.float64).max
    t_idx = np.arange(start, n)
    pred = np.full(n - start, intercept)
    for i in range(p):
        pred += ar[i] * (z[t_idx - 1 - i] - intercept)
    if q == 0:
        e = z[start:] - pred
        # sequential accumulation (not pairwise dot): the ref sums css
        # scalar-by-scalar, and NM paths are sensitive to last-ulp drift
        css = 0.0
        for v in (e * e).tolist():
            css += v
        return css
    zs = z.tolist()
    preds = pred.tolist()
    ma_t = [(1 + i, float(ma[i])) for i in range(q)]
    resid = [0.0] * n
    css = 0.0
    for k in range(n - start):
        t = start + k
        pr = preds[k]
        for lag, c in ma_t:
            pr += c * resid[t - lag]
        e = zs[t] - pr
        resid[t] = e
        css += e * e
    return css


def _predict_sarima(z, resid, params, spec, h):
    """Extend the differenced series h steps (future residuals = 0)."""
    p, q, P, Q, s = spec
    intercept, ar, ma, sar, sma = params
    zz = list(z)
    rr = list(resid)
    seasonal = P > 0 or Q > 0
    for _ in range(h):
        t = len(zz)
        pred = intercept
        if not seasonal:
            for i in range(p):
                if t > i:
                    pred += ar[i] * (zz[t - 1 - i] - intercept)
            for i in range(q):
                if t > i:
                    pred += ma[i] * rr[t - 1 - i]
        else:
            for i in range(p):
                if t >= i + 1:
                    pred += ar[i] * zz[t - 1 - i]
            for j in range(P):
                lag = (j + 1) * s
                if t >= lag:
                    pred += sar[j] * zz[t - lag]
            for i in range(p):
                for j in range(P):
                    lag = (i + 1) + (j + 1) * s
                    if t >= lag:
                        pred -= ar[i] * sar[j] * zz[t - lag]
            for i in range(q):
                if t >= i + 1:
                    pred += ma[i] * rr[t - 1 - i]
            for j in range(Q):
                lag = (j + 1) * s
                if t >= lag:
                    pred += sma[j] * rr[t - lag]
            for i in range(q):
                for j in range(Q):
                    lag = (i + 1) + (j + 1) * s
                    if t >= lag:
                        pred += ma[i] * sma[j] * rr[t - lag]
        zz.append(pred)
        rr.append(0.0)
    return np.array(zz[len(z):])


def _css_sarima(z, p, q, P, Q, s, ar, ma, sar, sma, intercept) -> float:
    """Seasonal CSS, uncentered + interaction terms (ref model.rs:880-975).

    Vectorized like _css_arima: the z-side (AR + seasonal AR + interaction)
    terms are accumulated per-lag over all t at once in the scalar loop's
    order (bit-identical floats; every lag ≤ start so no guards needed);
    the residual-side (MA/SMA/interaction) recursion stays a tight loop.
    """
    n = z.size
    max_ar = p + P * s if (P > 0 and s > 1) else max(p, P * s)
    max_ma = q + Q * s if (Q > 0 and s > 1) else max(q, Q * s)
    start = max(max_ar, max_ma)
    if n <= start:
        return np.finfo(np.float64).max
    t_idx = np.arange(start, n)
    pred = np.full(n - start, intercept)
    for i in range(p):
        pred += ar[i] * z[t_idx - 1 - i]
    for j in range(P):
        pred += sar[j] * z[t_idx - (j + 1) * s]
    for i in range(p):
        for j in range(P):
            pred -= (ar[i] * sar[j]) * z[t_idx - ((i + 1) + (j + 1) * s)]
    ma_t = (
        [(1 + i, float(ma[i])) for i in range(q)]
        + [((j + 1) * s, float(sma[j])) for j in range(Q)]
        + [
            ((i + 1) + (j + 1) * s, float(ma[i] * sma[j]))
            for i in range(q)
            for j in range(Q)
        ]
    )
    if not ma_t:
        e = z[start:] - pred
        css = 0.0
        for v in (e * e).tolist():  # sequential, matching the scalar loop
            css += v
        return css
    zs = z.tolist()
    preds = pred.tolist()
    resid = [0.0] * n
    css = 0.0
    for k in range(n - start):
        t = start + k
        pr = preds[k]
        for lag, c in ma_t:
            pr += c * resid[t - lag]
        e = zs[t] - pr
        resid[t] = e
        css += e * e
    return css


def arima(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    order: tuple = (1, 1, 1),
    seasonal_order: tuple = (0, 0, 0),
) -> KernelResult:
    """ARIMA(p,d,q) / SARIMA(p,d,q)(P,D,Q)[m] via Nelder-Mead CSS."""
    p, d, q = order
    P, D, Q = seasonal_order
    s = m if (P or D or Q) else 1
    seasonal = s > 1 and (P > 0 or D > 0 or Q > 0)
    n = y.size
    seasonal_lag = max(P, Q) * s if seasonal else 0
    min_len = d + D * s + max(p, q, seasonal_lag) + 2
    if n < max(min_len, 4):
        raise InsufficientData(f"need {min_len}, got {n}")
    y = np.asarray(y, dtype=np.float64)

    nonseasonal_diff = difference(y, d)
    if seasonal and D > 0:
        retain = D * s + s
        seasonal_last = nonseasonal_diff[max(nonseasonal_diff.size - retain, 0):]
        z = seasonal_difference(nonseasonal_diff, D, s)
    else:
        seasonal_last = np.empty(0)
        z = nonseasonal_diff
    if z.size == 0:
        raise InsufficientData("differenced series empty")

    mean = float(z.mean())
    if not seasonal:
        if p == 0 and q == 0:
            intercept, ar, ma = mean, np.empty(0), np.empty(0)
        else:
            init = np.concatenate([[mean], [0.1 / (i + 1) for i in range(p)],
                                   [0.1 / (i + 1) for i in range(q)]])
            bounds = [(-np.inf, np.inf)] + [(-0.99, 0.99)] * (p + q)
            pt = nelder_mead(
                lambda v: _css_arima(z, p, q, v[1:1 + p], v[1 + p:], v[0]),
                init, bounds, max_iter=1000, tolerance=1e-8,
            )
            intercept, ar, ma = float(pt[0]), pt[1:1 + p], pt[1 + p:]
        sar, sma = np.empty(0), np.empty(0)
        start = max(p, q)
    else:
        kpq = p + q + P + Q
        if kpq == 0:
            intercept, ar, ma, sar, sma = mean, *(np.empty(0),) * 4
        else:
            init = [mean]
            for count in (p, q, P, Q):
                init += [0.1 / (i + 1) for i in range(count)]
            bounds = [(-np.inf, np.inf)] + [(-0.99, 0.99)] * kpq
            def obj(v):
                i1, i2, i3 = 1 + p, 1 + p + q, 1 + p + q + P
                return _css_sarima(z, p, q, P, Q, s,
                                   v[1:i1], v[i1:i2], v[i2:i3], v[i3:], v[0])
            pt = nelder_mead(obj, init, bounds, max_iter=2000, tolerance=1e-8)
            i1, i2, i3 = 1 + p, 1 + p + q, 1 + p + q + P
            intercept = float(pt[0])
            ar, ma, sar, sma = pt[1:i1], pt[i1:i2], pt[i2:i3], pt[i3:]
        max_ar = p + P * s if P > 0 else max(p, P * s)
        max_ma = q + Q * s if Q > 0 else max(q, Q * s)
        start = max(max_ar, max_ma)

    # fitted/residuals on the differenced scale (ref model.rs:322-365)
    nz = z.size
    fitted_d = np.full(nz, np.nan)
    resid = np.zeros(nz)
    for t in range(start, nz):
        pred = intercept
        if not seasonal:
            for i in range(p):
                pred += ar[i] * (z[t - 1 - i] - intercept)
            for i in range(q):
                pred += ma[i] * resid[t - 1 - i]
        else:
            for i in range(p):
                pred += ar[i] * z[t - 1 - i]
            for j in range(P):
                pred += sar[j] * z[t - (j + 1) * s]
            for i in range(p):
                for j in range(P):
                    lag = (i + 1) + (j + 1) * s
                    if t >= lag:
                        pred -= ar[i] * sar[j] * z[t - lag]
            for i in range(q):
                pred += ma[i] * resid[t - 1 - i]
            for j in range(Q):
                pred += sma[j] * resid[t - (j + 1) * s]
            for i in range(q):
                for j in range(Q):
                    lag = (i + 1) + (j + 1) * s
                    if t >= lag:
                        pred += ma[i] * sma[j] * resid[t - lag]
        fitted_d[t] = pred
        resid[t] = z[t] - pred

    valid = resid[start:]
    variance = mean_sq(valid)
    k = 1 + p + q + P + Q
    n_eff = valid.size
    ll = -0.5 * n_eff * (1.0 + np.log(max(variance, 1e-300)) + _LN_2PI)
    aic = -2.0 * ll + 2.0 * k
    bic = -2.0 * ll + k * np.log(max(n_eff, 1))

    fc_diff = _predict_sarima(z, resid, (intercept, ar, ma, sar, sma),
                              (p, q, P, Q, s), h)
    if seasonal and D > 0:
        fc_diff = seasonal_integrate(fc_diff, seasonal_last, D, s)
    yhat = integrate(fc_diff, y, d) if d > 0 else fc_diff

    hs = np.arange(1, h + 1, dtype=np.float64)
    if seasonal:
        # ref SARIMA predict_with_intervals (model.rs:1523-1546):
        # var(h) = σ²(1 + 0.1h) — a flat heuristic, NOT the ARIMA σ²h
        se = np.sqrt(variance * (1.0 + 0.1 * hs))
    else:
        se = np.sqrt(variance * hs)
    lo, hi = _interval(yhat, se, level)
    return KernelResult(
        yhat, lo, hi, fitted_d, resid,
        {"order": (p, d, q), "seasonal_order": (P, D, Q, s),
         "intercept": intercept, "ar": list(map(float, ar)),
         "ma": list(map(float, ma)), "aic": aic, "bic": bic},
    )


# Stepwise candidate grids — ref auto_arima.rs:216-302 verbatim:
# 9 pure-nonseasonal (p,q) fit with (P,Q)=(0,0) (but still carrying the
# seasonal differencing D), plus 13 nonseasonal cores × 8 seasonal (P,Q).
_NONSEASONAL_GRID = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 1), (1, 2), (2, 2)]
_SEASONAL_PQ_GRID = [(0, 1), (1, 0), (1, 1), (2, 0), (0, 2), (2, 1), (1, 2), (2, 2)]
_NONSEASONAL_WITH_SEASONAL_GRID = [
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 1), (1, 2),
    (3, 0), (0, 3), (2, 2), (3, 1), (1, 3),
]


def _hill_climb(y, h, level, s, d, D, max_p, max_q, max_P=2, max_Q=2):
    """True-stepwise neighbor search (ref auto_arima.rs:451-560): start from
    (1,d,1)(1,D,1), (0,d,0) and (2,d,2); move to the best ±1 neighbor in
    (p, q, P, Q) until no AIC improvement. 60-70% fewer fits than the grid."""
    def fit(order, sorder):
        try:
            r = arima(y, h, level, s, order=order, seasonal_order=sorder)
            return r, r.params["aic"]
        except Exception:
            return None, np.inf

    starts = [
        ((1, d, 1), (1 if s > 1 else 0, D, 1 if s > 1 else 0)),
        ((0, d, 0), (0, D, 0)),
        ((2, d, 2), (0, D, 0)),
    ]
    # seeds honor the same order caps as the neighbor moves (code-review
    # r3: an uncapped seed could win and escape the caller's max_* bounds)
    starts = [
        ((min(p0, max_p), d, min(q0, max_q)), (min(P0, max_P), D, min(Q0, max_Q)))
        for (p0, _, q0), (P0, _, Q0) in starts
    ]
    best, best_key, best_aic = None, None, np.inf
    evals = {}
    for o, so in starts:
        if (o, so) in evals:  # caps can collapse seeds onto each other
            continue
        r, aic = fit(o, so)
        evals[(o, so)] = aic
        if aic < best_aic:
            best, best_key, best_aic = r, (o, so), aic
    if best is None:
        return None, np.inf, 0
    while True:
        (p, _, q), (P, _, Q) = best_key
        neighbors = []
        for dp, dq, dP, dQ in ((1,0,0,0), (-1,0,0,0), (0,1,0,0), (0,-1,0,0),
                               (0,0,1,0), (0,0,-1,0), (0,0,0,1), (0,0,0,-1)):
            np_, nq = p + dp, q + dq
            nP, nQ = P + dP, Q + dQ
            if not (0 <= np_ <= max_p and 0 <= nq <= max_q):
                continue
            if not (0 <= nP <= max_P and 0 <= nQ <= max_Q):
                continue
            if s <= 1 and (nP or nQ):
                continue
            neighbors.append(((np_, d, nq), (nP, D, nQ)))
        improved = False
        for o, so in neighbors:
            if (o, so) in evals:
                continue
            r, aic = fit(o, so)
            evals[(o, so)] = aic
            if aic < best_aic:
                best, best_key, best_aic = r, (o, so), aic
                improved = True
        if not improved:
            break
    return best, best_aic, len(evals)


_AUTO_ARIMA_CACHE: dict[tuple, KernelResult] = {}
_AUTO_ARIMA_CACHE_MAX = 128


def _cache_put(key: tuple, value: KernelResult) -> None:
    """LRU insert: evict the least-recently-used entry at capacity (plain
    dict preserves insertion order; hits re-insert via _cache_get)."""
    if key in _AUTO_ARIMA_CACHE:
        del _AUTO_ARIMA_CACHE[key]
    elif len(_AUTO_ARIMA_CACHE) >= _AUTO_ARIMA_CACHE_MAX:
        _AUTO_ARIMA_CACHE.pop(next(iter(_AUTO_ARIMA_CACHE)))
    _AUTO_ARIMA_CACHE[key] = value


def _cache_get(key: tuple) -> KernelResult | None:
    hit = _AUTO_ARIMA_CACHE.get(key)
    if hit is not None:  # move-to-end so hot series survive eviction
        del _AUTO_ARIMA_CACHE[key]
        _AUTO_ARIMA_CACHE[key] = hit
    return hit


def auto_arima(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 1,
    max_p: int = 5,
    max_q: int = 5,
    max_d: int = 2,
    max_P: int = 2,
    max_Q: int = 2,
    seasonal: bool | None = None,
    true_stepwise: bool = False,
) -> KernelResult:
    """Grid-stepwise AutoARIMA, min-AIC (ref auto_arima.rs:608-700).

    ``max_P``/``max_Q`` cap the seasonal orders (ref AutoARIMAConfig
    max_cap_p/max_cap_q, default 2). NOTE: the reference's own validation
    export runs ``.with_seasonal_orders(1, 1, 1)``
    (examples/validation/forecast_export.rs:311-313) — reproducing its
    published MAD therefore requires max_P=1, max_Q=1, which prunes every
    (·)(2,·,·)/(·)(·,·,2) candidate from the grid.

    Results are memoized per (series bytes, args) — the search fits ~10²
    candidates, and the same series is commonly refit (cross-validation
    folds, repeated gates, per-model sweeps). Pure function, so the cache
    is exact; entries are deep-copied out because callers (exog path)
    mutate KernelResult in place.
    """
    import copy as _copy

    y = np.ascontiguousarray(y, dtype=np.float64)
    cache_key = (y.tobytes(), h, level, m, max_p, max_q, max_d, max_P, max_Q,
                 seasonal, true_stepwise)
    hit = _cache_get(cache_key)
    if hit is not None:
        return _copy.deepcopy(hit)
    n = y.size
    s = m if (seasonal if seasonal is not None else m > 1) else 1
    min_required = 3 * s if s > 1 else 10
    if n < min_required:
        raise InsufficientData(f"need {min_required}, got {n}")
    d0 = suggest_differencing(y, max_d)
    d_range = sorted({d0, max(d0 - 1, 0), min(d0 + 1, max_d)})
    if s > 1 and n >= 2 * s:
        # ref auto_arima.rs:185-213: D=1 iff seasonal differencing cuts the
        # population variance below 0.7× the original; try both {0, D}.
        sd = y[s:] - y[:-s]
        cap_d_range = sorted({0, 1 if sd.var() < y.var() * 0.7 else 0})
    else:
        cap_d_range = [0]

    if true_stepwise:
        best, best_aic, n_evals = None, np.inf, 0
        for d in d_range:
            for D in cap_d_range:
                r, aic, ev = _hill_climb(y, h, level, s, d, D, max_p, max_q,
                                         max_P, max_Q)
                n_evals += ev
                if r is not None and aic < best_aic:
                    best, best_aic = r, aic
        if best is None:
            raise InsufficientData("no ARIMA candidate fit")
        best.params["n_evals"] = n_evals
        best.params["search"] = "true_stepwise"
        _cache_put(cache_key, _copy.deepcopy(best))
        return best

    # candidate set per (d, D) — ref stepwise_candidates (auto_arima.rs:216-302)
    candidates: list[tuple[int, int, int, int, int, int]] = []
    for d in d_range:
        for D in cap_d_range:
            for (p, q) in _NONSEASONAL_GRID:
                if p <= max_p and q <= max_q:
                    candidates.append((p, d, q, 0, D, 0))
            if s > 1:
                for (p, q) in _NONSEASONAL_WITH_SEASONAL_GRID:
                    if p > max_p or q > max_q:
                        continue
                    for (P, Q) in _SEASONAL_PQ_GRID:
                        if P > max_P or Q > max_Q:
                            continue
                        candidates.append((p, d, q, P, D, Q))
    candidates = sorted(set(candidates))

    best, best_aic, scores = None, np.inf, {}
    for (p, d, q, P, D, Q) in candidates:
        # data-requirement filter (ref auto_arima.rs:563-573)
        min_len = d + D * s + max(p, q, max(P, Q) * max(s, 1)) + 5
        if n < min_len:
            continue
        try:
            r = arima(y, h, level, s, order=(p, d, q), seasonal_order=(P, D, Q))
        except Exception:
            continue
        aic = r.params["aic"]
        key = f"({p},{d},{q})({P},{D},{Q})[{s}]"
        scores[key] = aic
        if np.isfinite(aic) and aic < best_aic:
            best, best_aic = r, aic
    if best is None:
        raise InsufficientData("no ARIMA candidate fit")
    best.params["scores_top"] = dict(sorted(scores.items(), key=lambda kv: kv[1])[:5])
    _cache_put(cache_key, _copy.deepcopy(best))
    return best
