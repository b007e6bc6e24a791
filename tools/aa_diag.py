"""AutoARIMA divergence diagnostic.

For each validation series, compare:
  - our auto_arima forecast vs the rust reference's per-series AutoARIMA
    forecast (validation/results/rust/point_forecasts.csv), and
  - both vs statsforecast (the MAD target).

For diverging series, fit EVERY stepwise candidate ourselves and find the
candidate whose forecast is closest to the rust one -> infers which order
the rust search selected, and how its AIC ranks in OUR table. That tells
us whether the gap is a selection flip (near-tied AICs, f32-variance in
ref simd.rs:85-94) or a fit divergence.

Usage: PYTHONPATH=/root/repo python tools/aa_diag.py
"""
from __future__ import annotations

import csv
from collections import defaultdict

import numpy as np

from anofox_forecast_spark.models.arima import (
    arima, auto_arima, suggest_differencing,
    _NONSEASONAL_GRID, _NONSEASONAL_WITH_SEASONAL_GRID, _SEASONAL_PQ_GRID,
)
from anofox_forecast_spark.sources.validation_corpus import generate_corpus

H, M = 12, 12


def load_fc(path, model="AutoARIMA"):
    out = defaultdict(dict)
    with open(path) as f:
        for row in csv.DictReader(f):
            if row["model"] == model:
                out[row["series_type"]][int(row["step"])] = float(row["forecast"])
    return {k: np.array([v[i] for i in sorted(v)]) for k, v in out.items()}


def candidates_for(y, m):
    s = m
    d0 = suggest_differencing(y, 2)
    d_range = sorted({d0, max(d0 - 1, 0), min(d0 + 1, 2)})
    if s > 1 and y.size >= 2 * s:
        sd = y[s:] - y[:-s]
        cap_d_range = sorted({0, 1 if sd.var() < y.var() * 0.7 else 0})
    else:
        cap_d_range = [0]
    cands = []
    for d in d_range:
        for D in cap_d_range:
            for (p, q) in _NONSEASONAL_GRID:
                cands.append((p, d, q, 0, D, 0))
            if s > 1:
                for (p, q) in _NONSEASONAL_WITH_SEASONAL_GRID:
                    for (P, Q) in _SEASONAL_PQ_GRID:
                        if P <= 1 and Q <= 1:
                            cands.append((p, d, q, P, D, Q))
    return sorted(set(cands)), d_range, cap_d_range


def main():
    rust = load_fc("/root/reference/validation/results/rust/point_forecasts.csv")
    sf = load_fc("/root/reference/validation/results/statsforecast/point_forecasts.csv")
    corpus = generate_corpus()
    rows = []
    for name, y in corpus.items():
        if name not in rust:
            continue
        r = auto_arima(y, H, m=M, max_P=1, max_Q=1)
        ours = r.yhat
        mad_ours_sf = float(np.mean(np.abs(ours - sf[name])))
        mad_rust_sf = float(np.mean(np.abs(rust[name] - sf[name])))
        mad_ours_rust = float(np.mean(np.abs(ours - rust[name])))
        rows.append((name, mad_ours_sf, mad_rust_sf, mad_ours_rust, r.params))
    print(f"{'series':24s} {'ours|sf':>9s} {'rust|sf':>9s} {'ours|rust':>9s}  picked")
    for name, a, b, c, params in rows:
        o = params["order"]; so = params["seasonal_order"]
        print(f"{name:24s} {a:9.4f} {b:9.4f} {c:9.4f}  ({o[0]},{o[1]},{o[2]})({so[0]},{so[1]},{so[2]})[{so[3]}]")
    print(f"\nmean ours|sf  = {np.mean([r[1] for r in rows]):.4f}  (target ref {np.mean([r[2] for r in rows]):.4f})")

    # deep-dive the divergent series: which candidate did rust pick?
    for name, a, b, c, params in rows:
        if c < 0.05:
            continue
        y = corpus[name]
        cands, d_range, cap_d_range = candidates_for(y, M)
        table = []
        for (p, d, q, P, D, Q) in cands:
            s = M
            min_len = d + D * s + max(p, q, max(P, Q) * max(s, 1)) + 5
            if y.size < min_len:
                continue
            try:
                r = arima(y, H, m=M, order=(p, d, q), seasonal_order=(P, D, Q))
            except Exception:
                continue
            aic = r.params["aic"]
            if not np.isfinite(aic):
                continue
            dist = float(np.mean(np.abs(r.yhat - rust[name])))
            table.append(((p, d, q, P, D, Q), aic, dist))
        table.sort(key=lambda t: t[1])
        best_by_dist = min(table, key=lambda t: t[2])
        rank_of_rust = next(i for i, t in enumerate(table) if t[0] == best_by_dist[0])
        print(f"\n== {name}: ours|rust={c:.4f}  d_range={d_range} D_range={cap_d_range}")
        print(f"   our pick : {table[0][0]}  aic={table[0][1]:.6f}  dist_to_rust={table[0][2]:.4f}")
        print(f"   rust pick (by fc match): {best_by_dist[0]}  aic={best_by_dist[1]:.6f}  "
              f"dist={best_by_dist[2]:.4f}  rank_in_our_aic={rank_of_rust}")
        print("   top-8 by our AIC:")
        for (o, aic, dist) in table[:8]:
            print(f"     {str(o):22s} aic={aic:14.6f} dist_to_rust={dist:9.4f}")


if __name__ == "__main__":
    main()
