"""Per-model MAD parity vs the reference's statsforecast oracle CSVs.

Runs every kernel on the bit-identical 11-series validation corpus
(sources/validation_corpus.py == /root/reference/validation/generate_data.py)
with the exact configs of /root/reference/validation/run_statsforecast.py:95-140
(h=12, m=12, SES alpha=0.1, WindowAverage w=12, SeasonalWindowAverage w=2,
TSB alpha_d=alpha_p=0.1, GARCH(1,1)) and compares point forecasts to
/root/reference/validation/results/statsforecast/point_forecasts.csv.

Usage: python tools/sf_parity.py [model ...]   (default: all)
Prints a per-model table of mean/max MAD across series; shared with
tests/test_statsforecast_parity.py which enforces the reference's own
published ceilings (validation/README.md:104-126).
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict

import numpy as np

from anofox_forecast_spark.models.registry import get_model
from anofox_forecast_spark.sources.validation_corpus import generate_corpus

CSV_PATH = "/root/reference/validation/results/statsforecast/point_forecasts.csv"
H = 12
M = 12

# statsforecast-CSV model name -> (registry name, kwargs)
CONFIGS: dict[str, tuple[str, dict]] = {
    "Naive": ("naive", {}),
    "SeasonalNaive": ("seasonal_naive", {"m": M}),
    "RandomWalkWithDrift": ("random_walk_drift", {}),
    "SES": ("ses", {"alpha": 0.1}),
    "Holt": ("holt", {"m": M}),
    "HoltWinters": ("holt_winters", {"m": M}),
    "ARIMA_1_1_1": ("arima", {"order": (1, 1, 1)}),
    "SARIMA_1_1_1_1_1_1_12": (
        "arima",
        {"order": (1, 1, 1), "seasonal_order": (1, 1, 1), "m": M},
    ),
    # the ref's export runs .with_seasonal_orders(1, 1, 1)
    # (examples/validation/forecast_export.rs:311-313): seasonal P,Q <= 1
    "AutoARIMA": ("auto_arima", {"m": M, "max_P": 1, "max_Q": 1}),
    "AutoETS": ("auto_ets", {"m": M}),
    "Theta": ("theta", {"m": M}),
    "OptimizedTheta": ("optimized_theta", {"m": M}),
    "DynamicTheta": ("dynamic_theta", {"m": M}),
    "DynamicOptimizedTheta": ("dynamic_optimized_theta", {"m": M}),
    "AutoTheta": ("auto_theta", {"m": M}),
    "Croston": ("croston", {}),
    "CrostonSBA": ("croston_sba", {}),
    "TSB": ("tsb", {"alpha_d": 0.1, "alpha_p": 0.1}),
    "ADIDA": ("adida", {}),
    "IMAPA": ("imapa", {}),
    "MSTLForecaster": ("mstl", {"m": M}),
    "SeasonalES": ("seasonal_es", {"m": M, "alpha": 0.1}),
    "GARCH": ("garch", {"p": 1, "q": 1}),
    "TBATS": ("tbats", {"m": M}),
    "AutoTBATS": ("auto_tbats", {"m": M}),
    "MFLES": ("mfles", {"m": M}),
    "SeasonalWindowAverage": ("seasonal_window_average", {"m": M, "window": 2}),
    "HistoricAverage": ("historic_average", {}),
    "WindowAverage": ("window_average", {"window": 12}),
}


def load_oracle() -> dict[tuple[str, str], np.ndarray]:
    """(series_type, model) -> 12-step point forecast vector."""
    rows = defaultdict(dict)
    with open(CSV_PATH) as f:
        for r in csv.DictReader(f):
            rows[(r["series_type"], r["model"])][int(r["step"])] = float(r["forecast"])
    return {
        k: np.array([steps[i] for i in sorted(steps)]) for k, steps in rows.items()
    }


def run_parity(models: list[str] | None = None) -> dict[str, dict[str, float]]:
    """model -> {series_type: MAD}; NaN where the kernel raised."""
    oracle = load_oracle()
    corpus = generate_corpus()
    out: dict[str, dict[str, float]] = {}
    for sf_name, (reg_name, kw) in CONFIGS.items():
        if models and sf_name not in models:
            continue
        fn = get_model(reg_name)
        mads: dict[str, float] = {}
        for series, y in corpus.items():
            ref = oracle.get((series, sf_name))
            if ref is None:
                continue
            try:
                res = fn(y, H, **kw)
                mads[series] = float(np.mean(np.abs(res.yhat - ref)))
            except Exception as e:  # noqa: BLE001 — report, don't die
                mads[series] = float("nan")
                if os.environ.get("SF_PARITY_VERBOSE"):
                    print(f"  {sf_name}/{series}: {type(e).__name__}: {e}")
        out[sf_name] = mads
    return out


def main() -> None:
    models = sys.argv[1:] or None
    res = run_parity(models)
    print(f"{'model':<24}{'mean MAD':>10}{'max MAD':>10}  worst series")
    for name, mads in res.items():
        vals = np.array(list(mads.values()))
        worst = max(mads, key=lambda s: (mads[s] if mads[s] == mads[s] else 1e18))
        print(
            f"{name:<24}{np.nanmean(vals):>10.4f}{np.nanmax(vals):>10.4f}  {worst}"
        )


if __name__ == "__main__":
    main()
