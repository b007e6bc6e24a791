"""Freeze golden forecasts for the 11-series validation corpus.

Runs every registered model over every corpus series (h=12, level=0.95,
m=12 — the reference validation setup) and writes
tests/golden/corpus_forecasts.json. Regenerate ONLY deliberately (kernel
semantics change); the pytest golden gate compares against this file at
the reference's tolerance tiers.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from anofox_forecast_spark.models.registry import MODELS  # noqa: E402
from anofox_forecast_spark.sources.validation_corpus import generate_corpus  # noqa: E402

HORIZON = 12
SKIP = {"window_average"}  # degenerate defaults (window=0 == historic_average)


def main() -> None:
    corpus = generate_corpus()
    out: dict[str, dict[str, list[float]]] = {}
    for series_name, y in corpus.items():
        out[series_name] = {}
        for model_name, kernel in sorted(MODELS.items()):
            if model_name in SKIP:
                continue
            try:
                r = kernel(y, HORIZON, 0.95, 12)
            except Exception as e:
                out[series_name][model_name] = {"error": type(e).__name__}
                continue
            out[series_name][model_name] = {
                "yhat": [round(float(v), 10) for v in r.yhat],
                "lo": [round(float(v), 10) for v in r.lo],
                "hi": [round(float(v), 10) for v in r.hi],
            }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "corpus_forecasts.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_models = sum(len(v) for v in out.values())
    print(f"wrote {path}: {len(out)} series x models = {n_models} entries")


if __name__ == "__main__":
    main()
