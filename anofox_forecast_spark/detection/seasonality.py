"""Seasonality presence/strength detection (ref src/detection/seasonality.rs).

ACF-based: detect the dominant period (ACF local maxima), classify
strength by the ACF value at that period — strong / moderate / weak /
none thresholds mirror the reference's tiers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from anofox_forecast_spark.detection.periodicity import _acf_full, _local_maxima


@dataclass
class SeasonalityResult:
    is_seasonal: bool
    period: int | None
    strength: float
    classification: str  # strong | moderate | weak | none


def detect_seasonality(
    y: np.ndarray,
    max_period: int | None = None,
    strong_threshold: float = 0.6,
    moderate_threshold: float = 0.3,
) -> SeasonalityResult:
    n = y.size
    max_lag = min(max_period or n // 2, n // 2)
    if max_lag < 2:
        return SeasonalityResult(False, None, 0.0, "none")
    acf = _acf_full(y, max_lag)
    maxima = [int(k) for k in _local_maxima(acf) if k >= 2]
    if not maxima:
        return SeasonalityResult(False, None, 0.0, "none")
    best = max(maxima, key=lambda k: acf[k])
    strength = float(max(acf[best], 0.0))
    if strength >= strong_threshold:
        cls = "strong"
    elif strength >= moderate_threshold:
        cls = "moderate"
    elif strength > 0.1:
        cls = "weak"
    else:
        cls = "none"
    return SeasonalityResult(cls in ("strong", "moderate"), best, strength, cls)
