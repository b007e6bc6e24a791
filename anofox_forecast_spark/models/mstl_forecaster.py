"""MSTL forecaster: decompose → forecast deseasonalized → reseasonalize.

Semantics from ref src/models/mstl_forecaster.rs:42-68:
1. MSTL-decompose into trend + per-period seasonals + remainder
2. forecast (trend + remainder) with the trend method (default AutoETS,
   non-seasonal)
3. project each seasonal component by naive last-cycle repetition
4. sum.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from anofox_forecast_spark.models.ets import auto_ets
from anofox_forecast_spark.models.kernels import InsufficientData, KernelResult
from anofox_forecast_spark.models.registry import get_model, register
from anofox_forecast_spark.seasonality.stl import mstl_decompose


def mstl_forecast(
    y: np.ndarray,
    h: int,
    level: float = 0.95,
    m: int = 12,
    periods: Sequence[int] | None = None,
    trend_model: str = "auto_ets",
) -> KernelResult:
    periods = list(periods) if periods else [m]
    dec = mstl_decompose(y, periods)
    if dec is None:
        raise InsufficientData(f"need {2 * max(periods)}, got {y.size}")
    deseasonalized = dec.trend + dec.remainder
    if trend_model == "auto_ets":
        base = auto_ets(deseasonalized, h, level, 1, additive_only=True)
    else:
        base = get_model(trend_model)(deseasonalized, h, level, 1)
    yhat = base.yhat.copy()
    lo = base.lo.copy()
    hi = base.hi.copy()
    n = y.size
    for s, p in zip(dec.seasonal_components, dec.seasonal_periods):
        last_cycle = s[n - p:]
        proj = last_cycle[(np.arange(n, n + h) - n) % p]
        yhat += proj
        lo += proj
        hi += proj
    fitted = dec.trend + sum(dec.seasonal_components)
    resid = y - fitted
    return KernelResult(yhat, lo, hi, fitted, resid,
                        {"periods": periods, "trend_model": trend_model})


register("mstl", mstl_forecast)
