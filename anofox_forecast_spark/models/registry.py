"""Model registry — name → kernel, mirroring ref ModelSpec/ModelRegistry
(src/models/traits.rs:173-264) as a plain dict of numpy kernels."""

from __future__ import annotations

from collections.abc import Callable

from anofox_forecast_spark.models import kernels as K
from anofox_forecast_spark.models.ets import auto_ets, ets

MODELS: dict[str, Callable] = {
    "ets": ets,
    "auto_ets": auto_ets,
    "naive": K.naive,
    "seasonal_naive": K.seasonal_naive,
    "historic_average": K.historic_average,
    "window_average": K.window_average,
    "random_walk_drift": K.random_walk_drift,
    "seasonal_window_average": K.seasonal_window_average,
    "ses": K.ses,
    "holt": K.holt,
    "holt_winters": K.holt_winters,
    "theta": K.theta,
    "optimized_theta": K.optimized_theta,
}


def get_model(name: str) -> Callable:
    try:
        return MODELS[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODELS)}") from None


def register(name: str, fn: Callable) -> None:
    MODELS[name] = fn
