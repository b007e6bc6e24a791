"""ARIMA/SARIMA/AutoARIMA kernel tests."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models.arima import (
    arima,
    auto_arima,
    difference,
    integrate,
    seasonal_difference,
    seasonal_integrate,
    suggest_differencing,
)
from anofox_forecast_spark.models.kernels import InsufficientData


def test_difference_integrate_roundtrip():
    y = np.array([3.0, 7.0, 12.0, 14.0, 20.0, 21.0])
    for d in (1, 2):
        z = difference(y, d)
        assert z.size == y.size - d
    # forecast-continuation round trip: diffs of the true future integrate back
    future = np.array([25.0, 26.0, 30.0])
    full = np.concatenate([y, future])
    dfc = difference(full, 1)[y.size - 1:]
    assert np.allclose(integrate(dfc, y, 1), future)
    dfc2 = difference(full, 2)[y.size - 2:]
    assert np.allclose(integrate(dfc2, y, 2), future)


def test_seasonal_difference_integrate_roundtrip():
    rng = np.random.default_rng(42)
    y = rng.normal(50, 5, 40)
    s, D = 7, 1
    future = rng.normal(50, 5, 10)
    full = np.concatenate([y, future])
    sd = seasonal_difference(full, D, s)
    fc_part = sd[sd.size - 10:]
    back = seasonal_integrate(fc_part, y[-(D * s + s):], D, s)
    assert np.allclose(back, future)


def test_suggest_differencing():
    rng = np.random.default_rng(42)
    assert suggest_differencing(rng.normal(0, 1, 100)) == 0
    t = np.arange(100, dtype=np.float64)
    assert suggest_differencing(10 + 2 * t + rng.normal(0, 0.5, 100)) >= 1


def test_arima_100_recovers_ar1():
    rng = np.random.default_rng(42)
    y = np.zeros(300)
    for i in range(1, 300):
        y[i] = 0.7 * y[i - 1] + rng.normal()
    r = arima(y, 5, order=(1, 0, 0))
    assert abs(r.params["ar"][0] - 0.7) < 0.1
    # forecasts decay toward the mean
    assert abs(r.yhat[4]) < abs(r.yhat[0]) + 0.5


def test_arima_011_on_random_walk():
    rng = np.random.default_rng(7)
    y = np.cumsum(rng.normal(0, 1, 200))
    r = arima(y, 5, order=(0, 1, 1))
    assert np.all(np.isfinite(r.yhat))
    assert abs(r.yhat[0] - y[-1]) < 3.0  # near last level


def test_arima_110_trend():
    t = np.arange(120, dtype=np.float64)
    rng = np.random.default_rng(1)
    y = 5 + 0.8 * t + rng.normal(0, 0.5, 120)
    r = arima(y, 6, order=(1, 1, 0))
    # differenced series mean ≈ 0.8 → forecasts keep climbing
    assert r.yhat[5] > r.yhat[0] > y[-1] - 2
    assert np.all(np.diff(r.hi - r.lo) > -1e-12)  # widening intervals


def test_sarima_seasonal_pattern():
    t = np.arange(96, dtype=np.float64)
    rng = np.random.default_rng(3)
    y = 50 + 10 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, 96)
    r = arima(y, 12, m=12, order=(0, 0, 0), seasonal_order=(1, 1, 0))
    t2 = np.arange(96, 108, dtype=np.float64)
    truth = 50 + 10 * np.sin(2 * np.pi * t2 / 12)
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.9


def test_arima_insufficient():
    with pytest.raises(InsufficientData):
        arima(np.array([1.0, 2.0]), 3, order=(1, 1, 1))


def test_auto_arima_nonseasonal():
    rng = np.random.default_rng(42)
    y = np.zeros(150)
    for i in range(1, 150):
        y[i] = 0.6 * y[i - 1] + rng.normal()
    r = auto_arima(y, 6, m=1)
    assert np.all(np.isfinite(r.yhat))
    assert "scores_top" in r.params
    p, d, q = r.params["order"]
    assert d == 0  # stationary series needs no differencing


def test_auto_arima_seasonal():
    t = np.arange(72, dtype=np.float64)
    rng = np.random.default_rng(5)
    y = 20 + 0.3 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, 72)
    r = auto_arima(y, 12, m=12)
    t2 = np.arange(72, 84, dtype=np.float64)
    truth = 20 + 0.3 * t2 + 8 * np.sin(2 * np.pi * t2 / 12)
    mad = np.mean(np.abs(r.yhat - truth))
    assert mad < 5.0


def test_auto_arima_true_stepwise():
    rng = np.random.default_rng(42)
    y = np.zeros(150)
    for i in range(1, 150):
        y[i] = 0.6 * y[i - 1] + rng.normal()
    r = auto_arima(y, 6, m=1, true_stepwise=True)
    assert r.params["search"] == "true_stepwise"
    assert r.params["n_evals"] <= 35  # bounded; grid-stepwise runs 27+ per (d,D)
    assert np.all(np.isfinite(r.yhat))


def test_hill_climb_seeds_respect_caps():
    """true_stepwise seeds are clamped to max_p/max_q/max_P/max_Q — a
    winning uncapped seed must not escape the caller's bounds
    (code-review r3 finding)."""
    import numpy as np

    from anofox_forecast_spark.models.arima import auto_arima

    rng = np.random.default_rng(3)
    t = np.arange(60)
    y = 10 + 0.8 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.3, 60)
    r = auto_arima(y, 6, m=12, max_P=0, max_Q=0, true_stepwise=True)
    P, D, Q, _s = r.params["seasonal_order"]
    assert P == 0 and Q == 0
    r2 = auto_arima(y, 6, m=12, max_p=1, max_q=1, true_stepwise=True)
    p, d, q = r2.params["order"]
    assert p <= 1 and q <= 1
