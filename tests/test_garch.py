"""GARCH kernel tests."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models.garch import garch
from anofox_forecast_spark.models.kernels import InsufficientData


def _garch_process(n=400, omega=0.2, a=0.3, b=0.5, seed=42):
    rng = np.random.default_rng(seed)
    eps = np.zeros(n)
    s2 = np.zeros(n)
    s2[0] = omega / (1 - a - b)
    for t in range(1, n):
        s2[t] = omega + a * eps[t - 1] ** 2 + b * s2[t - 1]
        eps[t] = np.sqrt(s2[t]) * rng.normal()
    return eps


def test_garch_recovers_parameters():
    y = _garch_process()
    r = garch(y, 12)
    assert 0.1 < r.params["alpha"][0] < 0.6
    assert 0.2 < r.params["beta"][0] < 0.8
    assert r.params["omega"] > 0
    # stationarity respected
    assert r.params["alpha"][0] + r.params["beta"][0] < 1.0


def test_garch_deterministic_innovations():
    y = _garch_process(seed=7)
    a = garch(y, 10)
    b = garch(y, 10)
    assert np.array_equal(a.yhat, b.yhat)  # numpy seed(1) innovations
    assert np.all(a.lo <= a.yhat) and np.all(a.yhat <= a.hi)


def test_garch_variance_converges_to_unconditional():
    y = _garch_process()
    r = garch(y, 50)
    width = r.hi - r.lo
    # interval width approaches a constant (unconditional sd) at long horizons
    assert abs(width[-1] - width[-2]) < abs(width[1] - width[0]) + 1e-9


def test_garch_insufficient():
    with pytest.raises(InsufficientData):
        garch(np.ones(5), 3)
