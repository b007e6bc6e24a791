"""TBATS + MFLES kernel tests."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models.kernels import InsufficientData
from anofox_forecast_spark.models.mfles import mfles
from anofox_forecast_spark.models.tbats import auto_tbats, tbats


def _mult_seasonal(n=96, m=12, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    y = (50 + 0.5 * t) * (1 + 0.3 * np.sin(2 * np.pi * t / m)) * (1 + rng.normal(0, 0.02, n))
    t2 = np.arange(n, n + 12, dtype=np.float64)
    truth = (50 + 0.5 * t2) * (1 + 0.3 * np.sin(2 * np.pi * t2 / m))
    return y, truth


def test_mfles_multiplicative_seasonal():
    y, truth = _mult_seasonal()
    r = mfles(y, 12, m=12)
    assert bool(r.params["multiplicative"])
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.98
    assert np.mean(np.abs(r.yhat - truth)) < 8.0
    assert r.fitted.size == 96


def test_mfles_additive_mode():
    rng = np.random.default_rng(7)
    t = np.arange(80, dtype=np.float64)
    y = 10 + 0.5 * t + rng.normal(0, 1, 80)  # no seasonality arg
    r = mfles(y, 6, m=1, multiplicative=False)
    assert not bool(r.params["multiplicative"])
    # trend extrapolates upward
    assert r.yhat[-1] > r.yhat[0]


def test_mfles_insufficient():
    with pytest.raises(InsufficientData):
        mfles(np.ones(3), 2)


def test_tbats_trig_seasonality():
    y, truth = _mult_seasonal()
    r = tbats(y, 12, m=12)
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.97
    assert len(r.params["fourier_k"]) == 1 and 1 <= r.params["fourier_k"][0] <= 6
    assert np.all(r.lo <= r.hi)


def test_tbats_multiple_periods():
    rng = np.random.default_rng(3)
    t = np.arange(24 * 14, dtype=np.float64)
    y = 50 + 5 * np.sin(2 * np.pi * t / 24) + 2 * np.sin(2 * np.pi * t / 168) \
        + rng.normal(0, 0.5, t.size)
    r = tbats(y, 24, m=24, periods=[24, 168], use_box_cox=False)
    t2 = np.arange(t.size, t.size + 24, dtype=np.float64)
    truth = 50 + 5 * np.sin(2 * np.pi * t2 / 24) + 2 * np.sin(2 * np.pi * t2 / 168)
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.9


def test_tbats_insufficient():
    with pytest.raises(InsufficientData):
        tbats(np.ones(5), 3, m=12)


def test_auto_tbats_selects_by_aic():
    y, truth = _mult_seasonal()
    r = auto_tbats(y, 12, m=12)
    assert "selected" in r.params and len(r.params["scores"]) >= 3
    assert r.params["scores"][r.params["selected"]] == min(r.params["scores"].values())
    assert np.all(np.isfinite(r.yhat))
