"""Numpy-level kernel tests — mirror of the reference's inline unit tests
(SURVEY §5.1 style: tiny hand-made series, exact assertions)."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models import kernels as K
from anofox_forecast_spark.models._numerics import (
    nelder_mead,
    quantile_normal,
    z_for_level,
)


def test_quantile_normal_abramowitz_stegun():
    # A&S approximation, NOT exact inverse CDF: |err| < 4.5e-4
    assert abs(quantile_normal(0.975) - 1.959964) < 5e-4
    assert abs(quantile_normal(0.5)) < 5e-4
    assert abs(quantile_normal(0.025) + quantile_normal(0.975)) < 1e-12
    assert quantile_normal(0.0) == -np.inf
    assert quantile_normal(1.0) == np.inf


def test_nelder_mead_quadratic():
    pt = nelder_mead(lambda p: (p[0] - 2.0) ** 2 + (p[1] - 3.0) ** 2, [0.0, 0.0])
    assert abs(pt[0] - 2.0) < 0.01 and abs(pt[1] - 3.0) < 0.01


def test_nelder_mead_bounds():
    pt = nelder_mead(lambda p: (p[0] - 2.0) ** 2, [0.5], [(0.0, 1.0)])
    assert 0.0 <= pt[0] <= 1.0
    assert abs(pt[0] - 1.0) < 1e-6


def test_naive():
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    r = K.naive(y, 3, level=0.95)
    assert np.allclose(r.yhat, 5.0)
    # fitted = shifted history (ref naive.rs:391-403)
    assert np.isnan(r.fitted[0])
    assert np.allclose(r.fitted[1:], [1, 2, 3, 4])
    # residuals = first differences; sigma = sqrt(mean(diff^2)) = 1
    z = z_for_level(0.95)
    assert np.allclose(r.hi - r.yhat, z * np.sqrt([1, 2, 3]))


def test_seasonal_naive():
    y = np.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0])
    r = K.seasonal_naive(y, 6, m=4)
    assert np.allclose(r.yhat, [10, 20, 30, 40, 10, 20])
    assert np.all(np.isnan(r.fitted[:4]))
    assert np.allclose(r.fitted[4:], [1, 2, 3, 4])
    # CI grows at season boundaries: k = floor(h/m)+1
    se = (r.hi - r.yhat) / z_for_level(0.95)
    assert np.allclose(se[4] / se[0], np.sqrt(2))


def test_seasonal_naive_insufficient():
    with pytest.raises(K.InsufficientData):
        K.seasonal_naive(np.array([1.0, 2.0]), 2, m=4)


def test_historic_average():
    y = np.array([2.0, 4.0, 6.0])
    r = K.historic_average(y, 2)
    assert np.allclose(r.yhat, 4.0)
    assert np.isnan(r.fitted[0])
    assert np.allclose(r.fitted[1:], [2.0, 3.0])  # expanding mean


def test_window_average():
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    r = K.window_average(y, 2, window=3)
    assert np.allclose(r.yhat, 5.0)  # mean of last 3


def test_random_walk_drift():
    y = np.array([10.0, 12.0, 14.0, 16.0])
    r = K.random_walk_drift(y, 3)
    assert np.allclose(r.yhat, [18.0, 20.0, 22.0])
    assert r.params["drift"] == 2.0
    # perfect line → zero residual variance → zero-width intervals
    assert np.allclose(r.lo, r.yhat)


def test_seasonal_window_average_window1_equals_seasonal_naive():
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    a = K.seasonal_window_average(y, 4, m=4, window=1)
    b = K.seasonal_naive(y, 4, m=4)
    assert np.allclose(a.yhat, b.yhat)


def test_ses_fixed_alpha():
    y = np.array([3.0, 5.0, 9.0, 20.0])
    r = K.ses(y, 2, alpha=0.5)
    # level scan: l0=3; l1=.5*5+.5*3=4; l2=.5*9+.5*4=6.5; l3=.5*20+.5*6.5=13.25
    assert np.allclose(r.yhat, 13.25)
    assert np.allclose(r.fitted, [3.0, 3.0, 4.0, 6.5])
    assert r.residuals[0] == 0.0


def test_ses_optimized_alpha_bounds():
    rng = np.random.default_rng(42)
    y = 50 + rng.normal(0, 5, 80)
    r = K.ses(y, 4)
    assert 0.0001 <= r.params["alpha"] <= 0.9999
    assert np.all(r.lo <= r.yhat) and np.all(r.yhat <= r.hi)
    assert np.all(np.diff(r.hi - r.lo) >= -1e-12)  # widening intervals


def test_holt_fixed_params_linear_trend():
    y = np.arange(1.0, 21.0)
    r = K.holt(y, 5, alpha=0.8, beta=0.2)
    # on a perfect line Holt tracks the line exactly
    assert np.allclose(r.yhat, np.arange(21.0, 26.0), atol=1e-6)


def test_holt_damped_sum():
    y = np.arange(1.0, 31.0)
    r = K.holt(y, 3, alpha=0.8, beta=0.2, damped=True, phi=0.9)
    # damped forecasts grow slower than linear
    assert r.yhat[2] - r.yhat[1] < r.yhat[1] - r.yhat[0] + 1e-12


def test_holt_winters_additive_recovers_seasonality():
    t = np.arange(48, dtype=np.float64)
    y = 10 + 0.5 * t + 5 * np.sin(2 * np.pi * t / 12)
    r = K.holt_winters(y, 12, m=12)
    # forecast continues the seasonal pattern: corr with true continuation high
    t2 = np.arange(48, 60, dtype=np.float64)
    truth = 10 + 0.5 * t2 + 5 * np.sin(2 * np.pi * t2 / 12)
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.9


def test_holt_winters_insufficient():
    with pytest.raises(K.InsufficientData):
        K.holt_winters(np.arange(10.0), 3, m=12)


def test_theta_nonseasonal_trend():
    rng = np.random.default_rng(42)
    t = np.arange(100, dtype=np.float64)
    y = 10 + 0.5 * t + rng.normal(0, 1, 100)
    r = K.theta(y, 12, m=0)
    # STM: drift ≈ half the OLS slope pattern via (1-1/θ)b; forecast rises
    assert r.yhat[-1] > r.yhat[0]
    assert r.fitted.size == 100
    assert np.all(r.lo <= r.yhat) and np.all(r.yhat <= r.hi)


def test_theta_seasonal_multiplicative():
    t = np.arange(96, dtype=np.float64)
    y = (50 + 0.3 * t) * (1 + 0.3 * np.sin(2 * np.pi * t / 12))
    r = K.theta(y, 12, m=12)
    t2 = np.arange(96, 108, dtype=np.float64)
    truth = (50 + 0.3 * t2) * (1 + 0.3 * np.sin(2 * np.pi * t2 / 12))
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.95


def test_all_kernels_horizon_and_interval_invariants():
    # property-style invariants (ref tests/property_tests.rs)
    rng = np.random.default_rng(7)
    t = np.arange(60, dtype=np.float64)
    y = 30 + 0.2 * t + 4 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, 60)
    from anofox_forecast_spark.models.registry import MODELS

    for name, kernel in MODELS.items():
        r = kernel(y, 7, 0.9, 12)
        assert r.yhat.shape == (7,), name
        assert np.all(np.isfinite(r.yhat)), name
        assert np.all(r.lo <= r.yhat + 1e-12) and np.all(r.yhat <= r.hi + 1e-12), name
