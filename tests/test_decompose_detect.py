"""STL/MSTL, PELT, outlier + periodicity detection tests (numpy level)."""

from __future__ import annotations

import numpy as np

from anofox_forecast_spark.changepoint import pelt_detect
from anofox_forecast_spark.detection import (
    acf_detect_period,
    autoperiod_detect,
    detect_outliers,
    detect_seasonality,
    fft_detect_period,
    sazed_detect,
)
from anofox_forecast_spark.seasonality import (
    mstl_decompose,
    seasonal_strength,
    stl_decompose,
    trend_strength,
)


def _seasonal_series(n=120, m=12, trend=0.3, amp=8.0, noise=0.5, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    return 20 + trend * t + amp * np.sin(2 * np.pi * t / m) + noise * rng.normal(size=n)


def test_stl_reconstruction_and_strengths():
    y = _seasonal_series()
    r = stl_decompose(y, 12)
    assert r is not None
    # exact reconstruction by construction
    assert np.allclose(r.trend + r.seasonal + r.remainder, y)
    assert seasonal_strength(r.seasonal, r.remainder) > 0.8
    assert trend_strength(r.trend, r.remainder) > 0.8
    # seasonal component roughly periodic
    assert np.corrcoef(r.seasonal[:-12], r.seasonal[12:])[0, 1] > 0.95


def test_stl_too_short():
    assert stl_decompose(np.arange(10.0), 12) is None


def test_stl_robust_handles_outliers():
    y = _seasonal_series()
    y[60] += 100.0
    r = stl_decompose(y, 12, robust=True)
    r0 = stl_decompose(y, 12, robust=False)
    # robust trend is less perturbed at the outlier
    assert abs(r.trend[60] - r.trend[55]) < abs(r0.trend[60] - r0.trend[55]) + 5


def test_mstl_two_periods():
    rng = np.random.default_rng(42)
    t = np.arange(24 * 21, dtype=np.float64)
    y = 50 + 5 * np.sin(2 * np.pi * t / 24) + 3 * np.sin(2 * np.pi * t / 168) \
        + 0.5 * rng.normal(size=t.size)
    r = mstl_decompose(y, [24, 168])
    assert r is not None
    assert r.seasonal_periods == [24, 168]
    assert np.allclose(r.trend + sum(r.seasonal_components) + r.remainder, y)
    # the 24-period component carries the daily signal
    s24 = r.seasonal_components[0]
    assert np.corrcoef(s24, 5 * np.sin(2 * np.pi * t / 24))[0, 1] > 0.9


def test_pelt_single_break():
    rng = np.random.default_rng(42)
    y = np.concatenate([50 + rng.normal(0, 1, 100), 70 + rng.normal(0, 1, 100)])
    r = pelt_detect(y, penalty=10.0, cost_fn="l2")
    assert r.n_changepoints == 1
    assert abs(r.changepoints[0] - 100) <= 2
    assert r.segments == [(0, r.changepoints[0]), (r.changepoints[0], 200)]


def test_pelt_no_break_on_stationary():
    rng = np.random.default_rng(42)
    y = 50 + rng.normal(0, 1, 200)
    # BIC=ln(n)~5.3 admits marginal splits on unit-variance noise (same
    # as the reference's penalty semantics); a modest penalty finds none
    r = pelt_detect(y, penalty=10.0, cost_fn="l2")
    assert r.n_changepoints == 0


def test_pelt_costs_agree_on_obvious_break():
    rng = np.random.default_rng(1)
    y = np.concatenate([rng.normal(0, 1, 80), rng.normal(8, 1, 80)])
    for cost in ("l2", "l1", "normal", "linear_trend"):
        r = pelt_detect(y, penalty=15.0, cost_fn=cost)
        assert any(abs(c - 80) <= 3 for c in r.changepoints), cost


def test_pelt_poisson_counts():
    rng = np.random.default_rng(3)
    y = np.concatenate([rng.poisson(3, 100), rng.poisson(12, 100)]).astype(float)
    r = pelt_detect(y, penalty="bic", cost_fn="poisson")
    assert any(abs(c - 100) <= 5 for c in r.changepoints)


def test_outliers_iqr_zscore_mad():
    rng = np.random.default_rng(42)
    y = rng.normal(50, 2, 200)
    y[17] = 90.0
    for method in ("iqr", "zscore", "modified_zscore"):
        r = detect_outliers(y, method)
        assert 17 in r.outlier_indices, method
        assert len(r.outlier_indices) <= 5, method


def test_periodicity_detectors_sine():
    t = np.arange(240, dtype=np.float64)
    y = np.sin(2 * np.pi * t / 12)
    assert acf_detect_period(y) == 12
    assert fft_detect_period(y) == 12
    assert autoperiod_detect(y) in (11, 12, 13)
    assert abs(sazed_detect(y) - 12) <= 1


def test_periodicity_detectors_noise_returns_none_or_weak():
    rng = np.random.default_rng(42)
    y = rng.normal(0, 1, 300)
    # pure noise: ACF detector should find nothing above threshold
    assert acf_detect_period(y) is None


def test_detect_seasonality():
    y = _seasonal_series(trend=0.0, noise=0.3)
    r = detect_seasonality(y)
    assert r.is_seasonal and r.period == 12
    rng = np.random.default_rng(0)
    r2 = detect_seasonality(rng.normal(0, 1, 200))
    assert not r2.is_seasonal or r2.strength < 0.4


def test_pelt_cusum_and_periodicity_costs():
    rng = np.random.default_rng(9)
    y = np.concatenate([rng.normal(0, 1, 80), rng.normal(6, 1, 80)])
    r = pelt_detect(y, penalty=30.0, cost_fn="cusum")
    assert any(abs(c - 80) <= 5 for c in r.changepoints)
    r2 = pelt_detect(y, penalty=15.0, cost_fn="mean_variance")
    assert any(abs(c - 80) <= 3 for c in r2.changepoints)
    # periodicity cost runs and returns a valid segmentation
    t = np.arange(160, dtype=np.float64)
    seasonal = np.sin(2 * np.pi * t / 8)
    r3 = pelt_detect(seasonal, penalty="bic", cost_fn="periodicity")
    assert r3.segments[-1][1] == 160


def test_cfd_autoperiod_and_welch():
    from anofox_forecast_spark.detection.periodicity import (
        cfd_autoperiod_detect,
        welch_periodogram,
    )

    t = np.arange(512, dtype=np.float64)
    rng = np.random.default_rng(4)
    # trend + seasonality + noise: CFD detrends before the FFT
    y = 0.05 * t + 5 * np.sin(2 * np.pi * t / 16) + rng.normal(0, 1, 512)
    p = cfd_autoperiod_detect(y)
    assert p is not None and abs(p - 16) <= 2
    psd = welch_periodogram(np.sin(2 * np.pi * t / 16), window_size=64)
    assert int(np.argmax(psd[1:])) + 1 == 4  # 64/16 = freq bin 4


def test_ewm_var_and_binary_lz():
    from anofox_forecast_spark.features.np_features import lempel_ziv_complexity_binary
    from anofox_forecast_spark.transform.window import ewm_std_np, ewm_var_np

    y = np.array([1.0, 2.0, 1.0, 2.0, 1.0])
    v = ewm_var_np(y, 0.5)
    assert v[0] == 0.0 and np.all(v >= 0)
    assert np.allclose(ewm_std_np(y, 0.5), np.sqrt(v))
    rng = np.random.default_rng(2)
    assert lempel_ziv_complexity_binary(np.tile([1.0, 2.0], 30)) < \
        lempel_ziv_complexity_binary(rng.normal(0, 1, 60))
