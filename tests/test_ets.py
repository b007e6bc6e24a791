"""ETS state-space + AutoETS kernel tests (ref ets.rs/auto_ets.rs semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models.ets import auto_ets, ets
from anofox_forecast_spark.models.kernels import InsufficientData, ses


def _seasonal_trend(n=72, m=12, noise=0.0, seed=42):
    t = np.arange(n, dtype=np.float64)
    rng = np.random.default_rng(seed)
    return 20 + 0.3 * t + 8 * np.sin(2 * np.pi * t / m) + noise * rng.normal(size=n)


def test_ets_ann_close_to_ses():
    # ETS(A,N,N) and SES share the recursion; optimizers differ (SSE vs
    # gaussian NLL) but the minimizer is the same alpha → forecasts agree
    rng = np.random.default_rng(42)
    y = 50 + rng.normal(0, 5, 100)
    a = ets(y, 6, spec="ANN")
    b = ses(y, 6)
    assert abs(a.yhat[0] - b.yhat[0]) < 0.5
    assert np.allclose(a.yhat, a.yhat[0])  # flat


def test_ets_aan_linear_trend():
    y = np.arange(1.0, 41.0)
    r = ets(y, 5, spec="AAN")
    assert np.allclose(r.yhat, np.arange(41.0, 46.0), atol=0.2)


def test_ets_aadn_damps():
    y = np.arange(1.0, 41.0)
    r = ets(y, 10, spec="AAdN")
    incr = np.diff(r.yhat)
    assert np.all(incr[1:] <= incr[:-1] + 1e-9)  # damped increments shrink


def test_ets_aaa_seasonal():
    y = _seasonal_trend()
    r = ets(y, 12, m=12, spec="AAA")
    t2 = np.arange(72, 84, dtype=np.float64)
    truth = 20 + 0.3 * t2 + 8 * np.sin(2 * np.pi * t2 / 12)
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.95
    assert r.fitted.size == 72


def test_ets_mam_positive_series():
    t = np.arange(72, dtype=np.float64)
    y = (50 + 0.5 * t) * (1 + 0.3 * np.sin(2 * np.pi * t / 12))
    r = ets(y, 12, m=12, spec="MAM")
    t2 = np.arange(72, 84, dtype=np.float64)
    truth = (50 + 0.5 * t2) * (1 + 0.3 * np.sin(2 * np.pi * t2 / 12))
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.9


def test_ets_information_criteria_ordering():
    y = _seasonal_trend(noise=1.0)
    r = ets(y, 6, m=12, spec="AAA")
    p = r.params
    assert p["aicc"] >= p["aic"]
    assert np.isfinite(p["bic"]) and np.isfinite(p["loglik"])


def test_ets_insufficient():
    with pytest.raises(InsufficientData):
        ets(np.arange(10.0), 3, m=12, spec="AAA")
    with pytest.raises(InsufficientData):
        ets(np.array([1.0]), 3, spec="ANN")


def test_ets_bad_spec():
    with pytest.raises(ValueError):
        ets(np.arange(20.0), 3, spec="XYZ")


def test_auto_ets_selects_seasonal_on_seasonal_data():
    y = _seasonal_trend(noise=0.5)
    r = auto_ets(y, 12, m=12)
    assert r.params["selected"][-1] in ("A", "M")  # seasonal component chosen
    assert len(r.params["scores"]) >= 10  # candidate grid actually explored
    # M,A,A / M,Ad,A excluded (unstable combos)
    assert "MAA" not in r.params["scores"]
    assert "MAdA" not in r.params["scores"]


def test_auto_ets_nonseasonal_when_m1():
    rng = np.random.default_rng(1)
    y = 50 + rng.normal(0, 3, 60)
    r = auto_ets(y, 6, m=1)
    assert r.params["selected"].endswith("N")
    assert np.all(np.isfinite(r.yhat))


def test_auto_ets_additive_only():
    y = _seasonal_trend(noise=0.5)
    r = auto_ets(y, 6, m=12, additive_only=True)
    assert all(s[0] == "A" and not s.endswith("M") for s in r.params["scores"])
