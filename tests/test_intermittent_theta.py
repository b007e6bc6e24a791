"""Intermittent family + Theta variants + Ensemble kernel tests."""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.models import intermittent as I
from anofox_forecast_spark.models import theta_ext as T
from anofox_forecast_spark.models.kernels import InsufficientData, theta


def _intermittent_series(n=60, seed=42):
    rng = np.random.default_rng(seed)
    occ = rng.random(n) < 0.3
    size = rng.poisson(5, n) + 1
    return np.where(occ, size, 0).astype(np.float64)


def test_croston_classic_flat_positive():
    y = _intermittent_series()
    r = I.croston(y, 5)
    assert np.allclose(r.yhat, r.yhat[0])
    assert r.yhat[0] > 0
    # classic forecast = demand_level / interval_level
    d, iv = I._demands_intervals(y)
    dl = I._ses_final_level(d, 0.1)
    il = I._ses_final_level(iv, 0.1)
    assert abs(r.yhat[0] - dl / max(il, 0.001)) < 1e-12


def test_croston_sba_bias_correction():
    y = _intermittent_series()
    a = I.croston(y, 3)
    b = I.croston_sba(y, 3)
    assert np.allclose(b.yhat, a.yhat * (1 - 0.1 / 2))


def test_croston_sba_optimized_alpha_in_bounds():
    y = _intermittent_series()
    r = I.croston_sba_optimized(y, 3)
    assert 0.01 <= r.params["alpha"] <= 0.99


def test_croston_insufficient():
    with pytest.raises(InsufficientData):
        I.croston(np.array([0.0, 0.0, 5.0, 0.0]), 2)  # only 1 demand


def test_tsb_matches_hand_computation():
    y = np.array([0.0, 3.0, 0.0, 0.0, 6.0, 0.0])
    r = I.tsb(y, 4)
    # demands [3,6]: fitted=[3,3], fc = .1*6+.9*3 = 3.3
    # probs [0,1,0,0,1,0]: sf recursion
    p_fit = [0.0]
    for i in range(1, 6):
        pv = [0, 1, 0, 0, 1, 0][i - 1]
        p_fit.append(0.1 * pv + 0.9 * p_fit[-1])
    p_fc = 0.1 * 0 + 0.9 * p_fit[-1]
    assert abs(r.yhat[0] - 3.3 * p_fc) < 1e-12
    assert np.allclose(r.yhat, r.yhat[0])


def test_tsb_all_zero():
    r = I.tsb(np.zeros(10), 3)
    assert np.allclose(r.yhat, 0.0)


def test_adida_aggregation():
    y = _intermittent_series()
    r = I.adida(y, 4)
    assert r.params["level"] >= 1
    assert np.allclose(r.yhat, r.yhat[0])
    assert 0.1 <= r.params["alpha"] <= 0.3  # grid range


def test_imapa_averages_levels():
    y = _intermittent_series()
    r = I.imapa(y, 4)
    assert len(r.params["levels"]) >= 1
    assert np.allclose(r.yhat, r.yhat[0])
    # IMAPA level-1 equals ADIDA at level 1; avg over levels differs in general
    assert np.isfinite(r.yhat[0])


def test_seasonal_es_constant_per_slot():
    # pure seasonal pattern → slot levels converge near slot values
    y = np.tile(np.array([10.0, 20.0, 30.0, 40.0]), 10)
    r = I.seasonal_es(y, 8, m=4, alpha=0.5)
    # n%m==0 so slot s tracks value 10*(s+1) exactly (constant slot series)
    assert np.allclose(r.yhat[:4], [10, 20, 30, 40])
    assert np.allclose(r.yhat[4:], [10, 20, 30, 40])


def test_seasonal_es_optimized():
    rng = np.random.default_rng(3)
    y = np.tile(np.array([10.0, 20.0, 30.0]), 15) + rng.normal(0, 0.5, 45)
    r = I.seasonal_es(y, 3, m=3, optimize=True)
    assert 0.001 <= r.params["alpha"] <= 0.999
    assert abs(r.yhat[0] - 10) < 2 and abs(r.yhat[1] - 20) < 2


def test_optimized_theta_bounds_and_trend():
    rng = np.random.default_rng(42)
    t = np.arange(80, dtype=np.float64)
    y = 10 + 0.5 * t + rng.normal(0, 1, 80)
    r = T.optimized_theta(y, 10)
    assert r.yhat[-1] > r.yhat[0]  # follows trend
    assert np.all(np.isfinite(r.yhat))


def test_dynamic_theta_runs_and_tracks_trend():
    t = np.arange(60, dtype=np.float64)
    y = 5 + 0.8 * t
    r = T.dynamic_theta(y, 6)
    # θ=2 halves the drift (like STM); forecasts must still increase
    assert np.all(np.diff(r.yhat) > 0)
    assert r.yhat[0] > y.mean()  # above the series average at least
    assert r.fitted.size == 60


def test_auto_theta_selects():
    rng = np.random.default_rng(7)
    t = np.arange(80, dtype=np.float64)
    y = 10 + 0.5 * t + rng.normal(0, 1, 80)
    r = T.auto_theta(y, 6)
    assert r.params["selected"] in ("STM", "OTM", "DSTM", "DOTM")
    assert len(r.params["scores"]) >= 2
    # selection = min MSE among scored candidates
    assert r.params["scores"][r.params["selected"]] == min(r.params["scores"].values())


def test_ensemble_mean_median_weighted():
    rng = np.random.default_rng(5)
    y = 50 + rng.normal(0, 3, 60)
    a = T.ensemble(y, 5, method="mean")
    b = T.ensemble(y, 5, method="median")
    c = T.ensemble(y, 5, method="weighted_mse")
    for r in (a, b, c):
        assert r.yhat.shape == (5,)
        assert np.all(np.isfinite(r.yhat))
    # sanity: all near the series level
    assert abs(a.yhat[0] - 50) < 5


def test_ensemble_custom_weights():
    """Custom variant (ref ensemble/model.rs:12-21,174-186): user weights,
    sum-normalized; length validated against model count; degenerate
    one-hot weights reproduce the single member exactly."""
    rng = np.random.default_rng(5)
    y = 50 + rng.normal(0, 3, 60)
    # equal custom weights == mean (same members, both 1/n combinations)
    eq = T.ensemble(y, 5, method="custom", weights=[1.0, 1.0, 1.0])
    mean = T.ensemble(y, 5, method="mean")
    np.testing.assert_allclose(eq.yhat, mean.yhat, rtol=1e-12)
    # normalization: [2,2,2] == [1,1,1]
    eq2 = T.ensemble(y, 5, method="custom", weights=[2.0, 2.0, 2.0])
    np.testing.assert_array_equal(eq.yhat, eq2.yhat)
    # one-hot picks out a single member
    from anofox_forecast_spark.models.registry import get_model

    ses_only = T.ensemble(y, 5, models=("ses", "theta"), method="custom",
                          weights=[1.0, 0.0])
    ses = get_model("ses")(y, 5, 0.95, 1)
    np.testing.assert_allclose(ses_only.yhat, ses.yhat, rtol=1e-12)
    # length mismatch raises like the ref
    import pytest

    with pytest.raises(ValueError, match="doesn't match model count"):
        T.ensemble(y, 5, method="custom", weights=[0.5, 0.5])
    with pytest.raises(ValueError, match="doesn't match model count"):
        T.ensemble(y, 5, method="custom")
    # degenerate weight vectors that would normalize to NaN raise up
    # front instead of silently producing NaN forecasts (ADVICE r4)
    for bad in ([1.0, -1.0, 0.0], [0.0, 0.0, 0.0], [np.nan, 1.0, 1.0],
                [np.inf, 1.0, 1.0]):
        with pytest.raises(ValueError, match="finite with a positive sum"):
            T.ensemble(y, 5, method="custom", weights=bad)


def test_theta_stm_vs_otm_differ():
    rng = np.random.default_rng(11)
    t = np.arange(60, dtype=np.float64)
    y = 10 + 0.3 * t + rng.normal(0, 2, 60)
    stm = theta(y, 6)
    otm = T.optimized_theta(y, 6)
    assert not np.allclose(stm.yhat, otm.yhat)  # optimization changed params
