"""Exog path vs the reference's frozen statsforecast fixtures.

The reference validates its exogenous-regressor models against frozen JSON
produced by statsforecast (ref tests/nixtla_validation.rs:1-250, fixtures
tests/reference/{naive,arima,mfles}_exog_reference.json over
test_data_exog.json). This gates OUR exog path (models/exog.py) against the
same fixtures at the reference's own thresholds: AutoARIMA MAPE < 15%
(:138), MFLES MAPE < 10% (:171), direction accuracy ≥ 60% (:239), OLS
coefficient recovery (:181-204). Pure-numpy tests — no Spark needed.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from anofox_forecast_spark.models._numerics import ols_fit
from anofox_forecast_spark.models.exog import fit_predict_exog
from anofox_forecast_spark.models.registry import get_model

REF_DIR = "/root/reference/tests/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference fixtures not available"
)


@pytest.fixture(scope="module")
def data():
    with open(os.path.join(REF_DIR, "test_data_exog.json")) as f:
        return json.load(f)


def _load_ref(model):
    with open(os.path.join(REF_DIR, f"{model}_exog_reference.json")) as f:
        return json.load(f)


def _mape(actual, predicted):
    a, p = np.asarray(actual), np.asarray(predicted)
    return float(np.mean(np.abs((a - p) / a)) * 100)


def _run(data, ref, kernel_name, m=1, **params):
    y = np.asarray(data["y"], dtype=np.float64)
    X = np.column_stack([data["x1"], data["x2"]])
    Xf = np.column_stack([ref["future_x1"], ref["future_x2"]])
    kernel = get_model(kernel_name)
    return fit_predict_exog(kernel, y, X, Xf, ref["horizon"], m=m, **params)


def test_ols_recovers_true_coefficients(data):
    """ref :181-204 — intercept/x1/x2 near (50, 5, 10) despite the AR(1)
    component in the data."""
    y = np.asarray(data["y"], dtype=np.float64)
    X = np.column_stack([data["x1"], data["x2"]])
    coef = ols_fit(y, X)
    true = data["true_coefficients"]
    assert abs(coef[0] - true["intercept"]) < 2.0
    assert abs(coef[1] - true["x1"]) < 1.0
    assert abs(coef[2] - true["x2"]) < 3.0


def test_naive_exog_vs_nixtla(data):
    """statsforecast's Naive ignores exog — its fixture forecast is the
    plain flat last-value (63.6001 × h). Gate: our plain naive reproduces
    the fixture exactly, and our exog-naive equals it plus the OLS
    future-X path (the reference's Naive::predict_with_exog contract,
    ref src/models/baseline/naive.rs:100-141)."""
    ref = _load_ref("naive")
    y = np.asarray(data["y"], dtype=np.float64)
    plain = get_model("naive")(y, ref["horizon"])
    assert _mape(ref["forecast"], plain.yhat) < 1e-6

    res = _run(data, ref, "naive")
    X = np.column_stack([data["x1"], data["x2"]])
    Xf = np.column_stack([ref["future_x1"], ref["future_x2"]])
    coef = ols_fit(y, X)
    resid = y - np.column_stack([np.ones(y.size), X]) @ coef
    expect = resid[-1] + np.column_stack([np.ones(len(Xf)), Xf]) @ coef
    np.testing.assert_allclose(res.yhat, expect, rtol=1e-10)


def test_auto_arima_exog_vs_nixtla(data):
    ref = _load_ref("arima")
    res = _run(data, ref, "auto_arima", m=1)
    assert _mape(ref["forecast"], res.yhat) < 15.0  # ref threshold :138


def test_mfles_exog_vs_nixtla(data):
    ref = _load_ref("mfles")
    res = _run(data, ref, "mfles", m=7)
    assert _mape(ref["forecast"], res.yhat) < 10.0  # ref threshold :171


def test_forecast_direction_matches_nixtla(data):
    """ref :207-244 — ≥60% of step-to-step directions agree."""
    ref = _load_ref("arima")
    res = _run(data, ref, "auto_arima", m=1)
    f = np.asarray(ref["forecast"])
    matches = sum(
        (f[i] > f[i - 1]) == (res.yhat[i] > res.yhat[i - 1])
        for i in range(1, ref["horizon"])
    )
    assert matches / (ref["horizon"] - 1) >= 0.6
