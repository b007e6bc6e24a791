"""Exogenous-regressor path (FIXTURES.md §B fixture: y = 50 + 5·x1 + 10·x2
+ AR(1) noise; true coefficients are the OLS-recovery oracle)."""

from __future__ import annotations

import datetime as dt

import numpy as np

from anofox_forecast_spark.models._numerics import ols_fit
from anofox_forecast_spark.models.exog import fit_predict_exog, forecast_exog
from anofox_forecast_spark.models.kernels import naive, ses


def _fixture(n=200, seed=42):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    x1 = np.sin(2 * np.pi * t / 7)
    x2 = t / n
    ar = np.zeros(n)
    for i in range(1, n):
        ar[i] = 0.6 * ar[i - 1] + rng.normal(0, 1)
    y = 50 + 5 * x1 + 10 * x2 + ar
    return y, np.column_stack([x1, x2])


def test_ols_recovers_true_coefficients():
    y, X = _fixture()
    coef = ols_fit(y, X)
    assert abs(coef[0] - 50) < 2      # intercept
    assert abs(coef[1] - 5) < 1      # x1
    assert abs(coef[2] - 10) < 3     # x2 (correlated with AR noise trend)


def test_fit_predict_exog_naive():
    y, X = _fixture()
    n = y.size
    t2 = np.arange(n, n + 7, dtype=np.float64)
    Xf = np.column_stack([np.sin(2 * np.pi * t2 / 7), t2 / n])
    r = fit_predict_exog(naive, y, X, Xf, 7)
    # forecast tracks the known regressor path: weekly sine shape present
    truth = 50 + 5 * Xf[:, 0] + 10 * Xf[:, 1]
    assert np.corrcoef(r.yhat, truth)[0, 1] > 0.9
    assert len(r.params["exog_coef"]) == 3


def test_forecast_exog_spark(spark):
    y, X = _fixture()
    n = y.size
    t0 = dt.datetime(2020, 1, 1)
    hist_rows = [
        ("a", t0 + dt.timedelta(days=i), float(y[i]), float(X[i, 0]), float(X[i, 1]))
        for i in range(n)
    ]
    t2 = np.arange(n, n + 7, dtype=np.float64)
    Xf = np.column_stack([np.sin(2 * np.pi * t2 / 7), t2 / n])
    fut_rows = [
        ("a", t0 + dt.timedelta(days=n + i), float(Xf[i, 0]), float(Xf[i, 1]))
        for i in range(7)
    ]
    hist = spark.createDataFrame(
        hist_rows, "sid string, ts timestamp, y double, x1 double, x2 double")
    fut = spark.createDataFrame(
        fut_rows, "sid string, ts timestamp, x1 double, x2 double")
    out = forecast_exog(
        hist, ["sid"], "ts", "y", ["x1", "x2"], fut,
        models=["naive", "ses"], horizon=7,
    ).toPandas()
    assert set(out["model"]) == {"naive", "ses"}
    got = out[out.model == "naive"].sort_values("step")["yhat"].to_numpy()
    r = fit_predict_exog(naive, y, X, Xf, 7)
    assert np.allclose(got, r.yhat)
