"""Metrics / CV / bootstrap / stat-tests."""

from __future__ import annotations

import datetime as dt

import numpy as np

from anofox_forecast_spark.evaluation import (
    accuracy_metrics,
    accuracy_metrics_np,
    bootstrap_intervals,
    box_pierce,
    cross_validate,
    durbin_watson,
    kpss_test,
    ljung_box,
)

T0 = dt.datetime(2024, 1, 1)


def test_metrics_np_exact():
    a = np.array([10.0, 20.0, 30.0])
    p = np.array([12.0, 18.0, 33.0])
    m = accuracy_metrics_np(a, p, 1)
    assert abs(m["mae"] - 7 / 3) < 1e-12
    assert abs(m["mse"] - (4 + 4 + 9) / 3) < 1e-12
    assert m["mape"] is not None
    # MASE: naive MAE = mean(|20-10|,|30-20|) = 10 → mase = mae/10
    assert abs(m["mase"] - (7 / 3) / 10) < 1e-12
    # zero in actual → MAPE None
    assert accuracy_metrics_np(np.array([0.0, 1.0]), np.array([1.0, 1.0]))["mape"] is None


def test_metrics_smape_reference_formula():
    a = np.array([100.0])
    p = np.array([50.0])
    m = accuracy_metrics_np(a, p)
    assert abs(m["smape"] - 100.0 * (2 * 50 / 150)) < 1e-12


def test_metrics_spark_matches_np(spark):
    rows_a, rows_f = [], []
    rng = np.random.default_rng(42)
    for sid in ("a", "b"):
        y = 50 + rng.normal(0, 5, 20)
        p = y + rng.normal(0, 2, 20)
        for i in range(20):
            ts = T0 + dt.timedelta(days=i)
            rows_a.append((sid, ts, float(y[i])))
            rows_f.append((sid, "m1", ts, float(p[i])))
    actual = spark.createDataFrame(rows_a, "sid string, ds timestamp, y double")
    fc = spark.createDataFrame(rows_f, "sid string, model string, ds timestamp, yhat double")
    out = accuracy_metrics(fc, actual, ["sid"]).toPandas().set_index("sid")

    ya = np.array([r[2] for r in rows_a if r[0] == "a"])
    pa = np.array([r[3] for r in rows_f if r[0] == "a"])
    m = accuracy_metrics_np(ya, pa, 1)
    for c in ("mae", "mse", "rmse", "smape", "r_squared", "mase"):
        assert abs(out.loc["a", c] - m[c]) < 1e-9, c


def test_cross_validate_spark(spark):
    rows = []
    for sid in ("a",):
        for i in range(60):
            rows.append((sid, T0 + dt.timedelta(days=i), float(50 + i * 0.5)))
    df = spark.createDataFrame(rows, "sid string, ts timestamp, y double")
    out = cross_validate(
        df, ["sid"], "ts", "y", ["naive", "random_walk_drift"],
        horizon=5, initial_train=30, step_size=10,
    ).toPandas()
    assert set(out["model"]) == {"naive", "random_walk_drift"}
    folds = out[out.model == "naive"]["fold"].nunique()
    assert folds == 3  # origins 30, 40, 50
    # RWD is exact on a linear series → mae 0; naive lags → mae > 0
    rwd = out[out.model == "random_walk_drift"]["mae"].astype(float)
    nv = out[out.model == "naive"]["mae"].astype(float)
    assert (rwd < 1e-9).all()
    assert (nv > 0.5).all()


def test_bootstrap_intervals_spark(spark):
    rng = np.random.default_rng(42)
    rows = []
    y = 50 + rng.normal(0, 5, 60)
    for i in range(60):
        rows.append(("a", T0 + dt.timedelta(days=i), float(y[i])))
    df = spark.createDataFrame(rows, "sid string, ts timestamp, y double")
    out = bootstrap_intervals(
        df, ["sid"], "ts", "y", "ses", horizon=6, n_samples=50, alpha=0.3,
    ).toPandas().sort_values("step")
    assert len(out) == 6
    assert (out["lo"] <= out["yhat"]).all() and (out["yhat"] <= out["hi"]).all()
    assert (out["hi"] - out["lo"]).mean() > 0.1  # non-degenerate


def test_ljung_box_white_vs_correlated():
    rng = np.random.default_rng(42)
    white = rng.normal(0, 1, 300)
    ar = np.zeros(300)
    for i in range(1, 300):
        ar[i] = 0.8 * ar[i - 1] + rng.normal()
    assert ljung_box(white)["white_noise"]
    assert not ljung_box(ar)["white_noise"]
    assert not box_pierce(ar)["white_noise"]


def test_durbin_watson():
    rng = np.random.default_rng(42)
    white = rng.normal(0, 1, 500)
    assert 1.7 < durbin_watson(white) < 2.3
    ar = np.zeros(500)
    for i in range(1, 500):
        ar[i] = 0.9 * ar[i - 1] + rng.normal()
    assert durbin_watson(ar) < 1.0  # positive autocorrelation → DW << 2


def test_kpss():
    rng = np.random.default_rng(42)
    stationary = rng.normal(0, 1, 400)
    rw = np.cumsum(rng.normal(0, 1, 400))
    assert kpss_test(stationary)["stationary_5pct"]
    assert not kpss_test(rw)["stationary_5pct"]


def test_interval_calibration_naive():
    from anofox_forecast_spark.evaluation.stat_tests import interval_calibration
    from anofox_forecast_spark.models.kernels import naive

    rng = np.random.default_rng(42)
    y = 50 + rng.normal(0, 3, 150)
    r = interval_calibration(y, naive, horizon=4, level=0.9, step=5)
    assert r["n"] > 0
    # naive CI on iid noise should be roughly calibrated (wide tolerance)
    assert 0.6 < r["coverage"] <= 1.0
    assert r["winkler"] > 0
