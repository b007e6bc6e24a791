"""Accuracy metrics (ref src/utils/metrics.rs:48-179).

Two surfaces:
- ``accuracy_metrics``: pure SQL join+agg — forecast ⋈ actual on
  (keys…, ds) → per-series mae/mse/rmse/mape/smape/mase/r². The MASE
  naive denominator and the MAPE any-zero rule are computed with
  conditional aggregates so the whole thing stays JVM-side.
- ``accuracy_metrics_np``: numpy twin for kernels/tests.

Formulas (exact reference semantics):
  MAPE: NULL if any actual == 0, else 100·mean(|a−p|/|a|)
  sMAPE: 100·mean(2|a−p| / (|a|+|p|)) with 0 where the denominator is 0
  MASE: MAE / mean(|a_t − a_{t−m}|) over the ACTUAL series (skip first m);
        NULL when n ≤ m or the naive MAE is 0
  R²: 1 − SSres/SStot (1 when SStot == 0)
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def accuracy_metrics_np(
    actual: np.ndarray, predicted: np.ndarray, seasonal_period: int | None = None
) -> dict:
    a, p = np.asarray(actual, float), np.asarray(predicted, float)
    n = a.size
    mae = float(np.abs(a - p).mean())
    mse = float(((a - p) ** 2).mean())
    rmse = float(np.sqrt(mse))
    mape = None if (a == 0.0).any() else float(100.0 * np.abs((a - p) / a).mean())
    denom = np.abs(a) + np.abs(p)
    smape = float(100.0 * np.where(denom == 0, 0.0, 2.0 * np.abs(a - p) / np.where(denom == 0, 1, denom)).mean())
    m = seasonal_period or 1
    mase = None
    if n > m:
        naive_mae = float(np.abs(a[m:] - a[:-m]).mean())
        if naive_mae != 0.0:
            mase = mae / naive_mae
    ss_tot = float(((a - a.mean()) ** 2).sum())
    r2 = 1.0 if ss_tot == 0.0 else 1.0 - float(((a - p) ** 2).sum()) / ss_tot
    return {"mae": mae, "mse": mse, "rmse": rmse, "mape": mape,
            "smape": smape, "mase": mase, "r_squared": r2}


def accuracy_metrics(
    forecast_df: DataFrame,
    actual_df: DataFrame,
    keys: Sequence[str],
    ds_col: str = "ds",
    yhat_col: str = "yhat",
    y_col: str = "y",
    seasonal_period: int = 1,
    extra_group_cols: Sequence[str] = ("model",),
) -> DataFrame:
    """Per-(keys, model) metrics from a forecast↔actual equi-join."""
    keys_l = list(keys)
    group = keys_l + [c for c in extra_group_cols if c in forecast_df.columns]

    joined = forecast_df.join(
        actual_df.select(*keys_l, F.col(ds_col), F.col(y_col)),
        on=[*keys_l, ds_col],
        how="inner",
    )
    a, p = F.col(y_col), F.col(yhat_col)
    err = a - p
    denom = F.abs(a) + F.abs(p)
    per_row = joined.select(
        *group,
        a.alias("__a"),
        err.alias("__e"),
        F.abs(err).alias("__ae"),
        (err * err).alias("__se"),
        F.when(denom == 0.0, 0.0).otherwise(2.0 * F.abs(err) / denom).alias("__sm"),
        F.when(a == 0.0, 1).otherwise(0).alias("__zero"),
        F.abs(err / a).alias("__ape"),
    )
    agg = per_row.groupBy(*group).agg(
        F.avg("__ae").alias("mae"),
        F.avg("__se").alias("mse"),
        F.sqrt(F.avg("__se")).alias("rmse"),
        F.when(F.sum("__zero") > 0, F.lit(None)).otherwise(
            100.0 * F.avg("__ape")
        ).alias("mape"),
        (100.0 * F.avg("__sm")).alias("smape"),
        F.avg("__a").alias("__mean_a"),
        F.sum(F.pow(F.col("__a"), 2)).alias("__sum_a2"),
        F.sum("__a").alias("__sum_a"),
        F.count("*").alias("__n"),
        F.sum("__se").alias("__ss_res"),
    )
    ss_tot = F.col("__sum_a2") - F.pow(F.col("__sum_a"), 2) / F.col("__n")
    agg = agg.withColumn(
        "r_squared",
        F.when(ss_tot == 0.0, 1.0).otherwise(1.0 - F.col("__ss_res") / ss_tot),
    )

    # MASE denominator from the ACTUAL history (per series, seasonal diffs)
    w = Window.partitionBy(*keys_l).orderBy(ds_col)
    naive = (
        actual_df.select(
            *keys_l,
            F.abs(F.col(y_col) - F.lag(y_col, seasonal_period).over(w)).alias("__nd"),
        )
        .groupBy(*keys_l)
        .agg(F.avg("__nd").alias("__naive_mae"))
    )
    out = agg.join(F.broadcast(naive), on=keys_l, how="left").withColumn(
        "mase",
        F.when(
            F.col("__naive_mae").isNull() | (F.col("__naive_mae") == 0.0), F.lit(None)
        ).otherwise(F.col("mae") / F.col("__naive_mae")),
    )
    return out.drop(*[c for c in out.columns if c.startswith("__")])


def winkler_score(
    actual: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    alpha: float,
) -> float:
    """Mean Winkler interval score (ref tests/interval_calibration.rs:35-60).

    W = (hi−lo) + (2/α)·(lo−y) if y < lo, + (2/α)·(y−hi) if y > hi.
    Lower is better: penalizes width plus scaled miscoverage distance.
    α is the nominal miss rate (1 − level). Returns +inf on empty input,
    matching the reference.
    """
    a = np.asarray(actual, float)
    lo = np.asarray(lower, float)
    hi = np.asarray(upper, float)
    if a.size == 0:
        return float("inf")
    w = (hi - lo) \
        + (2.0 / alpha) * np.maximum(lo - a, 0.0) \
        + (2.0 / alpha) * np.maximum(a - hi, 0.0)
    return float(w.mean())


def winkler_score_col(y, lo, hi, alpha: float):
    """Column-expression Winkler score term for Spark aggregation:
    ``df.agg(F.avg(winkler_score_col(...)))`` gives the per-group mean
    score JVM-side (no UDF)."""
    width = hi - lo
    below = F.when(y < lo, (2.0 / alpha) * (lo - y)).otherwise(0.0)
    above = F.when(y > hi, (2.0 / alpha) * (y - hi)).otherwise(0.0)
    return width + below + above
