"""Outlier detection: IQR | Z-score | Modified Z-score (MAD).

Semantics from ref src/detection/outlier.rs:95-230:
- IQR: q1 = sorted[n/4], q3 = sorted[3n/4] (index-based, not interpolated);
  score = distance beyond the [q1−k·IQR, q3+k·IQR] fence in IQR units;
  threshold 0 (any positive score is an outlier); default multiplier 1.5.
- ZScore: |x−mean|/sample-std; default threshold 3.0.
- ModifiedZScore: |x−median|/(MAD/0.6745); default threshold 3.5.

Two surfaces: numpy (``detect_outliers``) and pure-SQL DataFrame
(``detect_outliers_spark``) — the SQL path computes per-series stats in one
aggregate and broadcasts them back, flagging rows JVM-side (SURVEY §2.11:
"pure SQL" class).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class OutlierResult:
    outlier_indices: np.ndarray
    scores: np.ndarray
    threshold: float
    method: str


def detect_outliers(y: np.ndarray, method: str = "iqr", threshold: float | None = None) -> OutlierResult:
    n = y.size
    if method == "iqr":
        mult = 1.5 if threshold is None else threshold
        finite = np.sort(y[np.isfinite(y)])
        if finite.size < 4:
            scores = np.zeros(n)
            thr = 1.0
        else:
            q1 = finite[finite.size // 4]
            q3 = finite[3 * finite.size // 4]
            iqr = max(q3 - q1, 1e-10)
            lo, hi = q1 - mult * (q3 - q1), q3 + mult * (q3 - q1)
            scores = np.where(y < lo, (lo - y) / iqr, np.where(y > hi, (y - hi) / iqr, 0.0))
            thr = 0.0
    elif method == "zscore":
        thr = 3.0 if threshold is None else threshold
        if n < 2:
            scores = np.zeros(n)
        else:
            std = y.std(ddof=1)
            scores = np.zeros(n) if std < 1e-10 else np.abs((y - y.mean()) / std)
    elif method == "modified_zscore":
        thr = 3.5 if threshold is None else threshold
        if n < 2:
            scores = np.zeros(n)
        else:
            med = np.median(y[np.isfinite(y)])
            mad = np.median(np.abs(y - med))
            scaled = mad / 0.6745
            scores = np.zeros(n) if scaled < 1e-10 else np.abs((y - med) / scaled)
    else:
        raise ValueError(f"unknown method {method!r}")
    idx = np.flatnonzero(scores > thr)
    return OutlierResult(idx, scores, thr, method)


def detect_outliers_spark(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    method: str = "zscore",
    threshold: float | None = None,
) -> DataFrame:
    """Adds ``outlier_score`` + ``is_outlier`` columns — pure SQL path.

    zscore / modified_zscore use exact per-series aggregates joined back
    (broadcast); the zscore variant matches the numpy path exactly, the
    modified variant uses exact percentile for the medians.
    """
    v = F.col(value_col)
    if method == "zscore":
        thr = 3.0 if threshold is None else threshold
        stats = df.groupBy(*keys).agg(
            F.avg(value_col).alias("__m"),
            F.stddev_samp(value_col).alias("__s"),
        )
        joined = df.join(F.broadcast(stats), on=list(keys))
        score = F.when(
            F.coalesce(F.col("__s"), F.lit(0.0)) < 1e-10, 0.0
        ).otherwise(F.abs((v - F.col("__m")) / F.col("__s")))
    elif method == "modified_zscore":
        thr = 3.5 if threshold is None else threshold
        med = df.groupBy(*keys).agg(F.expr(f"percentile({value_col}, 0.5)").alias("__med"))
        with_med = df.join(F.broadcast(med), on=list(keys))
        mad = (
            with_med.withColumn("__ad", F.abs(v - F.col("__med")))
            .groupBy(*keys)
            .agg(F.expr("percentile(__ad, 0.5)").alias("__mad"))
        )
        joined = with_med.join(F.broadcast(mad), on=list(keys))
        scaled = F.col("__mad") / 0.6745
        score = F.when(scaled < 1e-10, 0.0).otherwise(F.abs((v - F.col("__med")) / scaled))
    elif method == "iqr":
        thr = 0.0
        mult = 1.5 if threshold is None else threshold
        stats = df.groupBy(*keys).agg(
            F.expr(f"percentile({value_col}, 0.25)").alias("__q1"),
            F.expr(f"percentile({value_col}, 0.75)").alias("__q3"),
        )
        joined = df.join(F.broadcast(stats), on=list(keys))
        iqr = F.greatest(F.col("__q3") - F.col("__q1"), F.lit(1e-10))
        lo = F.col("__q1") - mult * (F.col("__q3") - F.col("__q1"))
        hi = F.col("__q3") + mult * (F.col("__q3") - F.col("__q1"))
        score = F.when(v < lo, (lo - v) / iqr).when(v > hi, (v - hi) / iqr).otherwise(0.0)
    else:
        raise ValueError(f"unknown method {method!r}")
    out = joined.withColumn("outlier_score", score).withColumn(
        "is_outlier", F.col("outlier_score") > thr
    )
    return out.drop(*[c for c in out.columns if c.startswith("__")])
