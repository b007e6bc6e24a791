"""Per-series scaling transforms (ref src/transform/scale.rs:39-140).

All pure DataFrame ops: per-series (center, scale) aggregates are computed
in one hash aggregate and joined back (broadcast for small key sets), so
the transform stays JVM-side. The (center, scale) columns are retained so
``inverse`` is a plain expression — same contract as the reference's
``ScaleResult::inverse``.

Methods:
- standardize: center=mean, scale=sample-std (std<1e-10 → 1)
- normalize:   center=min,  scale=max−min (range<1e-10 → 1)
- robust:      center=median, scale=IQR (exact percentiles, linear interp)
- center:      center=mean, scale=1
- range:       normalize then affine to [a, b]
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_series(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    method: str = "standardize",
    range_min: float = 0.0,
    range_max: float = 1.0,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``{value_col}_scaled`` + ``__center``/``__scale`` columns."""
    out_col = out_col or f"{value_col}_scaled"
    v = F.col(value_col)
    eps = 1e-10
    if method in ("standardize", "center"):
        aggs = [
            F.avg(value_col).alias("__center"),
            (F.stddev_samp(value_col)).alias("__s"),
        ]
        scale_expr = (
            F.lit(1.0)
            if method == "center"
            else F.when(F.coalesce(F.col("__s"), F.lit(0.0)) < eps, 1.0).otherwise(F.col("__s"))
        )
    elif method in ("normalize", "range"):
        aggs = [
            F.min(value_col).alias("__center"),
            (F.max(value_col) - F.min(value_col)).alias("__s"),
        ]
        scale_expr = F.when(F.col("__s") < eps, 1.0).otherwise(F.col("__s"))
    elif method == "robust":
        aggs = [
            F.expr(f"percentile({value_col}, 0.5)").alias("__center"),
            (
                F.expr(f"percentile({value_col}, 0.75)")
                - F.expr(f"percentile({value_col}, 0.25)")
            ).alias("__s"),
        ]
        scale_expr = F.when(F.col("__s") < eps, 1.0).otherwise(F.col("__s"))
    else:
        raise ValueError(f"unknown method {method!r}")

    stats = df.groupBy(*keys).agg(*aggs).withColumn("__scale", scale_expr).drop("__s")
    joined = df.join(F.broadcast(stats), on=list(keys))
    scaled = (v - F.col("__center")) / F.col("__scale")
    if method == "range":
        scaled = scaled * (range_max - range_min) + range_min
    return joined.withColumn(out_col, scaled)


def inverse_scale(
    df: DataFrame,
    scaled_col: str,
    out_col: str,
    range_min: float = 0.0,
    range_max: float = 1.0,
    from_range: bool = False,
) -> DataFrame:
    """Invert using the retained __center/__scale columns."""
    x = F.col(scaled_col)
    if from_range:
        x = (x - range_min) / (range_max - range_min)
    return df.withColumn(out_col, x * F.col("__scale") + F.col("__center"))
