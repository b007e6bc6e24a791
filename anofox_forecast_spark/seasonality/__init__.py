from anofox_forecast_spark.seasonality.stl import (
    mstl_decompose,
    seasonal_strength,
    stl_decompose,
    stl_decompose_spark,
    trend_strength,
)

__all__ = [
    "stl_decompose",
    "mstl_decompose",
    "stl_decompose_spark",
    "seasonal_strength",
    "trend_strength",
]
