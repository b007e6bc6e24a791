from anofox_forecast_spark.transform.window import (
    ewm_mean,
    expanding,
    rolling,
)
from anofox_forecast_spark.transform.scale import scale_series
from anofox_forecast_spark.transform.boxcox import boxcox_col, boxcox_lambda_per_series, inv_boxcox_col

__all__ = [
    "rolling",
    "expanding",
    "ewm_mean",
    "scale_series",
    "boxcox_col",
    "inv_boxcox_col",
    "boxcox_lambda_per_series",
]
