from anofox_forecast_spark.detection.outlier import detect_outliers, detect_outliers_spark
from anofox_forecast_spark.detection.periodicity import (
    acf_detect_period,
    autoperiod_detect,
    detect_period,
    fft_detect_period,
    periodogram,
    sazed_detect,
)
from anofox_forecast_spark.detection.seasonality import detect_seasonality

__all__ = [
    "detect_outliers",
    "detect_outliers_spark",
    "acf_detect_period",
    "fft_detect_period",
    "autoperiod_detect",
    "sazed_detect",
    "detect_period",
    "periodogram",
    "detect_seasonality",
]
