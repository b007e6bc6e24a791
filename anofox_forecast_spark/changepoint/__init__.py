from anofox_forecast_spark.changepoint.pelt import pelt_detect, pelt_detect_spark

__all__ = ["pelt_detect", "pelt_detect_spark"]
