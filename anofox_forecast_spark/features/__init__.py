from anofox_forecast_spark.features.extract import extract_features
from anofox_forecast_spark.features import np_features

__all__ = ["extract_features", "np_features"]
