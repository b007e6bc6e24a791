from anofox_forecast_spark.models.harness import forecast, fitted_values
from anofox_forecast_spark.models.registry import MODELS, get_model

__all__ = ["forecast", "fitted_values", "MODELS", "get_model"]
