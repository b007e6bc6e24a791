from anofox_forecast_spark.core.frequency import Frequency, parse_frequency
from anofox_forecast_spark.core.gapfill import (
    fill_gaps,
    infer_frequency,
    interpolate_linear,
    locf,
    sanitize,
)

__all__ = [
    "Frequency",
    "parse_frequency",
    "fill_gaps",
    "infer_frequency",
    "interpolate_linear",
    "locf",
    "sanitize",
]
