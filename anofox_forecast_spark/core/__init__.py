from anofox_forecast_spark.core.calendar import (
    calendar_regressors,
    holiday_dim,
    with_calendar_annotations,
)
from anofox_forecast_spark.core.frequency import Frequency, parse_frequency
from anofox_forecast_spark.core.gapfill import (
    fill_gaps,
    infer_frequency,
    infer_frequency_calendar,
    infer_frequency_monthly,
    interpolate_linear,
    locf,
    sanitize,
)

__all__ = [
    "Frequency",
    "parse_frequency",
    "calendar_regressors",
    "fill_gaps",
    "holiday_dim",
    "infer_frequency",
    "infer_frequency_calendar",
    "infer_frequency_monthly",
    "interpolate_linear",
    "locf",
    "sanitize",
    "with_calendar_annotations",
]
