from anofox_forecast_spark.streaming.rollup_stream import streaming_rollup
from anofox_forecast_spark.streaming.stateful import streaming_ses_level

__all__ = ["streaming_rollup", "streaming_ses_level"]
