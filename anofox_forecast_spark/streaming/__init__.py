from anofox_forecast_spark.streaming.rollup_stream import streaming_rollup

__all__ = ["streaming_rollup"]
