from anofox_forecast_spark.streaming.dedup_stream import streaming_exact_dedup
from anofox_forecast_spark.streaming.near_dedup_stream import streaming_minhash_near_dups
from anofox_forecast_spark.streaming.rollup_stream import streaming_rollup
from anofox_forecast_spark.streaming.stateful import streaming_ses_level

__all__ = ["streaming_exact_dedup", "streaming_minhash_near_dups",
           "streaming_rollup", "streaming_ses_level"]
