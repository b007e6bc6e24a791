from anofox_forecast_spark.rollup.tiers import (
    TIER_SECONDS,
    bucket_col,
    cascade_rollup,
    rollup_events,
    rollup_pages,
)

__all__ = [
    "TIER_SECONDS",
    "bucket_col",
    "cascade_rollup",
    "rollup_events",
    "rollup_pages",
]
