from anofox_forecast_spark.sources.pages import synthesize_pages
from anofox_forecast_spark.sources.tables import load_table, register_views

__all__ = ["synthesize_pages", "load_table", "register_views"]
