from anofox_forecast_spark.evaluation.metrics import (
    accuracy_metrics,
    accuracy_metrics_np,
    winkler_score,
    winkler_score_col,
)
from anofox_forecast_spark.evaluation.cross_validation import cross_validate
from anofox_forecast_spark.evaluation.bootstrap import bootstrap_intervals
from anofox_forecast_spark.evaluation.stat_tests import (
    box_pierce,
    durbin_watson,
    kpss_test,
    ljung_box,
)

__all__ = [
    "accuracy_metrics",
    "accuracy_metrics_np",
    "winkler_score",
    "winkler_score_col",
    "cross_validate",
    "bootstrap_intervals",
    "ljung_box",
    "box_pierce",
    "durbin_watson",
    "kpss_test",
]
