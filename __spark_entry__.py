"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``anofox_forecast_spark/`` (see SURVEY.md §2/§7);
this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly tier rollup of the
    events table → gap-fill + LOCF → seasonal-naive forecast per series."""
    from anofox_forecast_spark.plans.driver_queries import q_forecast_snaive_1h

    return q_forecast_snaive_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from anofox_forecast_spark.plans.driver_queries import build_queries
    from anofox_forecast_spark.plans.webtext_queries import build_queries as wq

    # webtext first: the driver's correctness artifact keeps the first 50
    # entries, and the 31 queries added after round 4 (now at the head of
    # the webtext registry) have never received a driver-verified row
    # (VERDICT r5 "next round" #1). Same 81 names either way.
    return {**wq(), **build_queries()}


def oracle_sql() -> dict[str, str]:
    from anofox_forecast_spark.plans.driver_queries import build_oracle_sql
    from anofox_forecast_spark.plans.webtext_queries import build_oracle_sql as wo

    return {**build_oracle_sql(), **wo()}
