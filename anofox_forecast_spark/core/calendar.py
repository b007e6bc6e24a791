"""Calendar annotations: holiday flags, business days, named regressors.

Mirrors the reference's ``CalendarAnnotations`` (ref src/core/time_series.rs:
109-160): ``is_holiday`` = the timestamp falls on the same calendar day as
any holiday; ``is_business_day`` = not Saturday/Sunday and not a holiday.

Spark-first design: holidays live in a DIM TABLE broadcast-joined on the
calendar date (at 100 TB the fact side never shuffles — the dim is a few KB
of dates), and the flags become plain columns any query or the exog path
(models/exog.py) can consume as 0/1 regressors. A literal-IN variant is
provided for tiny inline holiday lists (stays whole-stage-codegen, no join).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def holiday_dim(spark: SparkSession, holidays: Sequence[dt.date | str]) -> DataFrame:
    """Tiny (holiday_date: date) dim table from dates or 'YYYY-MM-DD' strings."""
    dates = [
        d if isinstance(d, dt.date) else dt.date.fromisoformat(d) for d in holidays
    ]
    return spark.createDataFrame(
        [(d,) for d in sorted(set(dates))], "holiday_date date"
    )


def with_calendar_annotations(
    df: DataFrame,
    ts_col: str,
    holidays: DataFrame | Sequence[dt.date | str] | None = None,
) -> DataFrame:
    """Add ``is_holiday`` and ``is_business_day`` boolean columns.

    ``holidays``: a (holiday_date: date) frame (broadcast-joined), an inline
    date sequence (literal IN — no join), or None (weekends only).
    """
    day = F.to_date(F.col(ts_col))
    # dayofweek: 1=Sunday, 7=Saturday (Spark SQL convention)
    is_weekend = F.dayofweek(F.col(ts_col)).isin(1, 7)
    if holidays is None:
        out = df.withColumn("is_holiday", F.lit(False))
    elif isinstance(holidays, DataFrame):
        dim = holidays.select(F.col("holiday_date")).distinct()
        out = (
            df.withColumn("__day", day)
            .join(
                F.broadcast(dim.withColumn("__hol", F.lit(True))),
                F.col("__day") == F.col("holiday_date"),
                "left",
            )
            .withColumn("is_holiday", F.coalesce(F.col("__hol"), F.lit(False)))
            .drop("__day", "holiday_date", "__hol")
        )
    else:
        dates = sorted(
            {d if isinstance(d, dt.date) else dt.date.fromisoformat(d) for d in holidays}
        )
        out = df.withColumn(
            "is_holiday",
            day.isin(dates) if dates else F.lit(False),
        )
    return out.withColumn(
        "is_business_day", ~is_weekend & ~F.col("is_holiday")
    )


def calendar_regressors(
    df: DataFrame,
    ts_col: str,
    holidays: DataFrame | Sequence[dt.date | str] | None = None,
) -> DataFrame:
    """0/1 double columns ``x_holiday`` / ``x_business_day`` — ready to pass
    as ``x_cols`` into models/exog.forecast_exog (the reference wires its
    CalendarAnnotations regressors into exog the same way)."""
    out = with_calendar_annotations(df, ts_col, holidays)
    return (
        out.withColumn("x_holiday", F.col("is_holiday").cast("double"))
        .withColumn("x_business_day", F.col("is_business_day").cast("double"))
        .drop("is_holiday", "is_business_day")
    )
