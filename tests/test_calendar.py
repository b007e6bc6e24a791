"""CalendarAnnotations: holiday dim join, business days, exog regressors.

Semantics mirror ref src/core/time_series.rs:109-160: is_holiday = same
calendar day as any holiday; is_business_day = not Sat/Sun and not holiday.
"""

from __future__ import annotations

import datetime as dt

from anofox_forecast_spark.core.calendar import (
    calendar_regressors,
    holiday_dim,
    with_calendar_annotations,
)


def _days(spark, start="2024-01-01", n=14):
    t0 = dt.datetime.fromisoformat(start)
    rows = [("a", t0 + dt.timedelta(days=i), float(i)) for i in range(n)]
    return spark.createDataFrame(rows, "sid string, ts timestamp, y double")


def test_holiday_and_business_day_flags(spark):
    # 2024-01-01 is a Monday; 2024-01-06/07 are Sat/Sun
    df = _days(spark)
    dim = holiday_dim(spark, ["2024-01-01", dt.date(2024, 1, 10)])
    out = with_calendar_annotations(df, "ts", dim).orderBy("ts").collect()
    by_day = {r.ts.date().isoformat(): r for r in out}
    assert by_day["2024-01-01"].is_holiday is True
    assert by_day["2024-01-01"].is_business_day is False  # holiday Monday
    assert by_day["2024-01-02"].is_business_day is True
    assert by_day["2024-01-06"].is_business_day is False  # Saturday
    assert by_day["2024-01-07"].is_business_day is False  # Sunday
    assert by_day["2024-01-10"].is_holiday is True
    assert sum(r.is_holiday for r in out) == 2


def test_inline_holiday_list_matches_dim_join(spark):
    df = _days(spark)
    hol = ["2024-01-03", "2024-01-08"]
    via_dim = with_calendar_annotations(df, "ts", holiday_dim(spark, hol))
    via_lit = with_calendar_annotations(df, "ts", hol)
    cols = ["ts", "is_holiday", "is_business_day"]
    assert sorted(map(tuple, via_dim.select(cols).collect())) == sorted(
        map(tuple, via_lit.select(cols).collect())
    )


def test_calendar_regressors_feed_exog(spark):
    """Holiday dummies flow into forecast_exog as x_cols (ref wires
    CalendarAnnotations regressors into its exog path the same way)."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.models.exog import forecast_exog

    hist = _days(spark, n=20)
    hol = ["2024-01-05", "2024-01-22"]
    hist_x = calendar_regressors(hist, "ts", hol)
    future = _days(spark, start="2024-01-21", n=3).drop("y")
    future_x = calendar_regressors(future, "ts", hol)
    out = forecast_exog(
        hist_x, ["sid"], "ts", "y", ["x_holiday", "x_business_day"],
        future_x, ["naive"], horizon=3,
    ).toPandas()
    assert len(out) == 3
    assert out["yhat"].notna().all()