"""Gap-fill / LOCF / interpolation / frequency-inference Spark tests."""

from __future__ import annotations

import datetime as dt

from anofox_forecast_spark.core import (
    fill_gaps,
    infer_frequency,
    interpolate_linear,
    locf,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _hours(*hs):
    return [T0 + dt.timedelta(hours=h) for h in hs]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "sid string, ts timestamp, y double")


def test_fill_gaps_hourly(spark):
    ts = _hours(0, 1, 4)
    df = _mk(spark, [("a", ts[0], 1.0), ("a", ts[1], 2.0), ("a", ts[2], 5.0)])
    out = fill_gaps(df, ["sid"], "ts", ["y"], "1h").orderBy("ts").collect()
    assert [r.ts.hour for r in out] == [0, 1, 2, 3, 4]
    assert [r.y for r in out] == [1.0, 2.0, None, None, 5.0]
    assert [r.filled for r in out] == [False, False, True, True, False]


def test_fill_gaps_null_measure_is_not_a_gap(spark):
    """A genuinely-NULL value at an EXISTING timestamp must not be marked
    filled — `filled` means the row was absent from the input."""
    ts = _hours(0, 1, 3)
    df = _mk(spark, [("a", ts[0], 1.0), ("a", ts[1], None), ("a", ts[2], 4.0)])
    out = fill_gaps(df, ["sid"], "ts", ["y"], "1h").orderBy("ts").collect()
    assert [r.ts.hour for r in out] == [0, 1, 2, 3]
    assert [r.filled for r in out] == [False, False, True, False]


def test_fill_gaps_monthly(spark):
    # Engine contract: month spines start at date_trunc'd bucket starts
    # (day 1), where Spark sequence and ref iterative add_months agree.
    # For clamped starts Spark computes start + k·months (Jan 31 + 2mo =
    # Mar 31) while the reference chains add_months (Mar 29); documented
    # divergence — tiers only use duration frequencies.
    df = spark.sql(
        "select 'a' sid, to_timestamp(x) ts, 1.0 y from "
        "values ('2024-01-01'), ('2024-04-01') as t(x)"
    )
    out = fill_gaps(df, ["sid"], "ts", ["y"], "1mo").orderBy("ts").collect()
    assert [(r.ts.month, r.ts.day) for r in out] == [(1, 1), (2, 1), (3, 1), (4, 1)]
    # clamping at month-end start still matches ref for the FIRST step
    clamp = spark.sql(
        "select sequence(to_timestamp('2024-01-31'), to_timestamp('2024-02-29'),"
        " interval 1 month) x"
    ).collect()[0].x
    assert clamp[1].day == 29


def test_locf(spark):
    ts = _hours(0, 1, 2, 3)
    df = _mk(
        spark,
        [("a", ts[0], 1.0), ("a", ts[1], None), ("a", ts[2], None), ("a", ts[3], 4.0)],
    )
    out = locf(df, ["sid"], "ts", ["y"]).orderBy("ts").collect()
    assert [r.y for r in out] == [1.0, 1.0, 1.0, 4.0]


def test_locf_leading_nulls_stay(spark):
    ts = _hours(0, 1)
    df = _mk(spark, [("a", ts[0], None), ("a", ts[1], 2.0)])
    out = locf(df, ["sid"], "ts", ["y"]).orderBy("ts").collect()
    assert [r.y for r in out] == [None, 2.0]


def test_interpolate_linear(spark):
    ts = _hours(0, 1, 2, 3, 4)
    df = _mk(
        spark,
        [
            ("a", ts[0], 0.0),
            ("a", ts[1], None),
            ("a", ts[2], None),
            ("a", ts[3], 3.0),
            ("a", ts[4], None),
        ],
    )
    out = interpolate_linear(df, ["sid"], "ts", ["y"]).orderBy("ts").collect()
    # ref kernel: l + (j+1)/(gap+1)*(r-l) → 1.0, 2.0; trailing edge stays NULL
    assert [r.y for r in out] == [0.0, 1.0, 2.0, 3.0, None]


def test_interpolate_fill_edges(spark):
    ts = _hours(0, 1, 2)
    df = _mk(spark, [("a", ts[0], None), ("a", ts[1], 5.0), ("a", ts[2], None)])
    out = (
        interpolate_linear(df, ["sid"], "ts", ["y"], fill_edges=True)
        .orderBy("ts")
        .collect()
    )
    assert [r.y for r in out] == [5.0, 5.0, 5.0]


def test_infer_frequency(spark):
    ts = _hours(0, 1, 2, 3, 7)  # modal diff 1h (3 of 4)
    df = _mk(spark, [("a", t, 1.0) for t in ts])
    row = infer_frequency(df, ["sid"], "ts").collect()[0]
    assert row.freq_seconds == 3600
    assert abs(row.modal_ratio - 0.75) < 1e-9


def test_infer_frequency_calendar_business_days(spark):
    """Mon-Fri daily series: plain modal inference sees 86400 at ratio
    ~0.8 already, but with weekend gaps + holidays it can fail tolerance;
    the calendar variant drops non-business days first (ref
    time_series.rs:770-824)."""
    from anofox_forecast_spark.core import infer_frequency_calendar

    rows = []
    d = dt.datetime(2024, 1, 1)
    while len(rows) < 20:
        if d.weekday() < 5 and d.date() != dt.date(2024, 1, 10):
            rows.append(("a", d, 1.0))
        d += dt.timedelta(days=1)
    df = _mk(spark, rows)
    out = infer_frequency_calendar(
        df, ["sid"], "ts", holidays=["2024-01-10"], tolerance=0.6
    ).collect()
    assert out[0].freq_seconds == 86400


def test_infer_frequency_monthly_snaps_calendar_months(spark):
    """Monthly series with 28/30/31-day spacing: modal-seconds inference
    fails its tolerance, the month-grid variant returns 1 month."""
    from anofox_forecast_spark.core import infer_frequency, infer_frequency_monthly

    rows = [("a", dt.datetime(2024, 1 + (i % 12), 15) + dt.timedelta(days=365 * (i // 12)), 1.0)
            for i in range(14)]
    df = _mk(spark, rows)
    plain = infer_frequency(df, ["sid"], "ts", tolerance=0.7).collect()[0]
    assert plain.freq_seconds is None  # 31-day mode covers only ~54% of diffs
    monthly = infer_frequency_monthly(df, ["sid"], "ts", tolerance=0.7).collect()[0]
    assert monthly.freq_months == 1 and monthly.modal_ratio > 0.9


def test_gapfill_dense_matches_unfused_chain(spark):
    """Fused spine+fill (one mapInPandas) == fill_gaps→locf/interp chain."""
    from anofox_forecast_spark.core.gapfill import gapfill_dense

    ts = _hours(0, 1, 4, 5, 9)
    df = _mk(spark, [("a", t, float(i * i)) for i, t in enumerate(ts)]
             + [("b", ts[0], 7.0), ("b", ts[2], None), ("b", ts[4], 3.0)])

    for method, chain in (
        ("locf", lambda d: locf(d, ["sid"], "ts", ["y"])),
        ("interp", lambda d: interpolate_linear(d, ["sid"], "ts", ["y"])),
        ("none", lambda d: d),
    ):
        want = chain(fill_gaps(df, ["sid"], "ts", ["y"], "1h")) \
            .select("sid", "ts", "y", "filled").orderBy("sid", "ts").collect()
        got = gapfill_dense(df, ["sid"], "ts", ["y"], "1h", method=method) \
            .select("sid", "ts", "y", "filled").orderBy("sid", "ts").collect()
        assert len(got) == len(want), method
        for g, w in zip(got, want):
            assert (g.sid, g.ts, g.filled) == (w.sid, w.ts, w.filled), method
            if w.y is None:
                assert g.y is None, (method, g)
            else:
                assert g.y is not None and abs(g.y - w.y) < 1e-9, (method, g, w)
