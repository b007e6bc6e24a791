"""Gap-fill / sanitize / interpolate / frequency-inference — pure DataFrame ops.

Semantics from the reference (all cites into /root/reference):

- ``fill_gaps``: generate spine start..=end at freq; existing ts keep value,
  missing ts get NULL (ref NaN) — src/core/time_series.rs:871-932, spine
  generation :966-1011, calendar month arithmetic with day clamping
  :1014-1039 (Spark ``sequence`` with month intervals has identical clamping).
- ``locf`` (ForwardFill policy): src/core/time_series.rs:673-702.
- ``interpolate_linear``: linear interpolation across NULL runs,
  ``l + (j+1)/(gap+1) * (r-l)`` for the j-th missing point of a run — on an
  equally-spaced spine this equals timestamp-ratio interpolation, which is
  what we compute (src/core/time_series.rs:1063-1117); edges optionally
  filled flat (fill_edges).
- ``sanitize``: MissingValuePolicy Drop | Fill(c) | ForwardFill | Error —
  src/core/time_series.rs:96-106, 608-704.
- ``infer_frequency``: modal spacing of consecutive timestamps with a
  tolerance on the modal ratio — src/core/time_series.rs:727-767.

NULL discipline: Spark aggregates skip NULL but *propagate* NaN, so the
engine's canonical missing marker is NULL; ``nan_to_null`` is applied at
ingest boundaries (the reference uses NaN in-memory,
src/core/time_series.rs:601-605).

Scale notes: the spine is built per-series from a single hash aggregate
(min/max per key) and exploded — no driver-side collection; the left join
back to the data shuffles both sides by (keys, ts) once, and every window
below partitions by the series key only, so Catalyst reuses one hash
partitioning across LOCF/NOCB/interpolation stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anofox_forecast_spark.core.frequency import parse_frequency


def nan_to_null(c: Column) -> Column:
    """Normalize NaN (reference missing marker) to NULL (engine marker)."""
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def _series_window(keys: Sequence[str], ts_col: str) -> Window:
    return Window.partitionBy(*keys).orderBy(ts_col)


def fill_gaps(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    freq: str,
    mark_filled: bool = True,
) -> DataFrame:
    """Per-series dense spine at ``freq``; missing points get NULL values.

    Matches ref fill_gaps (src/core/time_series.rs:871-932): spine runs from
    each series' min(ts) to max(ts) inclusive. Timestamps must already be
    aligned to the frequency grid (the rollup tiers guarantee this since
    bucket starts come from ``window()``).
    """
    f = parse_frequency(freq)
    spine = (
        df.groupBy(*keys)
        .agg(F.min(ts_col).alias("__start"), F.max(ts_col).alias("__end"))
        .select(
            *keys,
            F.explode(
                F.expr(f"sequence(__start, __end, {f.sql_interval()})")
            ).alias(ts_col),
        )
    )
    # Tag observed rows BEFORE the join: `filled` means "row did not exist
    # in the input", not "value is NULL" — a genuinely-NULL measure at an
    # existing timestamp must not be mislabeled as a gap.
    tagged = df.withColumn("__observed", F.lit(True))
    joined = spine.join(tagged, on=[*keys, ts_col], how="left")
    if mark_filled:
        joined = joined.withColumn("filled", F.col("__observed").isNull())
    return joined.drop("__observed")


def locf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Last-observation-carried-forward (ref ForwardFill, :673-702).

    Leading NULLs (no prior observation) stay NULL, same as the reference
    (forward fill leaves leading NaNs).
    """
    w = _series_window(keys, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    fill_edges: bool = False,
) -> DataFrame:
    """Linear interpolation across NULL runs (ref :1063-1117).

    For a missing point at time t between last-known (t0,v0) and next-known
    (t1,v1): v = v0 + (t-t0)/(t1-t0) * (v1-v0). On the equally-spaced spine
    produced by ``fill_gaps`` this is exactly the reference's
    ``l + (j+1)/(gap+1) * (r-l)``. Edges: with fill_edges, leading NULLs take
    the first known value and trailing NULLs the last known (flat), matching
    ref ``interpolated(fill_edges=true)`` (src/core/time_series.rs:707-724).
    """
    w_prev = _series_window(keys, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = _series_window(keys, ts_col).rowsBetween(0, Window.unboundedFollowing)
    ts_d = F.col(ts_col).cast("timestamp").cast("double")  # NTZ-safe under UTC
    out = df
    for c in value_cols:
        v = F.col(c)
        prev_v = F.last(v, ignorenulls=True).over(w_prev)
        next_v = F.first(v, ignorenulls=True).over(w_next)
        prev_t = F.last(F.when(v.isNotNull(), ts_d), ignorenulls=True).over(w_prev)
        next_t = F.first(F.when(v.isNotNull(), ts_d), ignorenulls=True).over(w_next)
        interp = prev_v + (ts_d - prev_t) / (next_t - prev_t) * (next_v - prev_v)
        filled = F.when(v.isNotNull(), v).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t), interp
            ).otherwise(
                F.when(F.lit(fill_edges), F.coalesce(prev_v, next_v)).otherwise(
                    F.lit(None).cast("double")
                )
            )
        )
        out = out.withColumn(c, filled)
    return out


def sanitize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    policy: str = "drop",
    fill_value: float | None = None,
) -> DataFrame:
    """MissingValuePolicy (ref src/core/time_series.rs:96-106, 608-704).

    policy ∈ {"drop", "fill", "forward_fill", "error"}. "drop" removes rows
    where *any* value column is NULL (ref drops the whole observation).
    """
    if policy == "drop":
        cond = None
        for c in value_cols:
            x = F.col(c).isNotNull()
            cond = x if cond is None else (cond & x)
        return df.filter(cond)
    if policy == "fill":
        if fill_value is None:
            raise ValueError("fill policy requires fill_value")
        return df.fillna(fill_value, subset=list(value_cols))
    if policy == "forward_fill":
        return locf(df, keys, ts_col, value_cols)
    if policy == "error":
        # 'error' is enforced by the caller via an assertion query; return a
        # frame the caller can count NULLs on (ref returns MissingValues error)
        return df
    raise ValueError(f"unknown policy {policy!r}")


def infer_frequency_calendar(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    holidays=None,
    tolerance: float = 0.5,
) -> DataFrame:
    """Business-day-aware modal spacing (ref time_series.rs:770-824):
    non-business timestamps (weekends + holidays) are dropped BEFORE the
    spacing histogram, so a Mon-Fri daily series infers 1d instead of
    failing on the 3-day weekend jumps. ``holidays`` as in
    core.calendar.with_calendar_annotations (dim frame / list / None)."""
    from anofox_forecast_spark.core.calendar import with_calendar_annotations

    biz = (
        with_calendar_annotations(df, ts_col, holidays)
        .filter(F.col("is_business_day"))
        .drop("is_holiday", "is_business_day")
    )
    return infer_frequency(biz, keys, ts_col, tolerance)


def infer_frequency_monthly(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tolerance: float = 0.5,
) -> DataFrame:
    """Calendar-month spacing: months_between consecutive points snapped to
    whole months. A monthly/quarterly series whose second-spacing wobbles
    over 28/30/31 days has a single modal MONTH spacing here (the plain
    modal-seconds inference fails its tolerance on exactly those series).

    Returns (keys…, freq_months: int, modal_ratio: double); freq_months
    NULL when no modal month spacing reaches tolerance or spacings are not
    month-aligned (months_between not integral).
    """
    w = _series_window(keys, ts_col)
    diffs = (
        df.select(
            *keys,
            F.months_between(
                F.col(ts_col).cast("timestamp"),
                F.lag(F.col(ts_col).cast("timestamp")).over(w),
            ).alias("__mb"),
        )
        .filter(F.col("__mb").isNotNull())
        # months_between is integral exactly when both points share the
        # day-of-month (or are both end-of-month) — i.e. true month grid
        .withColumn(
            "__m",
            F.when(F.col("__mb") == F.round("__mb", 0), F.col("__mb").cast("int")),
        )
    )
    counted = diffs.groupBy(*keys, "__m").agg(F.count("*").alias("__n"))
    totals = counted.groupBy(*keys).agg(F.sum("__n").alias("__total"))
    best = counted.filter(F.col("__m").isNotNull()).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.desc("__n"), F.asc("__m"))
        ),
    ).filter(F.col("__rk") == 1)
    return (
        best.join(totals, on=list(keys))
        .select(
            *keys,
            F.when(
                F.col("__n") / F.col("__total") >= tolerance, F.col("__m")
            ).alias("freq_months"),
            (F.col("__n") / F.col("__total")).alias("modal_ratio"),
        )
    )


def infer_frequency(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tolerance: float = 0.5,
) -> DataFrame:
    """Modal spacing of consecutive timestamps per series (ref :727-767).

    Returns ``(keys…, freq_seconds: long, modal_ratio: double)``; series whose
    modal spacing covers < tolerance of the diffs get NULL freq_seconds (the
    reference returns a FrequencyInference error there).
    """
    w = _series_window(keys, ts_col)
    diffs = (
        df.select(
            *keys,
            (
                F.col(ts_col).cast("timestamp").cast("double")
                - F.lag(F.col(ts_col).cast("timestamp").cast("double")).over(w)
            ).alias("__diff"),
        )
        .filter(F.col("__diff").isNotNull())
    )
    counted = diffs.groupBy(*keys, "__diff").agg(F.count("*").alias("__n"))
    totals = counted.groupBy(*keys).agg(F.sum("__n").alias("__total"))
    best = counted.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.desc("__n"), F.asc("__diff"))
        ),
    ).filter(F.col("__rk") == 1)
    return (
        best.join(totals, on=list(keys))
        .select(
            *keys,
            F.when(
                F.col("__n") / F.col("__total") >= tolerance,
                F.col("__diff").cast("long"),
            ).alias("freq_seconds"),
            (F.col("__n") / F.col("__total")).alias("modal_ratio"),
        )
    )


def gapfill_dense(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    freq: str,
    method: str = "locf",
    fill_edges: bool = False,
) -> DataFrame:
    """Fused gap-fill: spine + fill in ONE pass (VERDICT r1 roadmap #9).

    ``fill_gaps → locf/interpolate_linear`` costs a groupBy (spine), a join,
    and a chain of window nodes over one sort. This variant does the whole
    job with one shuffle: repartition by series key, sort by ts, then a
    batched mapInPandas densifies each series onto the frequency grid and
    fills with vectorized numpy (LOCF via maximum.accumulate indexing,
    linear interpolation via np.interp). Output rows/values are identical
    to the unfused chain (checksum-equality tested).

    method: "none" (NULL gaps), "locf", or "interp". Seconds-based
    frequencies only (tiers are seconds-based; monthly spines go through
    fill_gaps, whose Spark `sequence` handles calendar months).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

    from anofox_forecast_spark.models.harness import batched_series_apply

    if method not in ("none", "locf", "interp"):
        raise ValueError(f"unknown method {method!r}")
    f = parse_frequency(freq)
    if f.kind != "duration":
        raise ValueError("gapfill_dense supports duration frequencies; use fill_gaps")
    step_us = f.seconds * 1_000_000

    keys_l = list(keys)
    vcols = list(value_cols)
    # value columns come back as DOUBLE (the numpy fill path is float64);
    # gap rows are NULL (NaN normalized JVM-side below)
    out_schema = StructType(
        [df.schema[k] for k in keys_l]
        + [df.schema[ts_col]]
        + [StructField(c, DoubleType()) for c in vcols]
        + [StructField("filled", BooleanType())]
    )

    def per_series(g: pd.DataFrame, out: dict) -> None:
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        # grid-alignment guard (ADVICE r2): an off-grid or duplicate
        # timestamp would silently floor onto the previous slot /
        # overwrite — diverging from the fill_gaps chain this function
        # claims checksum-equality with. Fail loudly instead.
        off = (ts - ts[0]) % step_us
        if off.any():
            key_repr = tuple(g[k].iloc[0] for k in keys_l)
            raise ValueError(
                f"gapfill_dense: series {key_repr} has timestamps off the "
                f"{step_us}µs grid (first at index {int(np.flatnonzero(off)[0])}); "
                "use fill_gaps for unaligned input"
            )
        n_dense = int((ts[-1] - ts[0]) // step_us) + 1
        grid = ts[0] + step_us * np.arange(n_dense)
        pos = (ts - ts[0]) // step_us  # observed rows' slots (validated above)
        if pos.size > 1:
            dpos = np.diff(pos)
            # Distinguish duplicates from merely-unsorted input (ADVICE r3):
            # the harness sorts within partitions, but a direct caller may
            # not, and a misleading "duplicate" message misdirects debugging.
            if (dpos == 0).any():
                key_repr = tuple(g[k].iloc[0] for k in keys_l)
                raise ValueError(
                    f"gapfill_dense: series {key_repr} has duplicate timestamps"
                )
            if (dpos < 0).any():
                key_repr = tuple(g[k].iloc[0] for k in keys_l)
                raise ValueError(
                    f"gapfill_dense: series {key_repr} has out-of-order "
                    "timestamps (input must be sorted ascending per series)"
                )
        observed = np.zeros(n_dense, dtype=bool)
        observed[pos] = True
        for k in keys_l:
            out[k].append(np.repeat(g[k].iloc[0], n_dense))
        out[ts_col].append(grid.astype("datetime64[us]"))
        out["filled"].append(~observed)
        for c in vcols:
            v = np.full(n_dense, np.nan)
            v[pos] = g[c].to_numpy(dtype=np.float64)
            if method == "locf":
                idx = np.where(~np.isnan(v), np.arange(n_dense), -1)
                idx = np.maximum.accumulate(idx)
                v = np.where(idx >= 0, v[np.maximum(idx, 0)], np.nan)
            elif method == "interp":
                valid = ~np.isnan(v)
                if valid.any():
                    xi = np.flatnonzero(valid)
                    v_new = np.interp(np.arange(n_dense), xi, v[xi])
                    if not fill_edges:  # np.interp clamps edges flat — undo
                        v_new[: xi[0]] = np.nan
                        v_new[xi[-1] + 1:] = np.nan
                    v = np.where(valid, v, v_new)
            out[c].append(v)

    out = batched_series_apply(df, keys_l, ts_col, per_series, out_schema)
    for c in vcols:
        out = out.withColumn(c, nan_to_null(F.col(c)))
    return out
