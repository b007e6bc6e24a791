"""As-of (backward, inclusive) join — the canonical time-series join:
for every left row, attach the LATEST right row with right.ts ≤ left.ts
within the same key group.

No reference counterpart (the Rust library is single-series); this is the
engine-level operator a TimescaleDB/kdb-class rollup store needs, e.g.
"attach the most recent daily aggregate to every hourly point".

Scale design — union + window LOCF, NOT a range join:
  tag both sides → union → ONE hash-partition exchange on the keys →
  sort by (ts, side) → `last(value, ignorenulls=True)` carry-forward
  window → keep left rows. Cost is one shuffle of |L|+|R| rows and a
  sorted window pass; a naive `l.ts >= r.ts` range join explodes to
  |L|·|R| pairs per key before aggregation, which Catalyst plans as
  BroadcastNestedLoop/cartesian-per-key — unusable at 100 TB. Right rows
  sort BEFORE left rows at equal ts so ties match (inclusive ≤), matching
  DuckDB's ASOF JOIN semantics (the driver oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: left columns + ``<right_col><suffix>`` columns
    holding the most recent right values at-or-before each left row's
    timestamp (NULL when no right row precedes it)."""
    keys = list(keys)
    left_cols = [c for c in left.columns if c not in keys and c != ts_col]
    lt = left.select(
        *keys,
        F.col(ts_col),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(1).alias("__side"),
    )
    rt = right.select(
        *keys,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.lit(0).alias("__side"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = lt.unionByName(rt)
    for c in right_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    return filled.filter(F.col("__side") == 1).select(
        *keys, ts_col, *left_cols, *[f"{c}{suffix}" for c in right_cols]
    )
