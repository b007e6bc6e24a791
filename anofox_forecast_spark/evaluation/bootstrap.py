"""Bootstrap prediction intervals (ref src/utils/bootstrap.rs:15-222).

Residual bootstrap: synthetic series = fitted + resampled residuals
(iid, or block resampling preserving autocorrelation) → refit → collect
the forecast distribution → quantile intervals. Defaults: 1000 samples,
seedable; seed is derived per series from a hash of the key so the whole
job is deterministic yet series-independent (engine addition — the
reference takes an explicit seed per call).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

from anofox_forecast_spark.models.harness import _grouped_apply
from anofox_forecast_spark.models.registry import get_model


def bootstrap_intervals_np(
    y: np.ndarray,
    kernel,
    horizon: int,
    season_length: int = 1,
    level: float = 0.95,
    n_samples: int = 200,
    block_size: int | None = None,
    seed: int = 42,
    **params,
) -> dict:
    """One series: returns yhat (point, from the real fit) + lo/hi quantiles."""
    base = kernel(y, horizon, level, season_length, **params)
    fitted, resid = base.fitted, base.residuals
    valid = np.isfinite(fitted) & np.isfinite(resid)
    if valid.sum() < 4:
        return {"yhat": base.yhat, "lo": base.lo, "hi": base.hi, "samples": 0}
    f, r = fitted[valid], resid[valid]
    rng = np.random.default_rng(seed)
    sims = np.empty((n_samples, horizon))
    n = f.size
    for s in range(n_samples):
        if block_size and block_size > 1:
            blocks = []
            while sum(b.size for b in blocks) < n:
                start = rng.integers(0, max(n - block_size, 1))
                blocks.append(r[start : start + block_size])
            res = np.concatenate(blocks)[:n]
        else:
            res = rng.choice(r, size=n, replace=True)
        synth = f + res
        try:
            sims[s] = kernel(synth, horizon, level, season_length, **params).yhat
        except Exception:
            sims[s] = np.nan
    alpha = (1.0 - level) / 2.0
    lo = np.nanquantile(sims, alpha, axis=0)
    hi = np.nanquantile(sims, 1.0 - alpha, axis=0)
    return {"yhat": base.yhat, "lo": lo, "hi": hi, "samples": n_samples}


def bootstrap_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    y_col: str,
    model: str,
    horizon: int,
    season_length: int = 1,
    level: float = 0.95,
    n_samples: int = 200,
    block_size: int | None = None,
    **params,
) -> DataFrame:
    """Per-series bootstrap intervals: (keys…, model, step, yhat, lo, hi)."""
    kernel = get_model(model)
    keys_l = list(keys)
    out_schema = StructType(
        [df.schema[k] for k in keys_l]
        + [StructField("model", StringType()),
           StructField("step", IntegerType()),
           StructField("yhat", DoubleType()),
           StructField("lo", DoubleType()),
           StructField("hi", DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        key_vals = {k: pdf[k].iloc[0] for k in keys_l}
        seed = abs(hash(tuple(key_vals.values()))) % (2**32)
        try:
            r = bootstrap_intervals_np(
                y, kernel, horizon, season_length, level,
                n_samples, block_size, seed, **params,
            )
        except Exception:
            return pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
        return pd.DataFrame(
            {
                **{k: np.repeat(v, horizon) for k, v in key_vals.items()},
                "model": model,
                "step": np.arange(1, horizon + 1, dtype=np.int32),
                "yhat": r["yhat"],
                "lo": r["lo"],
                "hi": r["hi"],
            }
        )

    return _grouped_apply(df, keys_l, fn, out_schema)
