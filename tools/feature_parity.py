"""Per-feature parity vs the reference's exported feature values.

The reference exports every tsfresh-style feature it implements for the 11
validation series (/root/reference/validation/results/rust/features.csv,
names like ``value__autocorrelation__lag_1``). This tool maps each name to
our numpy feature kernel (features/np_features.py), evaluates it on the
bit-identical corpus, and prints per-feature max |diff| across series.

Shared by tests/test_feature_parity.py. Usage:
    python tools/feature_parity.py           # full table
    python tools/feature_parity.py --bad     # only features over 1e-8
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict

import numpy as np

from anofox_forecast_spark.features import np_features as NF
from anofox_forecast_spark.sources.validation_corpus import generate_corpus

CSV_PATH = "/root/reference/validation/results/rust/features.csv"


def _parse(name: str) -> tuple[str, dict]:
    """'value__agg_linear_trend__attr_"slope"__chunk_len_10__f_agg_"mean"'
    -> ('agg_linear_trend', {'attr': 'slope', 'chunk_len': 10, 'f_agg': 'mean'})
    """
    toks = name.split("__")
    assert toks[0] == "value"
    fname = toks[1]
    params: dict = {}
    for tok in toks[2:]:
        key, val = tok.rsplit("_", 1)
        if val.startswith('"') and val.endswith('"'):
            v = val.strip('"')
        else:
            try:
                v = int(val)
            except ValueError:
                try:
                    v = float(val)
                except ValueError:
                    v = {"True": True, "False": False}.get(val, val)
        params[key] = v
    return fname, params


def evaluate(fname: str, p: dict, y: np.ndarray) -> float:
    """Dispatch a parsed feature name to our kernel."""
    simple = {
        "mean", "variance", "standard_deviation", "median", "maximum",
        "minimum", "abs_energy", "absolute_maximum",
        "absolute_sum_of_changes", "length", "mean_abs_change",
        "mean_change", "mean_second_derivative_central", "root_mean_square",
        "sum_values", "skewness", "kurtosis", "variation_coefficient",
        "variance_larger_than_standard_deviation", "sample_entropy",
        "count_above_mean", "count_below_mean", "longest_strike_above_mean",
        "longest_strike_below_mean", "first_location_of_maximum",
        "first_location_of_minimum", "last_location_of_maximum",
        "last_location_of_minimum", "has_duplicate", "has_duplicate_max",
        "has_duplicate_min",
        "percentage_of_reoccurring_datapoints_to_all_datapoints",
        "percentage_of_reoccurring_values_to_all_values",
        "ratio_value_number_to_time_series_length",
        "sum_of_reoccurring_data_points", "sum_of_reoccurring_values",
    }
    if fname in simple:
        return float(getattr(NF, fname)(y))
    if fname == "cid_ce":
        return float(NF.cid_ce(y, normalize=p["normalize"]))
    if fname == "c3":
        return float(NF.c3(y, lag=p["lag"]))
    if fname == "autocorrelation":
        return float(NF.autocorrelation(y, lag=p["lag"]))
    if fname == "partial_autocorrelation":
        return float(NF.partial_autocorrelation(y, lag=p["lag"]))
    if fname == "agg_autocorrelation":
        return float(NF.agg_autocorrelation(y, max_lag=p["maxlag"], agg=p["f_agg"]))
    if fname == "time_reversal_asymmetry_statistic":
        return float(NF.time_reversal_asymmetry_statistic(y, lag=p["lag"]))
    if fname == "quantile":
        return float(NF.quantile(y, q=p["q"]))
    if fname == "index_mass_quantile":
        return float(NF.index_mass_quantile(y, q=p["q"]))
    if fname == "large_standard_deviation":
        return float(NF.large_standard_deviation(y, r=p["r"]))
    if fname == "symmetry_looking":
        return float(NF.symmetry_looking(y, r=p["r"]))
    if fname == "ratio_beyond_r_sigma":
        return float(NF.ratio_beyond_r_sigma(y, r=p["r"]))
    if fname == "binned_entropy":
        return float(NF.binned_entropy(y, max_bins=p["max_bins"]))
    if fname == "approximate_entropy":
        return float(NF.approximate_entropy(y, m=p["m"], r=p["r"] * float(np.std(y))))
    if fname == "permutation_entropy":
        return float(NF.permutation_entropy(y, order=p["dimension"], delay=p["tau"]))
    if fname == "lempel_ziv_complexity":
        return float(NF.lempel_ziv_complexity(y, bins=p["bins"]))
    if fname == "linear_trend":
        return float(NF.linear_trend(y, attribute=p["attr"]))
    if fname == "agg_linear_trend":
        return float(
            NF.agg_linear_trend(y, chunk_len=p["chunk_len"], agg=p["f_agg"],
                                attribute=p["attr"])
        )
    if fname == "ar_coefficient":
        return float(NF.ar_coefficient(y, k=p["k"], coeff=p["coeff"]))
    if fname == "augmented_dickey_fuller":
        # ref trend.rs:452 is the plain DF regression (no lagged diffs)
        return float(NF.augmented_dickey_fuller(y, attribute=p["attr"], max_lag=0))
    if fname == "number_peaks":
        return float(NF.number_peaks(y, support=p["n"]))
    if fname == "number_crossing_m":
        return float(NF.number_crossing_m(y, m=float(p["m"])))
    if fname == "mean_n_absolute_max":
        return float(NF.mean_n_absolute_max(y, n=p["number_of_maxima"]))
    if fname == "value_count":
        return float(NF.value_count(y, value=float(p["value"])))
    if fname == "range_count":
        return float(NF.range_count(y, lo=float(p["min"]), hi=float(p["max"])))
    if fname == "change_quantiles":
        return float(
            NF.change_quantiles(y, q_low=p["ql"], q_high=p["qh"],
                                is_abs=p["isabs"], agg=p["f_agg"])
        )
    if fname == "energy_ratio_by_chunks":
        return float(
            NF.energy_ratio_by_chunks(y, n_chunks=p["num_segments"],
                                      chunk_index=p["segment_focus"])
        )
    raise KeyError(fname)


def load_oracle() -> dict[tuple[str, str], float]:
    out = {}
    with open(CSV_PATH) as f:
        for r in csv.DictReader(f):
            out[(r["series_type"], r["feature_name"])] = float(r["value"])
    return out


def run() -> dict[str, dict]:
    oracle = load_oracle()
    corpus = generate_corpus()
    per_feature: dict[str, dict] = defaultdict(lambda: {"max": 0.0, "n": 0, "err": None})
    for (series, feat), ref in oracle.items():
        y = corpus[series]
        rec = per_feature[feat]
        try:
            fname, params = _parse(feat)
            got = evaluate(fname, params, y)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            continue
        if np.isnan(ref) and np.isnan(got):
            d = 0.0
        else:
            scale = max(1.0, abs(ref))
            d = abs(got - ref) / scale  # relative above 1, absolute below
        rec["max"] = max(rec["max"], d)
        rec["n"] += 1
    return dict(per_feature)


def main() -> None:
    bad_only = "--bad" in sys.argv
    res = run()
    worst = sorted(res.items(), key=lambda kv: -(kv[1]["max"]))
    for feat, rec in worst:
        if rec["err"]:
            print(f"{feat:<70} ERR {rec['err']}")
        elif not bad_only or rec["max"] > 1e-8:
            print(f"{feat:<70} max={rec['max']:.3g} (n={rec['n']})")
    n_ok = sum(1 for r in res.values() if not r["err"] and r["max"] <= 1e-8)
    print(f"\n{n_ok}/{len(res)} features within 1e-8 of the reference")


if __name__ == "__main__":
    main()
