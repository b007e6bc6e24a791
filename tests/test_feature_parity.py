"""Feature parity gate vs the reference's exported feature values.

Runs every tsfresh-style feature in
/root/reference/validation/results/rust/features.csv (110 distinct
feature configs × 11 series) through our numpy kernels and enforces
max |diff| ≤ 1e-8 (relative above magnitude 1) on ALL 110 configs —
linear_trend pvalue joined the exact tier in round 3 when _normal_cdf
switched to the reference's own A&S 7.1.26 erf approximation.
See tools/feature_parity.py for the name→kernel mapping.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import feature_parity as FP  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(FP.CSV_PATH), reason="no reference feature CSV"
)

LOOSE: dict[str, float] = {}


def test_feature_parity():
    res = FP.run()
    assert len(res) >= 100, f"only {len(res)} features found"
    failures = {}
    for feat, rec in res.items():
        if rec["err"]:
            failures[feat] = rec["err"]
            continue
        ceiling = LOOSE.get(feat, 1e-8)
        if rec["max"] > ceiling:
            failures[feat] = f"max diff {rec['max']:.3g} > {ceiling}"
    assert not failures, failures
