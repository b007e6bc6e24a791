"""Gate: dist/anofox_forecast_spark.zip must match the CURRENT package tree.

ADVICE r3 (high): a stale --py-files zip silently ships old executor code,
reverting correctness fixes in deployed jobs. This test byte-compares every
member of the committed artifact against the source tree, and fails on
missing or extra members, so a stale artifact can never survive the test
gate. Regenerate with `python tools/build_dist.py`.
"""

from __future__ import annotations

import os
import zipfile

import pytest

from tools.build_dist import REPO, package_py_files

ZPATH = os.path.join(REPO, "dist", "anofox_forecast_spark.zip")


def test_artifact_exists():
    assert os.path.exists(ZPATH), "dist zip missing — run python tools/build_dist.py"


def test_artifact_matches_tree_byte_for_byte():
    expected = {rel.replace(os.sep, "/") for rel in package_py_files()}
    with zipfile.ZipFile(ZPATH) as z:
        members = {n for n in z.namelist() if not n.endswith("/")}
        missing = expected - members
        extra = members - expected
        assert not missing, f"zip is stale — missing {sorted(missing)[:5]}"
        assert not extra, f"zip has orphan members {sorted(extra)[:5]}"
        stale = []
        for rel in sorted(expected):
            with open(os.path.join(REPO, rel), "rb") as fh:
                if z.read(rel) != fh.read():
                    stale.append(rel)
        assert not stale, (
            f"zip content differs from tree for {stale[:10]} — "
            "run python tools/build_dist.py"
        )
