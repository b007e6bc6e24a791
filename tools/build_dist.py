"""Deterministic --py-files artifact builder (ADVICE r3 high fix).

Builds dist/anofox_forecast_spark.zip from the CURRENT package tree with
fixed timestamps and sorted member order, so the same tree always yields
the same bytes and a stale artifact can be detected by byte-comparison
(tests/test_dist_artifact.py). spark-submit jobs (jobs/pipeline_job.py,
tools/bench_scaling.py) ship this zip to executors — a stale zip silently
reverts fixes on the executor side, which is exactly what ADVICE r3
caught; the test gate makes that impossible to commit.

Usage: python tools/build_dist.py  (or import build_pyfiles()).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Fixed DOS timestamp (2020-01-01 00:00:00) => byte-stable archives.
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def package_py_files() -> list[str]:
    """Sorted repo-relative paths of every .py in the package."""
    pkg = os.path.join(REPO, "anofox_forecast_spark")
    out: list[str] = []
    for root, dirs, files in os.walk(pkg):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".py") and "__pycache__" not in root:
                out.append(os.path.relpath(os.path.join(root, f), REPO))
    return out


def build_pyfiles() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "anofox_forecast_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in package_py_files():
            with open(os.path.join(REPO, rel), "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return zpath


if __name__ == "__main__":
    print(build_pyfiles())
