"""N vs 4N scaling-efficiency evidence (driver/BASELINE.md contract).

Runs the IDENTICAL pipeline job (jobs/pipeline_job.py) at local[8] and
local[32] via spark-submit --py-files (clean JVM each), computes
efficiency = (T_N / T_4N) / 4 per stage and overall, and writes
BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [--pages 1000000] [--n 8] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles() -> str:
    # Shared deterministic builder (ADVICE r3: stale-zip gate lives in
    # tests/test_dist_artifact.py; rebuilding here keeps runs current).
    sys.path.insert(0, REPO)
    from tools.build_dist import build_pyfiles as _build

    return _build()


def run_level(cores: int, pages: int, zpath: str, shuffle: int, hosts: int = 500) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "pipeline_job.py"),
        "--pages", str(pages),
        "--hosts", str(hosts),
        "--shuffle-partitions", str(shuffle),
        "--repeat", "2",
    ]
    # 2 cores × 48M pages with checksum-forced stages (r5: count() no
    # longer under-measures the window/gapfill work) runs past 30 min
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=5400)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--hosts", type=int, default=500)
    ap.add_argument("--n", type=int, default=8, help="small cluster size (4N = big)")
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    zpath = build_pyfiles()
    small = run_level(args.n, args.pages, zpath, args.shuffle_partitions, args.hosts)
    big = run_level(args.n * 4, args.pages, zpath, args.shuffle_partitions, args.hosts)

    stages = [k for k in small["timings"] if k != "synthesize"]
    rows = []
    for s in stages:
        t_n, t_4n = small["timings"][s], big["timings"][s]
        eff = (t_n / t_4n) / 4 if t_4n > 0 else float("nan")
        rows.append((s, t_n, t_4n, round(t_n / t_4n, 2), round(eff, 3)))
    total_n, total_4n = small["work_seconds"], big["work_seconds"]
    overall_eff = (total_n / total_4n) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE — N vs 4N scaling evidence",
        "",
        f"Identical `spark-submit --py-files` job (jobs/pipeline_job.py) on the",
        f"same synthetic input ({args.pages:,} pages, {small['counts']['raw']:,} rows"
        f" after gap-drop) at `local[{args.n}]` and `local[{args.n*4}]`;",
        f"shuffle partitions fixed at {args.shuffle_partitions}; clean JVM per run.",
        "Sandbox proxy for the two-cluster-size criterion (no real cluster),",
        "per the driver instruction in BASELINE.md.",
        "",
        f"| stage | T_N={args.n} (s) | T_4N={args.n*4} (s) | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for s, t_n, t_4n, sp, eff in rows:
        md.append(f"| {s} | {t_n} | {t_4n} | {sp}x | {eff} |")
    md += [
        f"| **total (excl. synthesize)** | **{total_n}** | **{total_4n}** |"
        f" **{round(total_n/total_4n,2)}x** | **{round(overall_eff,3)}** |",
        "",
        f"- rolled points/sec: {small['rolled_points_per_sec']:,} @N → "
        f"{big['rolled_points_per_sec']:,} @4N",
        f"- forecast series/sec: {small['forecast_series_per_sec']:,} @N → "
        f"{big['forecast_series_per_sec']:,} @4N",
        f"- target: efficiency ≥ 0.8 (BASELINE.json) — "
        f"{'MET' if overall_eff >= 0.8 else 'NOT MET'} at {round(overall_eff,3)}",
        "",
        "Raw JSON:",
        "```json",
        json.dumps({"N": small, "4N": big}, indent=2),
        "```",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {path}; overall efficiency={round(overall_eff,3)}")


if __name__ == "__main__":
    main()
