"""Focused N vs 4N pair for stages added AFTER a full scaling run —
same protocol as tools/bench_scaling_webtext.py (clean JVM per level,
interleaved attempts, per-stage MIN) but over a --stages subset, and
writes an ADDENDUM section appended to BENCH/WEBTEXT_SCALING.md
instead of rewriting the 14-stage report (those numbers came from a
different exclusive run; mixing them into one table would misstate
the measurement conditions).

Usage: python tools/bench_scaling_addendum.py \
    --stages clf_fit,clf_score,strat_sample,export_manifest \
    --docs 2000000 --vecs 1000 --n 2 --attempts 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling_webtext import run_level  # noqa: E402
from tools.build_dist import build_pyfiles  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", required=True)
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--vecs", type=int, default=1_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--attempts", type=int, default=2)
    args = ap.parse_args()
    stages = args.stages.split(",")

    zpath = build_pyfiles()
    attempts: dict[int, list[dict]] = {args.n: [], args.n * 4: []}
    for _ in range(max(args.attempts, 1)):
        for cores in (args.n, args.n * 4):
            attempts[cores].append(
                run_level(cores, args.docs, args.vecs, zpath,
                          args.shuffle_partitions, stages=stages))

    def best(cores: int) -> dict:
        runs = attempts[cores]
        return {s: min(r["timings"][s] for r in runs) for s in stages}

    small, big = best(args.n), best(args.n * 4)
    raw = {"N": attempts[args.n], "4N": attempts[args.n * 4]}
    with open(os.path.join(REPO, "BENCH", "webtext_scaling_addendum_raw.json"),
              "w") as f:
        json.dump(raw, f, indent=2)

    lines = [
        "",
        "## Addendum: stages added after the 14-stage run "
        f"({args.docs:,} docs, local[{args.n}] vs local[{args.n * 4}], "
        f"min of {args.attempts} interleaved attempts, same exclusive "
        "protocol — separate run, so times are not comparable to the "
        "table above)",
        "",
        "| stage | T_N (s) | T_4N (s) | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    tot_n = tot_4n = 0.0
    for s in stages:
        t_n, t_4n = small[s], big[s]
        tot_n += t_n
        tot_4n += t_4n
        lines.append(f"| {s} | {t_n} | {t_4n} | {t_n / t_4n:.2f}x | "
                     f"{t_n / t_4n / 4:.3f} |")
    lines.append(f"| **total** | **{tot_n:.3f}** | **{tot_4n:.3f}** | "
                 f"**{tot_n / tot_4n:.2f}x** | **{tot_n / tot_4n / 4:.3f}** |")
    lines.append("")
    lines.append("Raw attempts: `BENCH/webtext_scaling_addendum_raw.json`.")
    path = os.path.join(REPO, "BENCH", "WEBTEXT_SCALING.md")
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended addendum to {path}; "
          f"overall eff={tot_n / tot_4n / 4:.3f}")


if __name__ == "__main__":
    main()
