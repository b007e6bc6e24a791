"""Machine-ceiling probes for scaling-efficiency normalization.

Two Spark-free probes, each run at 2 and 8 concurrent PROCESSES:

* cpu   — pure-Python integer loop (cache-resident, no memory traffic):
          measures how much CPU the VM actually grants as processes grow.
* stream — numpy out-of-cache array sweep (read+write ~1 GB per pass):
          measures aggregate MEMORY BANDWIDTH scaling. Arrow transfers
          and vectorized numpy kernels (signature passes, bit-votes,
          bucket matmuls) are bandwidth-bound, so their 2→8-core ceiling
          is this number, not the CPU one.

Prints per-probe: T_2, T_8 (same total work), speedup, efficiency
(speedup/4). Used by BENCH/WEBTEXT_SCALING.md to separate engine scaling
from platform ceilings (same methodology as the r3 8→32 CPU probe).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _cpu_task(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _stream_task(passes: int) -> float:
    # 128M doubles = 1 GiB; touch all of it per pass (far beyond LLC)
    a = np.zeros(128 * 1024 * 1024 // 8, dtype=np.float64)
    for _ in range(passes):
        a += 1.0
    return float(a[0])


def run(task, total_work: int, procs: int) -> float:
    per = max(total_work // procs, 1)
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(task, [per] * procs)
    return time.perf_counter() - t0


def main() -> None:
    out = {}
    for name, task, work in (
        ("cpu", _cpu_task, 240_000_000),
        ("stream", _stream_task, 64),
    ):
        t2 = run(task, work, 2)
        t8 = run(task, work, 8)
        sp = t2 / t8
        out[name] = {"t2": round(t2, 2), "t8": round(t8, 2),
                     "speedup": round(sp, 2), "efficiency": round(sp / 4, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
