"""DRAM-bandwidth microbenchmark — the auditable evidence behind
BENCH/BASELINE.md's "memory wall" section. Measures aggregate copy
bandwidth (numpy memcpy of a buffer far larger than LLC) at increasing
process counts, each process taskset-pinned to its own CPU.

Usage: python tools/bench_membw.py [out_json]
Writes BENCH/membw.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import numpy as np
n_mb = 256
a = np.ones(n_mb * 1024 * 1024 // 8, dtype=np.float64)
b = np.empty_like(a)
# warm
np.copyto(b, a)
best = 0.0
for _ in range(5):
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    # copy reads+writes: count 2x bytes moved
    gbps = 2 * reps * n_mb / 1024 / dt
    best = max(best, gbps)
print(best)
"""


def run_streams(n: int) -> float:
    procs = []
    for i in range(n):
        cmd = ["taskset", "-c", str(i), sys.executable, "-c", CHILD]
        procs.append(
            subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate()
        total += float(out.strip().splitlines()[-1])
    return total


def main() -> None:
    results = {}
    for n in (1, 2, 4, 8, 16, 32):
        results[n] = round(run_streams(n), 2)
        print(f"{n} pinned streams: {results[n]:.2f} GB/s aggregate", flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "membw.json"), "w") as f:
        json.dump(
            {"buffer_mb_per_stream": 256, "aggregate_gbps": results}, f, indent=2
        )
    print("\n| streams | aggregate GB/s |")
    print("|---|---|")
    for n, v in results.items():
        print(f"| {n} | {v} |")


if __name__ == "__main__":
    main()
