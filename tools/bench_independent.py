"""Zero-coupling scale-out envelope: 4 INDEPENDENT pipelines vs 1.

The (8,32) scaling shortfall could live in two places: the Spark layer
(shuffle, driver round-trips, shared JVM) or the box itself (hypervisor
/ memory-subsystem contention that pure-ALU envelopes miss). This bench
separates them with the strongest possible control: run the SAME
pinned local[8] KG pipeline job as

  - phase A: ONE process on cores 0-7, and
  - phase B: FOUR concurrent processes on disjoint core sets
    (0-7 / 8-15 / 16-23 / 24-31), separate JVMs, separate Python
    workers, separate /dev/shm workdirs, no shared Spark state at all.

Phase B is literally "4N executors" with zero coupling — four
independent 8-core engines. If aggregate throughput scales ~4x, the
box can run 4x this workload and any local[32] shortfall is engine
structure; if it scales like the local[8]->local[32] ratio, the box's
envelope FOR THIS WORKLOAD SHAPE (allocation-heavy JVM + Arrow IPC,
not streaming ALU) is the ceiling, and raw local efficiency numbers
below it say nothing about a real cluster, where each executor owns
its cores, memory channels, and disks.

Guest steal time (/proc/stat field 8) is sampled around each phase:
steal that appears only in phase B is direct evidence the hypervisor
cannot actually schedule 32 busy vCPUs.

Heap note: children run with SPARK_DRIVER_MEM=12g (4 pre-touched 24g
heaps would not fit the box); both phases use the same 12g so the
comparison is apples-to-apples.

Usage: python tools/bench_independent.py [n_docs] [repeats]
Writes BENCH/independent.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import CHILD, ensure_input  # noqa: E402


def steal_sec() -> float:
    with open("/proc/stat") as f:
        v = f.readline().split()
    return int(v[8]) / os.sysconf("SC_CLK_TCK")


def launch(pin: str, n_docs: int) -> subprocess.Popen:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), "8", str(n_docs)]
    if which("taskset"):
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ, SPARK_DRIVER_MEM="12g")
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd="/tmp", env=env,
    )


def collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"child failed rc={proc.returncode}")
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def run_phase(pins: list[str], n_docs: int) -> dict:
    s0, t0 = steal_sec(), time.monotonic()
    procs = [launch(p, n_docs) for p in pins]
    results = [collect(p) for p in procs]
    wall = time.monotonic() - t0
    return {
        "jobs": len(pins),
        "walls": [r["wall_sec"] for r in results],
        "max_wall": max(r["wall_sec"] for r in results),
        "triples_per_job": results[0]["triples"],
        "aggregate_triples_per_sec": sum(
            r["triples"] for r in results
        ) / max(r["wall_sec"] for r in results),
        "steal_core_sec": steal_sec() - s0,
        "phase_wall": wall,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ensure_input(n_docs)
    one_runs, four_runs = [], []
    for _ in range(repeats):  # interleaved: box noise is one-sided
        one_runs.append(run_phase(["0-7"], n_docs))
        four_runs.append(run_phase(["0-7", "8-15", "16-23", "24-31"], n_docs))
    best1 = min(one_runs, key=lambda r: r["max_wall"])
    best4 = min(four_runs, key=lambda r: r["max_wall"])
    eff = best1["max_wall"] / best4["max_wall"]
    out = {
        "n_docs": n_docs,
        "one_job": {"runs": one_runs, "best": best1},
        "four_jobs": {"runs": four_runs, "best": best4},
        "aggregate_throughput_ratio": best4["aggregate_triples_per_sec"]
        / best1["aggregate_triples_per_sec"],
        "scaling_efficiency": eff,
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "BENCH", "independent.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
