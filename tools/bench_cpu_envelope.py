"""CPU-envelope microbenchmark — how much N→4N scaling this box can
physically deliver, independent of Spark. Two probes, each run as P
taskset-pinned processes (one per CPU):

- alu:   a pure-Python arithmetic loop (no memory traffic) — the
         upper bound the hypervisor's CPU scheduling allows.
- numpy: the engine's own Dykstra projection kernel on a task-sized
         batch (12.5k rows x 60 labels) — the realistic mixed
         compute/memory envelope for the linking stage.

For each probe and each P in (1, 8, 16, 32) we report aggregate
throughput (work-units/sec) and the implied 8→32 scaling efficiency.
The pipeline's measured efficiency should be read against these
ceilings: a virtualized box that caps pure processes at X cannot
yield more than X from any Spark job.

Usage: python tools/bench_cpu_envelope.py
Writes BENCH/cpu_envelope.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALU = r"""
import time
t0 = time.perf_counter()
x = 1.0
for i in range(20_000_000):
    x = x * 1.0000001 + 1e-9
print(time.perf_counter() - t0)
"""

NUMPY = r"""
import sys, time
import numpy as np
sys.path.insert(0, %r)
from cello_spark.functions.hierarchy import dykstra_matrix
rng = np.random.default_rng(0)
P = rng.random((12500, 60))
edges = np.array([(i // 2, i) for i in range(2, 60)], dtype=np.int64).reshape(-1, 2)
t0 = time.perf_counter()
for _ in range(3):
    dykstra_matrix(P, edges)
print((time.perf_counter() - t0) / 3)
""" % (REPO,)


def run_pinned(code: str, n: int) -> float:
    """Aggregate throughput (work-units/sec) of n pinned processes;
    the slowest process defines the wall (as in a Spark task wave)."""
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(n)
    ]
    times = [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
    return n / max(times)


def monotone_consistent(agg: dict[int, float], tol: float = 1.10) -> bool:
    """A valid envelope measurement cannot scale SUPERlinearly: aggregate
    throughput at P_hi greater than (P_hi/P_lo) x the P_lo aggregate
    means the low-P leg itself ran contended, so any efficiency derived
    from it is an artifact, not a ceiling.  Flag such windows so the
    range report can exclude them (observed once: numpy x8=31.1 but
    x16=96.4 — the x8 leg hit a co-tenant burst, yielding a bogus 0.99
    '8→32 ceiling')."""
    levels = sorted(agg)
    return all(
        agg[hi] <= agg[lo] * (hi / lo) * tol
        for lo, hi in zip(levels, levels[1:])
    )


def main() -> None:
    out: dict[str, dict] = {}
    for name, code in (("alu", ALU), ("numpy_dykstra", NUMPY)):
        agg = {}
        for n in (1, 4, 8, 16, 32):
            agg[n] = round(run_pinned(code, n), 3)
            print(f"{name} x{n}: {agg[n]:.2f} units/s aggregate", flush=True)
        eff = agg[32] / agg[8] / 4.0
        eff14 = agg[4] / agg[1] / 4.0
        out[name] = {
            "aggregate_per_sec": agg,
            "eff_8_to_32": round(eff, 3),
            "eff_1_to_4": round(eff14, 3),
            "consistent": monotone_consistent(agg),
        }
        print(f"{name} 8→32 envelope efficiency: {eff:.3f}")
        print(f"{name} 1→4 envelope efficiency: {eff14:.3f}")
        if not out[name]["consistent"]:
            print(
                f"{name}: WARNING superlinear step between process counts "
                f"— window inconsistent, efficiencies unreliable"
            )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cpu_envelope.json"), "w") as f:
        json.dump(out, f, indent=2)
    # the envelope itself swings window-to-window (alu 8→32 observed
    # 0.63-0.85 across days on this box) — append every measurement so
    # the reported range is auditable, not just the latest sample
    import time as _time

    hist = {
        "ts": int(_time.time()),
        "alu_eff_8_to_32": out["alu"]["eff_8_to_32"],
        "alu_eff_1_to_4": out["alu"]["eff_1_to_4"],
        "numpy_eff_8_to_32": out["numpy_dykstra"]["eff_8_to_32"],
        "alu_consistent": out["alu"]["consistent"],
        "numpy_consistent": out["numpy_dykstra"]["consistent"],
    }
    with open(os.path.join(REPO, "BENCH", "envelope_history.jsonl"), "a") as f:
        f.write(json.dumps(hist) + "\n")
    print("\n| probe | 1 | 4 | 8 | 16 | 32 | eff(1→4) | eff(8→32) |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in out.items():
        a = r["aggregate_per_sec"]
        print(
            f"| {name} | {a[1]} | {a[4]} | {a[8]} | {a[16]} | {a[32]} "
            f"| {r['eff_1_to_4']} | {r['eff_8_to_32']} |"
        )


if __name__ == "__main__":
    main()
