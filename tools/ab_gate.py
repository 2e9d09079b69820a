"""A/B the linked-stage plan (dense score-all vs sparse pre-gate) at
two parallelism levels, interleaved, same cached input.

The dense plan shipped with the adaptive gate; three same-engine
campaigns then measured (8,32) raw efficiency ~0.45-0.47 vs 0.55 for
the pre-gate engine — this tool answers whether the plan choice (not
the box window) moved the number, by running both plans inside ONE
measurement window.

Usage: python tools/ab_gate.py [n_docs] [repeats] [cores...]
Defaults: 4000000 2 8 32.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = [int(c) for c in sys.argv[3:]] or [8, 32]
    bench_scaling.ensure_input(n_docs)
    plans = {"dense": "0.0", "sparse": "2.0"}
    results: dict[str, dict[int, list[float]]] = {
        p: {c: [] for c in cores} for p in plans
    }
    for rep in range(repeats):
        for plan, sel in plans.items():
            os.environ["CELLO_GATE_SELECTIVITY"] = sel
            for c in cores:
                r = bench_scaling.run_level(c, n_docs)
                results[plan][c].append(r["wall_sec"])
                print(
                    f"rep {rep + 1}/{repeats} {plan} local[{c}]: "
                    f"{r['wall_sec']:.1f}s",
                    flush=True,
                )
    out = {"n_docs": n_docs, "plans": {}}
    for plan in plans:
        best = {c: min(w) for c, w in results[plan].items()}
        entry: dict = {"best_wall": best, "runs": results[plan]}
        if len(cores) == 2:
            lo, hi = cores
            entry["speedup"] = round(best[lo] / best[hi], 3)
            entry["efficiency"] = round(best[lo] / best[hi] / (hi / lo), 3)
        out["plans"][plan] = entry
    print(json.dumps(out, indent=2))
    with open(os.path.join(bench_scaling.REPO, "BENCH", "ab_gate.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
