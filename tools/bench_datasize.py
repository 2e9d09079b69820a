"""Data-size scaling evidence: the same pipeline at fixed parallelism
over growing inputs. At 100 TB the question is not only "does 4x cores
give 4x speed" but "does 8x data cost 8x wall" — sublinear throughput
decay here would mean some per-job cost grows faster than the data
(driver state, closure size, skew amplification). Expected: flat
triples/sec across sizes (all per-doc work is partition-local; the
only global state is the dict-sized ontology broadcast).

Usage: python tools/bench_datasize.py [cores] [repeats] [sizes…]
Writes BENCH/datasize.json. Reuses bench_scaling's cached inputs and
its warmed, taskset-pinned child runner.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import REPO, ensure_input, run_level  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sizes = [int(x) for x in sys.argv[3:]] or [1_000_000, 4_000_000, 8_000_000]
    for n in sizes:
        ensure_input(n)
    results: dict[int, list[dict]] = {n: [] for n in sizes}
    for rep in range(repeats):
        for n in sizes:  # interleaved across sizes, like bench_scaling
            r = run_level(cores, n)
            results[n].append(r)
            print(
                f"rep {rep + 1}/{repeats} n_docs={n}: "
                f"{r['wall_sec']:.1f}s ({r['triples_per_sec']:.0f} tps)",
                flush=True,
            )
    best = {n: min(rs, key=lambda r: r["wall_sec"]) for n, rs in results.items()}
    base_tps = best[sizes[0]]["triples_per_sec"]
    summary = {
        "cores": cores,
        "sizes": {
            str(n): {
                "best": best[n],
                "runs": results[n],
                "throughput_vs_smallest": round(
                    best[n]["triples_per_sec"] / base_tps, 3
                ),
            }
            for n in sizes
        },
    }
    with open(os.path.join(REPO, "BENCH", "datasize.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(
        json.dumps(
            {
                str(n): {
                    "wall_sec": round(best[n]["wall_sec"], 1),
                    "tps": round(best[n]["triples_per_sec"]),
                    "vs_smallest": round(
                        best[n]["triples_per_sec"] / base_tps, 3
                    ),
                }
                for n in sizes
            }
        )
    )


if __name__ == "__main__":
    main()
