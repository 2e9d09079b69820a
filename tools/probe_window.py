"""Cheap DRAM-window probe — decide whether NOW is a good window to
spend a full scaling rep.

The pipeline's 8→32 efficiency tracks the *bandwidth* envelope (the
numpy Dykstra probe), not the ALU one: the 2026-08-19 campaign rep ran
in an alu-0.93 window (quietest CPU ever observed) yet measured slow
walls at both levels because the numpy probe sat at 0.607 — a DRAM
co-tenant. So before burning ~10 min of box time on a rep, run ONE
short numpy probe at x8 and x32 (~30 s total) and gate on its 8→32
efficiency.

Usage:
    python tools/probe_window.py [threshold]
Prints the measured numpy 8→32 envelope; exits 0 if >= threshold
(default 0.68 — the golden-window reps that set the current bests
measured ~0.66-0.70 here), 1 otherwise. Compose:

    python tools/probe_window.py 0.68 && \
        python tools/bench_cpu_envelope.py && \
        python tools/bench_scaling.py 4000000 1 8,32 1,4 --merge --measure 8,32
"""

from __future__ import annotations

import subprocess
import sys

from bench_cpu_envelope import NUMPY, run_pinned  # noqa: E402


def probe() -> float:
    agg8 = run_pinned(NUMPY, 8)
    agg32 = run_pinned(NUMPY, 32)
    return agg32 / agg8 / 4.0


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.68
    # refuse to probe while another Spark job owns the box — a probe
    # under a running JVM reads the job's bandwidth use as co-tenancy
    jps = subprocess.run(
        ["pgrep", "-c", "-f", "org.apache.spark"], capture_output=True, text=True
    )
    if jps.stdout.strip() not in ("", "0"):
        print("probe_window: Spark is running on this box — aborting probe")
        raise SystemExit(2)
    eff = probe()
    verdict = "QUIET" if eff >= threshold else "noisy"
    print(f"numpy 8→32 window envelope: {eff:.3f} ({verdict}, threshold {threshold})")
    raise SystemExit(0 if eff >= threshold else 1)


if __name__ == "__main__":
    main()
