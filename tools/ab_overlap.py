"""Same-window A/B: DAG-parallel stage overlap vs sequential stages.

Interleaves [seq, overlap] x levels within one campaign window (box
noise is one-sided; interleaving spreads contention episodes across
variants) and reports best-of-N walls per (variant, level).

Usage: python tools/ab_overlap.py [n_docs] [reps] [levels...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)
cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_bench"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"abov_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
onto = make_ontology()
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
features = spark.read.parquet(cache + "/features")
w, t = make_model_weights(onto), make_thresholds(onto)
wu = min(max(20_000, n_docs // 10), 400_000)
wdir = tempfile.mkdtemp(prefix=f"abov_wu_{{cores}}_", dir=shm)
build_kg_pipeline(spark, wdir, documents.limit(wu), features.limit(wu),
                  onto, w, t).run()
shutil.rmtree(wdir, ignore_errors=True)
rdir = tempfile.mkdtemp(prefix=f"abov_r_{{cores}}_", dir=shm)
t0 = time.monotonic()
pipe = build_kg_pipeline(spark, rdir, documents, features, onto, w, t)
pipe.run()
n = pipe.output("triples").count()
wall = time.monotonic() - t0
print(f"CHILD_RESULT {{wall:.2f}} {{n}}", flush=True)
shutil.rmtree(rdir, ignore_errors=True)
spark.stop()
"""


def run_one(cores: int, n_docs: int, overlap: bool) -> float:
    env = dict(os.environ)
    env["CELLO_STAGE_OVERLAP"] = "1" if overlap else "0"
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
    if which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd="/tmp", env=env)
    line = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RESULT")][-1]
    return float(line.split()[1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = [int(c) for c in sys.argv[3:]] or [8, 32]
    best: dict[tuple[str, int], float] = {}
    for rep in range(reps):
        for cores in levels:
            for name, ov in (("seq", False), ("overlap", True)):
                w = run_one(cores, n_docs, ov)
                key = (name, cores)
                best[key] = min(best.get(key, 1e18), w)
                print(f"rep {rep + 1}/{reps} {name} local[{cores}]: {w:.1f}s "
                      f"(best {best[key]:.1f})", flush=True)
    out = {f"{k[0]}_{k[1]}": round(v, 2) for k, v in best.items()}
    for cores in levels:
        s, o = best[("seq", cores)], best[("overlap", cores)]
        out[f"overlap_speedup_{cores}"] = round(s / o, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
