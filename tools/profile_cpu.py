"""Per-stage CPU-utilization profile of the KG pipeline.

For each stage, samples /proc/stat on the taskset-pinned cores before
and after, and reports busy-core-seconds / (wall * cores): a stage at
~1.0 is compute-bound (loss = hardware contention); a stage well below
1.0 has idle cores (loss = waves/serial driver work/scheduling).

Usage: python tools/profile_cpu.py [n_docs] [cores...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])

def cpu_busy(n):
    # sum busy jiffies over the first n per-core lines
    busy = 0.0
    with open('/proc/stat') as f:
        for line in f:
            if line.startswith('cpu') and not line.startswith('cpu '):
                idx = int(line.split()[0][3:])
                if idx < n:
                    v = list(map(int, line.split()[1:]))
                    busy += sum(v) - v[3] - v[4]  # minus idle+iowait
    return busy / os.sysconf('SC_CLK_TCK')

shm = "/dev/shm/kg_prof"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"cpuprof_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
onto = make_ontology()
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
features = spark.read.parquet(cache + "/features")
warm_docs = min(400_000, max(20_000, n_docs // 10))
warm_dir = tempfile.mkdtemp(prefix=f"kg_warm_{{cores}}_", dir=shm)
try:
    build_kg_pipeline(spark, warm_dir, documents.limit(warm_docs), features,
                      onto, make_model_weights(onto), make_thresholds(onto)).run()
finally:
    shutil.rmtree(warm_dir, ignore_errors=True)

workdir = tempfile.mkdtemp(prefix=f"kg_cpu_{{cores}}_", dir=shm)
out = {{}}
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    # run stage-by-stage via stop_after to bracket each with cpu samples
    names = [n for n, _, tiny in pipe.stages]
    ctx = {{}}
    prev_done = set()
    for name in names:
        b0, t0 = cpu_busy(cores), time.monotonic()
        pipe.run(stop_after=name)
        wall = time.monotonic() - t0
        busy = cpu_busy(cores) - b0
        out[name] = {{"wall": wall, "busy_core_sec": busy,
                     "util": busy / (wall * cores) if wall > 0 else None}}
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"cores": cores, "stages": out}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
    if which("taskset"):
        cpu_list = "0" if cores == 1 else f"0-{cores - 1}"
        cmd = ["taskset", "-c", cpu_list] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/tmp")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    levels = [int(c) for c in sys.argv[2:]] or [8, 32]
    res = {c: run_level(c, n_docs) for c in levels}
    for c in levels:
        print(f"\n== local[{c}] ==")
        print(f"{'stage':<16}{'wall':>8}{'busy':>9}{'util':>7}")
        for name, v in res[c]["stages"].items():
            u = f"{v['util']:.2f}" if v["util"] is not None else "-"
            print(f"{name:<16}{v['wall']:>8.2f}{v['busy_core_sec']:>9.1f}{u:>7}")
    with open(os.path.join(REPO, "BENCH", "cpu_profile.json"), "w") as f:
        json.dump({"n_docs": n_docs, "levels": res}, f, indent=2)


if __name__ == "__main__":
    main()
