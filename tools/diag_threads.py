"""One-off diagnostic: JVM CPU by THREAD ROLE at local[N].

The local[32] pipeline burns ~2.3x the JVM core-seconds of local[8]
for identical work (tools/diag_gc.py rules out GC). This splits the
JVM's utime/stime by thread name — executor task threads vs C2 JIT vs
GC vs shuffle/netty — by snapshotting /proc/<pid>/task/*/stat before
and after the timed pipeline run, so the inflation gets a face.

Usage: python tools/diag_threads.py [n_docs] [cores...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, re, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"thdiag_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
onto = make_ontology()
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
features = spark.read.parquet(cache + "/features")
warm_docs = min(400_000, max(20_000, n_docs // 10))
warm_dir = tempfile.mkdtemp(prefix=f"kg_warm_{{cores}}_", dir=shm)
try:
    build_kg_pipeline(spark, warm_dir, documents.limit(warm_docs), features.limit(warm_docs),
                      onto, make_model_weights(onto), make_thresholds(onto)).run()
finally:
    shutil.rmtree(warm_dir, ignore_errors=True)

GROUPS = [
    ("task", re.compile(r"Executor task")),
    ("gc", re.compile(r"GC Thread|G1 |Concurrent Mark")),
    ("jit", re.compile(r"C2 |C1 |Compiler")),
    ("shuffle", re.compile(r"shuffle|netty|rpc", re.I)),
    ("dispatcher", re.compile(r"dispatcher|dag-scheduler|task-result", re.I)),
]

def java_pids():
    out = []
    for pid in os.listdir('/proc'):
        if not pid.isdigit():
            continue
        try:
            with open(f'/proc/{{pid}}/comm') as f:
                if f.read().strip() == 'java':
                    out.append(pid)
        except OSError:
            pass
    return out

def thread_cpu():
    agg = {{}}
    tck = os.sysconf('SC_CLK_TCK')
    for pid in java_pids():
        tdir = f'/proc/{{pid}}/task'
        try:
            tids = os.listdir(tdir)
        except OSError:
            continue
        for tid in tids:
            try:
                with open(f'{{tdir}}/{{tid}}/stat') as f:
                    parts = f.read().rsplit(')', 1)
                comm = parts[0].split('(', 1)[1]
                v = parts[1].split()
                t = (int(v[11]) + int(v[12])) / tck
            except (OSError, IndexError, ValueError):
                continue
            g = 'other'
            for name, rx in GROUPS:
                if rx.search(comm):
                    g = name
                    break
            agg[g] = agg.get(g, 0.0) + t
    return agg

workdir = tempfile.mkdtemp(prefix=f"kg_th_{{cores}}_", dir=shm)
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    c0, t0 = thread_cpu(), time.monotonic()
    pipe.run()
    wall = time.monotonic() - t0
    c1 = thread_cpu()
finally:
    shutil.rmtree(workdir, ignore_errors=True)
delta = {{k: round(c1.get(k, 0) - c0.get(k, 0), 1) for k in set(c0) | set(c1)}}
print(json.dumps({{"cores": cores, "wall_sec": round(wall, 2),
                  "by_role_core_sec": delta}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
    if which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/tmp")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    levels = [int(c) for c in sys.argv[2:]] or [8, 32]
    for c in levels:
        print(json.dumps(run_level(c, n_docs)))


if __name__ == "__main__":
    main()
