"""One-off diagnostic: poor-man's profiler for the local[32] inflation.

Launches the KG pipeline at local[N] in a child and, while it runs,
samples `jstack` every ~0.4s. Aggregates the top frames of RUNNABLE
"Executor task launch worker" threads into a histogram — whatever the
2.3x task-thread CPU inflation is doing, it will dominate the samples.

Usage: python tools/diag_stacks.py [n_docs] [cores] [depth]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from collections import Counter
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JSTACK = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "jstack")

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"stkdiag_{{cores}}", cores=cores,
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
print("WARMED", flush=True)
workdir = tempfile.mkdtemp(prefix=f"kg_stk_{{cores}}_", dir=shm)
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    t0 = time.monotonic()
    pipe.run()
    print(json.dumps({{"cores": cores, "wall_sec": time.monotonic() - t0}}),
          flush=True)
finally:
    shutil.rmtree(workdir, ignore_errors=True)
spark.stop()
"""


def java_pid(child_pid: int) -> int | None:
    # find the java process whose ancestor is the child
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
            if ppid == child_pid:
                return int(pid)
        except (OSError, ValueError):
            continue
    return None


def sample(pid: int, hist: Counter, depth: int) -> None:
    try:
        out = subprocess.run(
            [JSTACK, str(pid)], capture_output=True, text=True, timeout=10
        ).stdout
    except subprocess.TimeoutExpired:
        return
    cur_is_task = runnable = False
    frames: list[str] = []
    for line in out.splitlines():
        if line.startswith('"'):
            if cur_is_task and runnable and frames:
                hist[" <- ".join(frames[:depth])] += 1
            cur_is_task = "Executor task launch worker" in line
            runnable = False
            frames = []
        elif "java.lang.Thread.State: RUNNABLE" in line:
            runnable = True
        elif line.strip().startswith("at ") and len(frames) < depth:
            frames.append(line.strip()[3:].split("(")[0])
    if cur_is_task and runnable and frames:
        hist[" <- ".join(frames[:depth])] += 1


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
    if which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd="/tmp"
    )
    # wait for warmup to finish so samples cover only the timed run
    assert proc.stdout is not None
    for line in proc.stdout:
        if line.startswith("WARMED"):
            break
    pid = java_pid(proc.pid)
    hist: Counter = Counter()
    while proc.poll() is None:
        if pid is None:
            pid = java_pid(proc.pid)
        if pid is not None:
            sample(pid, hist, depth)
        time.sleep(0.2)
    total = sum(hist.values())
    print(f"samples(thread-state snapshots): {total}")
    for frame, n in hist.most_common(25):
        print(f"{n:6d} {n / max(total, 1) * 100:5.1f}%  {frame}")


if __name__ == "__main__":
    main()
