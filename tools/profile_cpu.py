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
    # (busy, system) jiffy totals over the first n per-core lines;
    # a system-time share that grows with cores points at the kernel
    # (tmpfs writes, page faults, futex), not user compute
    busy = sys_t = 0.0
    with open('/proc/stat') as f:
        for line in f:
            if line.startswith('cpu') and not line.startswith('cpu '):
                idx = int(line.split()[0][3:])
                if idx < n:
                    v = list(map(int, line.split()[1:]))
                    busy += sum(v) - v[3] - v[4]  # minus idle+iowait
                    sys_t += v[2] + v[5] + v[6]   # system+irq+softirq
    tck = os.sysconf('SC_CLK_TCK')
    return busy / tck, sys_t / tck


def proc_cpu():
    # split CPU between the JVM and the pyspark worker processes:
    # sum (utime+stime+cutime+cstime) per live process by comm. Dead
    # children are folded into the parent's cutime/cstime, so the JVM
    # row also absorbs exited workers. Driver pid excluded from
    # 'python' so the split is executor-side only.
    me = os.getpid()
    jvm = py = 0.0
    for pid in os.listdir('/proc'):
        if not pid.isdigit():
            continue
        try:
            with open('/proc/' + pid + '/stat') as f:
                parts = f.read().rsplit(')', 1)
            comm = parts[0].split('(', 1)[1]
            v = parts[1].split()
            t = (int(v[11]) + int(v[12]) + int(v[13]) + int(v[14]))
        except (OSError, IndexError, ValueError):
            continue
        if comm == 'java':
            jvm += t
        elif comm.startswith('python') and int(pid) != me:
            py += t
    tck = os.sysconf('SC_CLK_TCK')
    return jvm / tck, py / tck

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
    build_kg_pipeline(spark, warm_dir, documents.limit(warm_docs), features.limit(warm_docs),
                      onto, make_model_weights(onto), make_thresholds(onto)).run()
finally:
    shutil.rmtree(warm_dir, ignore_errors=True)

workdir = tempfile.mkdtemp(prefix=f"kg_cpu_{{cores}}_", dir=shm)
out = {{}}
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    # run stage-by-stage via stop_after to bracket each with cpu samples
    names = [s[0] for s in pipe.stages]
    ctx = {{}}
    prev_done = set()
    for name in names:
        (b0, s0), t0 = cpu_busy(cores), time.monotonic()
        j0, p0 = proc_cpu()
        pipe.run(stop_after=name)
        wall = time.monotonic() - t0
        b1, s1 = cpu_busy(cores)
        j1, p1 = proc_cpu()
        busy = b1 - b0
        out[name] = {{"wall": wall, "busy_core_sec": busy,
                     "util": busy / (wall * cores) if wall > 0 else None,
                     "sys_core_sec": s1 - s0,
                     "jvm_core_sec": j1 - j0, "py_core_sec": p1 - p0}}
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
        print(f"{'stage':<16}{'wall':>8}{'busy':>9}{'util':>7}"
              f"{'sys':>9}{'jvm':>9}{'py':>9}")
        for name, v in res[c]["stages"].items():
            u = f"{v['util']:.2f}" if v["util"] is not None else "-"
            print(f"{name:<16}{v['wall']:>8.2f}{v['busy_core_sec']:>9.1f}{u:>7}"
                  f"{v.get('sys_core_sec', 0):>9.1f}"
                  f"{v.get('jvm_core_sec', 0):>9.1f}{v.get('py_core_sec', 0):>9.1f}")
    with open(os.path.join(REPO, "BENCH", "cpu_profile.json"), "w") as f:
        json.dump({"n_docs": n_docs, "levels": res}, f, indent=2)


if __name__ == "__main__":
    main()
