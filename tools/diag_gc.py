"""One-off diagnostic: GC time share of the KG pipeline at local[N].

Runs the pipeline once per level with -Xlog:gc and parses total young/
full collections, GC wall, and (from /proc) JVM utime+stime, to answer:
how much of the local[32] core-second inflation is garbage collection?

Usage: python tools/diag_gc.py [n_docs] [cores...] [-- extra JVM opts]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); gclog = sys.argv[3]
extra_jvm = sys.argv[4] if len(sys.argv) > 4 else ""
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
mem = os.environ.get("SPARK_DRIVER_MEM", "24g")
spark = get_spark(app_name=f"gcdiag_{{cores}}", cores=cores,
    extra_conf={{
        "spark.local.dir": shm + "/spark-local",
        "spark.driver.extraJavaOptions":
            f"-XX:+UseG1GC -XX:+AlwaysPreTouch -Xms{{mem}} "
            f"-Xlog:gc:file={{gclog}} {{extra_jvm}}",
    }})
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

def jvm_cpu():
    total = 0.0
    for pid in os.listdir('/proc'):
        if not pid.isdigit():
            continue
        try:
            with open('/proc/' + pid + '/stat') as f:
                parts = f.read().rsplit(')', 1)
            if parts[0].split('(', 1)[1] != 'java':
                continue
            v = parts[1].split()
            total += int(v[11]) + int(v[12])
        except (OSError, IndexError, ValueError):
            continue
    return total / os.sysconf('SC_CLK_TCK')

with open(gclog, 'w'):
    pass  # truncate: exclude session-start + warmup GC from the count
workdir = tempfile.mkdtemp(prefix=f"kg_diag_{{cores}}_", dir=shm)
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    j0, t0 = jvm_cpu(), time.monotonic()
    pipe.run()
    wall = time.monotonic() - t0
    jcpu = jvm_cpu() - j0
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall_sec": wall, "jvm_core_sec": jcpu}}))
spark.stop()
"""

GC_RE = re.compile(r"GC\(\d+\)\s+Pause\s+(\w+).*?(\d+\.\d+)ms")


def run_level(cores: int, n_docs: int, extra_jvm: str) -> dict:
    gclog = tempfile.mktemp(prefix=f"gc_{cores}_", suffix=".log")
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO),
           str(cores), str(n_docs), gclog, extra_jvm]
    if which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/tmp")
    res = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    pauses: dict[str, list[float]] = {}
    with open(gclog) as f:
        for line in f:
            m = GC_RE.search(line)
            if m:
                pauses.setdefault(m.group(1), []).append(float(m.group(2)))
    os.unlink(gclog)
    res["gc"] = {
        kind: {"n": len(v), "total_ms": round(sum(v), 1)}
        for kind, v in pauses.items()
    }
    res["gc_pause_core_sec"] = round(
        sum(sum(v) for v in pauses.values()) / 1000 * cores, 1
    )
    return res


def main() -> None:
    args = sys.argv[1:]
    extra_jvm = ""
    if "--" in args:
        i = args.index("--")
        extra_jvm = " ".join(args[i + 1:])
        args = args[:i]
    n_docs = int(args[0]) if args else 1_000_000
    levels = [int(c) for c in args[1:]] or [8, 32]
    for c in levels:
        r = run_level(c, n_docs, extra_jvm)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
