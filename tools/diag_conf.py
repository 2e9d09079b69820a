"""One-off diagnostic: A/B Spark confs against the local[32] inflation.

Runs the full KG pipeline at local[N] once per named config variant
(fresh JVM each), reporting wall + JVM core-seconds. Used to chase the
task-thread CPU inflation (tools/diag_stacks.py fingered mmap/munmap
churn in the shuffle transferTo path and TimSort).

Usage: python tools/diag_conf.py [n_docs] [cores] [variant...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "no_transferto": {"spark.file.transferTo": "false"},
    "sort_shuffle": {"spark.shuffle.sort.bypassMergeThreshold": "0"},
    "hash_join": {"spark.sql.join.preferSortMergeJoin": "false"},
    "all": {
        "spark.file.transferTo": "false",
        "spark.shuffle.sort.bypassMergeThreshold": "0",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
    # G1's write barriers + card refinement inflate task-thread CPU
    # ~3.5x at 32 threads on the allocation-heavy interpreted phases
    # (tools/diag_ngram_flags.py); ParallelGC halves it
    "pgc": {
        "spark.driver.extraJavaOptions":
            "-XX:+UseParallelGC -XX:+AlwaysPreTouch -Xms24g",
    },
    "pgc_sort": {
        "spark.driver.extraJavaOptions":
            "-XX:+UseParallelGC -XX:+AlwaysPreTouch -Xms24g",
        "spark.shuffle.sort.bypassMergeThreshold": "0",
    },
}

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cello_spark.session import get_spark
from cello_spark.plans.kg import build_kg_pipeline
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
conf = json.loads(sys.argv[3])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
conf["spark.local.dir"] = shm + "/spark-local"
spark = get_spark(app_name=f"confdiag_{{cores}}", cores=cores, extra_conf=conf)
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

workdir = tempfile.mkdtemp(prefix=f"kg_conf_{{cores}}_", dir=shm)
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    j0, t0 = jvm_cpu(), time.monotonic()
    pipe.run()
    wall = time.monotonic() - t0
    jcpu = jvm_cpu() - j0
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall_sec": round(wall, 2),
                  "jvm_core_sec": round(jcpu, 1)}}))
spark.stop()
"""


def run(cores: int, n_docs: int, conf: dict[str, str]) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO),
           str(cores), str(n_docs), json.dumps(conf)]
    if which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/tmp")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    names = sys.argv[3:] or list(VARIANTS)
    for name in names:
        r = run(cores, n_docs, VARIANTS[name])
        print(json.dumps({"variant": name, **r}))


if __name__ == "__main__":
    main()
