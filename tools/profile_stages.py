"""Per-stage scaling profile: run the KG pipeline once per parallelism
level on the same cached input and print each stage's wall time, plus
the tail count() — locates WHICH stage fails to scale N -> 4N.

Usage: python tools/profile_stages.py [n_docs] [levels...]
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
shm = "/dev/shm/kg_bench"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"profile_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
onto = make_ontology()
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
features = spark.read.parquet(cache + "/features")
warm_dir = tempfile.mkdtemp(prefix=f"kg_warm_{{cores}}_", dir=shm)
try:
    build_kg_pipeline(spark, warm_dir, documents.limit(20_000), features,
                      onto, make_model_weights(onto), make_thresholds(onto)).run()
finally:
    shutil.rmtree(warm_dir, ignore_errors=True)
workdir = tempfile.mkdtemp(prefix=f"kg_prof_{{cores}}_", dir=shm)
try:
    pipe = build_kg_pipeline(spark, workdir, documents, features, onto,
                             make_model_weights(onto), make_thresholds(onto))
    t0 = time.monotonic()
    results = pipe.run()
    t_mid = time.monotonic()
    n_triples = pipe.output("triples").count()
    t1 = time.monotonic()
finally:
    shutil.rmtree(workdir, ignore_errors=True)
out = {{"cores": cores,
       "stages": {{r.name: round(r.wall_sec, 2) for r in results}},
       "count_sec": round(t1 - t_mid, 2),
       "total_sec": round(t1 - t0, 2),
       "triples": n_triples}}
print("PROFILE " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    levels = [int(x) for x in sys.argv[2:]] or [8, 32]
    for cores in levels:
        cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
        if which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp")
        for line in out.stdout.splitlines():
            if line.startswith("PROFILE"):
                print(line, flush=True)
                break
        else:
            print(f"local[{cores}] FAILED:\n{out.stderr[-3000:]}", flush=True)


if __name__ == "__main__":
    main()
