"""One-off diagnostic: candidate→alias match via string key vs hash key.

Current match: per surviving candidate, concat_ws(' ', window cols)
allocates the n-gram string, which is then the broadcast-hash-join
probe key. Variant: probe on xxhash64 over the window columns (no
per-candidate allocation — xxhash64 reads the UTF8String bytes of
each column in codegen), with the alias side pre-hashed the same way,
and an exact string-equality verify applied POST-join (matched rows
only — the rare path), so collisions cannot produce false mentions.

Usage: python tools/diag_match_hash.py [n_docs] [cores...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from cello_spark.session import get_spark
from cello_spark.operators.mentions import detect_mentions
from cello_spark.plans.kg import prepare_ontology
from cello_spark.sources.fixtures import make_ontology

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"mhash_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
alias_pdf = prepare_ontology(make_ontology())["alias_dict"]
alias_df = spark.createDataFrame(alias_pdf)


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


def run(name, df):
    warm = df.limit(0)  # plan compile only; real warmup below via slice
    n = None
    c0, t0 = jvm_cpu(), time.monotonic()
    n = df.count()
    return {{"wall": round(time.monotonic() - t0, 2),
             "jvm_core_sec": round(jvm_cpu() - c0, 1), "rows": n}}

# warmup both plans on a slice
small = documents.limit(max(20_000, n_docs // 10))
detect_mentions(small, alias_df, distinct=False, match="string").count()
detect_mentions(small, alias_df, distinct=False, match="hash").count()

out = {{}}
for variant in ("string", "hash", "string2", "hash2"):
    m = variant.rstrip("2")
    df = detect_mentions(documents, alias_df, distinct=False, match=m)
    out[variant] = run(variant, df)
print(json.dumps({{"cores": cores, "variants": out}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n_docs)]
    if which("taskset"):
        cpu_list = "0" if cores == 1 else f"0-{cores - 1}"
        cmd = ["taskset", "-c", cpu_list] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp")
    if out.returncode != 0:
        print(out.stdout[-3000:])
        print(out.stderr[-3000:])
        raise SystemExit(1)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = [int(c) for c in (sys.argv[2:] or ["8", "32"])]
    results = [run_level(c, n_docs) for c in cores]
    print(json.dumps(results, indent=1))
