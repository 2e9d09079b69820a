"""One-off diagnostic: tokenizer expression variants.

mention_tokens ends with `filter(split(...), t -> t != '')` — a
higher-order function. HOF lambdas evaluate INTERPRETED per element
(the same mechanism behind the n-gram HOF pathology measured in
diag_ngram_variants), and this one runs once per text span — the very
first expression of the pipeline's dominant stage. This A/Bs
semantically identical drop-empty shapes at both parallelism levels:

  hof     — filter(split(folded, ' '), t -> t != '')      (current)
  remove  — array_remove(split(folded, ' '), '')          (codegen)
  raw     — split(folded, ' ')                            (lower bound,
            keeps empties — NOT semantically valid, isolates drop cost)

Usage: python tools/diag_tokenizer.py [n_docs] [cores...]
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
from cello_spark.operators.mentions import text_spans
from cello_spark.functions.text import _MENTION_FOLD

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"tokvar_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")


def folded(c):
    return F.translate(
        F.lower(c), "\t\n\r" + _MENTION_FOLD, " " * (3 + len(_MENTION_FOLD))
    )


VARIANTS = {{
    "hof": lambda c: F.filter(F.split(folded(c), " "), lambda t: t != ""),
    "remove": lambda c: F.array_remove(F.split(folded(c), " "), ""),
    "raw": lambda c: F.split(folded(c), " "),
}}


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


spans = text_spans(documents).select("text")
warm = text_spans(documents.limit(max(20_000, n_docs // 10))).select("text")
out = {{}}
for name, fn in VARIANTS.items():
    warm.select(F.sum(F.size(fn(F.col("text")))).alias("s")).collect()
    c0, t0 = jvm_cpu(), time.monotonic()
    row = spans.select(F.sum(F.size(fn(F.col("text")))).alias("s")).collect()[0]
    out[name] = {{"wall": round(time.monotonic() - t0, 2),
                  "jvm_core_sec": round(jvm_cpu() - c0, 1),
                  "sum_size": row.s}}
print(json.dumps({{"cores": cores, "variants": out}}))
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


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cores = [int(c) for c in (sys.argv[2:] or ["8", "32"])]
    results = [run_level(c, n_docs) for c in cores]
    print(json.dumps(results, indent=1))
