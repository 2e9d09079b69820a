"""One-off diagnostic: JVM-flag A/B on the n-gram phase inflation.

Runs ONLY the candidate-n-gram construction (the phase whose
core-seconds inflate 2.8x from local[8] to local[32]) under different
JVM allocator/GC flags at local[32], to test whether the inflation is
allocator-level (TLAB/region contention) before rewriting the plan.

Usage: python tools/diag_ngram_flags.py [n_docs] [cores] [variant...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from shutil import which

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = "-XX:+AlwaysPreTouch -Xms{mem}"
VARIANTS = {
    "g1": "-XX:+UseG1GC",
    "parallel": "-XX:+UseParallelGC",
    "g1_region32m": "-XX:+UseG1GC -XX:G1HeapRegionSize=32m",
    "g1_bigtlab": "-XX:+UseG1GC -XX:MinTLABSize=4m -XX:TLABWasteTargetPercent=10",
    "zgc": "-XX:+UseZGC",
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from cello_spark.session import get_spark
from cello_spark.operators.mentions import text_spans
from cello_spark.functions.text import mention_tokens
from cello_spark.plans.kg import prepare_ontology
from cello_spark.sources.fixtures import make_ontology

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); jvm_flags = sys.argv[3]
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
mem = os.environ.get("SPARK_DRIVER_MEM", "24g")
spark = get_spark(app_name=f"ngflag_{{cores}}", cores=cores,
    extra_conf={{
        "spark.local.dir": shm + "/spark-local",
        "spark.driver.extraJavaOptions":
            jvm_flags.format(mem=mem),
    }})
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
alias_pdf = prepare_ontology(make_ontology())["alias_dict"]

ft = {{}}
for a in alias_pdf.itertuples(index=False):
    p = a.alias_norm.split(' ')
    ft[p[0]] = max(ft.get(p[0], 0), len(p))
by_len = {{}}
for t, n in ft.items():
    by_len.setdefault(n, []).append(t)
def lit(ts):
    return ', '.join("'" + t.replace("'", "\\'") + "'" for t in sorted(ts))
n_cand = 'CASE ' + ' '.join(
    f'WHEN tok IN ({{lit(ts)}}) THEN {{n}}' for n, ts in sorted(by_len.items())
) + ' ELSE 0 END'
ngram_expr = f'''
    flatten(transform(tokens, (tok, pos) ->
      if(({{n_cand}}) >= 1,
         transform(sequence(1, least({{n_cand}}, size(tokens) - pos)),
                   n -> array_join(slice(tokens, pos + 1, n), ' ')),
         array())))
'''

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

def run(docs):
    (text_spans(docs)
     .select(mention_tokens('text').alias('tokens'))
     .select(F.explode(F.expr(ngram_expr)).alias('ngram')).count())

run(documents.limit(max(20_000, n_docs // 10)))  # warmup/JIT
j0, t0 = jvm_cpu(), time.monotonic()
run(documents)
print(json.dumps({{"cores": cores, "wall_sec": round(time.monotonic() - t0, 2),
                  "jvm_core_sec": round(jvm_cpu() - j0, 1)}}))
spark.stop()
"""


def run(cores: int, n_docs: int, flags: str) -> dict:
    full = f"{flags} -XX:+AlwaysPreTouch -Xms{{mem}}"
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO),
           str(cores), str(n_docs), full]
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
