"""One-off diagnostic: n-gram candidate-builder expression variants.

The mention stage's candidate construction (interpreted HOF chain
transform -> sequence -> slice -> array_join) is the largest single
CPU sink in the KG pipeline and the worst 8->32 scaler (its G1
write-barrier/allocation pressure inflates 2.8x; tools/diag_ngram_flags.py).
This A/Bs plan-level rewrites that reduce per-candidate allocation,
at both parallelism levels, under the default session GC:

  current   — per candidate: slice(tokens) + array_join  (2 allocs + O(n) copy)
  agg       — incremental: ngram_n = concat(ngram_{n-1}, ' ', tok)
              via aggregate + array_append  (1 string + 1 array copy)
  ncand1    — like current but CASE gate evaluated once per position
              (bound via single-element transform)

Usage: python tools/diag_ngram_variants.py [n_docs] [cores...]
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
from cello_spark.functions.text import mention_tokens
from cello_spark.plans.kg import prepare_ontology
from cello_spark.sources.fixtures import make_ontology

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"ngvar_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
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

EXPRS = {{
    'current': f'''
        flatten(transform(tokens, (tok, pos) ->
          if(({{n_cand}}) >= 1,
             transform(sequence(1, least({{n_cand}}, size(tokens) - pos)),
                       n -> array_join(slice(tokens, pos + 1, n), ' ')),
             array())))
    ''',
    'agg': f'''
        flatten(transform(tokens, (tok, pos) ->
          if(({{n_cand}}) >= 1,
             aggregate(slice(tokens, pos + 2,
                             least({{n_cand}}, size(tokens) - pos) - 1),
                       array(tok),
                       (acc, t) -> array_append(
                           acc, concat(element_at(acc, -1), ' ', t))),
             array())))
    ''',
    'ncand1': f'''
        flatten(zip_with(tokens,
                         transform(tokens, tok -> {{n_cand}}),
                         (tok, nc) -> if(nc >= 1, array(tok), array())))
    ''',
}}
# ncand1 is only the gate (1-grams) — a lower bound showing the cost
# of the gate itself without multi-token candidate construction.

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

toks_full = text_spans(documents).select(mention_tokens('text').alias('tokens'))
toks_warm = text_spans(documents.limit(max(20_000, n_docs // 10))).select(
    mention_tokens('text').alias('tokens'))
def exploded(toks):
    # no-lambda shape: posexplode + codegen explode(sequence) +
    # TOP-LEVEL slice/array_join (interpreted only inside lambdas)
    tokpos = toks.select('tokens', F.posexplode('tokens').alias('pos', 'tok'))
    return (tokpos.withColumn('k', F.expr(f'least({{n_cand}}, size(tokens) - pos)'))
            .where(F.col('k') >= 1)
            .select('tokens', 'pos', F.explode(F.expr('sequence(1, k)')).alias('n'))
            .select(F.expr("array_join(slice(tokens, pos + 1, n), ' ')").alias('g')))

out = {{}}
for name, expr in EXPRS.items():
    toks_warm.select(F.explode(F.expr(expr)).alias('g')).count()  # JIT
    j0, t0 = jvm_cpu(), time.monotonic()
    n = toks_full.select(F.explode(F.expr(expr)).alias('g')).count()
    out[name] = {{'wall': round(time.monotonic() - t0, 2),
                 'jvm_core_sec': round(jvm_cpu() - j0, 1), 'rows': n}}
exploded(toks_warm).count()
j0, t0 = jvm_cpu(), time.monotonic()
n = exploded(toks_full).count()
out['exploded'] = {{'wall': round(time.monotonic() - t0, 2),
                   'jvm_core_sec': round(jvm_cpu() - j0, 1), 'rows': n}}
print(json.dumps({{'cores': cores, 'variants': out}}))
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
