"""One-off diagnostic: decompose the mentions stage's 8->32 CPU inflation.

Runs progressively larger prefixes of the mention-detection plan at
local[N], measuring JVM core-seconds for each (fresh action per phase,
same JVM, post-warmup). The phase whose core-seconds inflate most
8->32 is the one serializing the stage.

Phases:
  scan    — parquet scan + posexplode of text spans, count
  tokens  — + mention_tokens (translate/lower/split/filter), sum(size)
  ngrams  — + first-token gate + n-gram construction, count
  match   — + broadcast alias join + dropDuplicates, count
  write   — full stage incl. parquet write to /dev/shm

Usage: python tools/diag_mentions.py [n_docs] [cores...]
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
from pyspark.sql import functions as F
from cello_spark.session import get_spark
from cello_spark.operators.mentions import detect_mentions, text_spans
from cello_spark.functions.text import mention_tokens
from cello_spark.plans.kg import prepare_ontology
from cello_spark.sources.fixtures import make_ontology

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"mdiag_{{cores}}", cores=cores,
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

toks = text_spans(documents).select(
    "doc_id", "span_idx", "offset", mention_tokens("text").alias("tokens"))

def phase_scan():
    text_spans(documents).count()

def phase_tokens():
    toks.agg(F.sum(F.size("tokens"))).collect()

# candidate n-gram expression, mirroring mentions.py's "case" gate
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

def phase_ngrams():
    toks.select(F.explode(F.expr(ngram_expr)).alias('ngram')).count()

def phase_match():
    detect_mentions(documents, alias_df).count()

def phase_write():
    out_dir = tempfile.mkdtemp(prefix=f'mdiag_{{cores}}_', dir=shm)
    try:
        detect_mentions(documents, alias_df).select(
            'doc_id', 'span_idx', 'offset', 'term_id'
        ).write.mode('overwrite').parquet(out_dir + '/out')
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

phases = [('scan', phase_scan), ('tokens', phase_tokens),
          ('ngrams', phase_ngrams), ('match', phase_match),
          ('write', phase_write)]
# warmup: run every phase once on a slice to JIT everything
warm = documents.limit(max(20_000, n_docs // 10))
saved = documents
documents = warm
toks_saved = toks
toks = text_spans(warm).select(
    'doc_id', 'span_idx', 'offset', mention_tokens('text').alias('tokens'))
for _, fn in phases:
    fn()
documents = saved
toks = toks_saved

out = {{}}
for name, fn in phases:
    j0, t0 = jvm_cpu(), time.monotonic()
    fn()
    out[name] = {{'wall': round(time.monotonic() - t0, 2),
                 'jvm_core_sec': round(jvm_cpu() - j0, 1)}}
print(json.dumps({{'cores': cores, 'phases': out}}))
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
