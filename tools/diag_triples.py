"""One-off diagnostic: decompose the triples stage at local[N].

Phases (each over the SAME persisted linked parquet):
  gate_raw     — dense-plan mention gate as shipped: left_semi vs the
                 RAW occurrence parquet (duplicate doc_ids), count
  gate_distinct— left_semi vs a partial-agg distinct of doc_id, count
  typing  — typing_triples(linked), count (scan + explode)
  rewrite — + union onto triples + 2 broadcast joins, count
  split   — the real two-branch affected/unaffected plan, count
  write   — real plan + parquet write to /dev/shm

Reports wall + JVM core-sec per phase.

Usage: python tools/diag_triples.py [n_docs] [cores...]
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
from cello_spark.operators.mentions import detect_mentions
from cello_spark.operators.linking import link_documents, typing_triples
from cello_spark.plans.kg import (
    canonical_rewrite_triples, make_linking_model, merged_term_set,
    prepare_ontology)
from cello_spark.sources.fixtures import (
    make_ontology, make_model_weights, make_thresholds)

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shm = "/dev/shm/kg_diag"
os.makedirs(shm, exist_ok=True)
spark = get_spark(app_name=f"trdiag_{{cores}}", cores=cores,
                  extra_conf={{"spark.local.dir": shm + "/spark-local"}})
cache = os.path.join({repo!r}, ".cache", "bench", f"kg_docs_{{n_docs}}")
documents = spark.read.parquet(cache + "/documents")
features = spark.read.parquet(cache + "/features")
onto = make_ontology()
prep = prepare_ontology(onto)
model = make_linking_model(onto, make_model_weights(onto), make_thresholds(onto))
merged_terms = merged_term_set(prep["canonical_map"])
onto_tr = spark.createDataFrame(prep["onto_triples"])
cmap = spark.createDataFrame(prep["canonical_map"])
alias_df = spark.createDataFrame(prep["alias_dict"])

# materialize the linked stage output once, as the pipeline would
ldir = tempfile.mkdtemp(prefix=f"tr_l_{{cores}}_", dir=shm)
mentions = detect_mentions(documents, alias_df, distinct=False)
mentioned = mentions.select("doc_id").distinct()
gated = features.join(mentioned.hint("SHUFFLE_HASH"), "doc_id", "left_semi")
link_documents(gated, model, emit_scores=False).write.mode(
    "overwrite").parquet(ldir + "/l")
linked = spark.read.parquet(ldir + "/l")
# materialize the mention occurrence table as the pipeline's mentions
# stage does — the dense-plan triples stage re-reads it for its gate
mentions.write.mode("overwrite").parquet(ldir + "/m")
mentions_pq = spark.read.parquet(ldir + "/m")

def proc_cpu():
    jvm = py = 0.0
    me = os.getpid()
    for pid in os.listdir('/proc'):
        if not pid.isdigit():
            continue
        try:
            with open('/proc/' + pid + '/stat') as f:
                parts = f.read().rsplit(')', 1)
            comm = parts[0].split('(', 1)[1]
            v = parts[1].split()
            t = int(v[11]) + int(v[12]) + int(v[13]) + int(v[14])
        except (OSError, IndexError, ValueError):
            continue
        if comm == 'java':
            jvm += t
        elif comm.startswith('python') and int(pid) != me:
            py += t
    tck = os.sysconf('SC_CLK_TCK')
    return jvm / tck, py / tck

def raw_df():
    return onto_tr.unionByName(typing_triples(linked))

def phase_gate_raw():
    # as shipped: SHUFFLE_HASH builds its hash relation over EVERY
    # occurrence row (duplicate doc_ids and all)
    linked.join(
        mentions_pq.select("doc_id").hint("SHUFFLE_HASH"),
        "doc_id", "left_semi").count()

def phase_gate_distinct():
    # partial-agg distinct first: map-side combine collapses the
    # occurrence rows to unique doc_ids before the exchange
    linked.join(
        mentions_pq.select("doc_id").distinct().hint("SHUFFLE_HASH"),
        "doc_id", "left_semi").count()

def phase_typing():
    typing_triples(linked).count()

def phase_rewrite():
    # joins only, no affected split (merged_terms=[] path)
    canonical_rewrite_triples(raw_df(), cmap, []).count()

def phase_split():
    canonical_rewrite_triples(raw_df(), cmap, merged_terms).count()

def phase_write():
    out = tempfile.mkdtemp(prefix=f"tr_w_{{cores}}_", dir=shm)
    try:
        canonical_rewrite_triples(raw_df(), cmap, merged_terms).write.mode(
            "overwrite").parquet(out + "/t")
    finally:
        shutil.rmtree(out, ignore_errors=True)

phases = [("gate_raw", phase_gate_raw),
          ("gate_distinct", phase_gate_distinct),
          ("typing", phase_typing), ("rewrite", phase_rewrite),
          ("split", phase_split), ("write", phase_write)]
# warmup on a slice
saved = linked
linked = linked.limit(max(20_000, n_docs // 10))
for _, fn in phases:
    fn()
linked = saved
out = {{}}
for name, fn in phases:
    (j0, p0), t0 = proc_cpu(), time.monotonic()
    fn()
    j1, p1 = proc_cpu()
    out[name] = {{"wall": round(time.monotonic() - t0, 2),
                 "jvm_core_sec": round(j1 - j0, 1),
                 "py_core_sec": round(p1 - p0, 1)}}
shutil.rmtree(ldir, ignore_errors=True)
print(json.dumps({{"cores": cores, "phases": out}}))
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
