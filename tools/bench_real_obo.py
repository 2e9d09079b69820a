"""Flagship KG pipeline on the REAL Cell Ontology.

Synthetic fixture ontologies (~60 terms) can hide assumptions a real
ontology breaks: alias dictionaries with thousands of multi-word
synonyms (shared first tokens, punctuation), a 6,634-term is_a/part_of
DAG whose closure is ~50k rows, hub terms ('cell' CL:0000000) with
thousands of descendants, obsolete terms, cross-relation edges. This
bench parses CL.18-11-13.obo (the ontology release the reference
pins; parser verified against it term-for-term in round 2), generates
a document corpus whose text embeds REAL CL names/synonyms
(sources/fixtures.make_documents draws mention strings from the
ontology it is given), and runs the full staged pipeline.

Labels (terms with model weights) are capped at --n-labels (default
500, sorted term order, deterministic): the reference likewise trains
on the label subset with expression data, not all 6,634 terms; the
MENTION/closure/canonicalization layers still see the full ontology.

Usage: python tools/bench_real_obo.py [n_docs] [n_labels] [obo_path]
Writes BENCH/real_obo.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OBO = "/root/reference/cello/onto_lib_py3/obo/CL.18-11-13.obo"


def run(
    n_docs: int = 20_000,
    n_labels: int = 500,
    obo_path: str = DEFAULT_OBO,
    cores: int | None = None,
    spark=None,
) -> dict:
    from cello_spark.plans.kg import build_kg_pipeline
    from cello_spark.session import get_spark
    from cello_spark.sources.fixtures import (
        make_documents,
        make_model_weights,
        make_thresholds,
    )
    from cello_spark.sources.ontology import ontology_from_obo

    with open(obo_path) as f:
        text = f.read()
    full = ontology_from_obo(text)
    labels = sorted(full.labels)[:n_labels]
    onto = ontology_from_obo(text, labels=labels)

    own_spark = spark is None
    if own_spark:
        spark = get_spark(
            app_name="bench_real_obo",
            cores=cores or int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
        )
    t_gen0 = time.monotonic()
    docs_pdf, feats_pdf, _ = make_documents(onto, n_docs=n_docs)
    docs = spark.createDataFrame(docs_pdf)
    feats = spark.createDataFrame(feats_pdf)
    gen_sec = time.monotonic() - t_gen0

    workdir = tempfile.mkdtemp(prefix="kg_real_obo_")
    try:
        pipe = build_kg_pipeline(
            spark,
            workdir,
            docs,
            feats,
            onto,
            make_model_weights(onto),
            make_thresholds(onto),
        )
        t0 = time.monotonic()
        results = pipe.run()
        wall = time.monotonic() - t0
        stages = {r.name: r.rows for r in results}
        n_triples = stages["triples"]
        # sanity: the real alias dict must actually hit the corpus
        n_mentions = stages["mentions"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out = {
        "obo": os.path.basename(obo_path),
        "n_terms": len(onto.terms),
        "n_edges": len(onto.edges),
        "n_labels": len(labels),
        "n_docs": n_docs,
        "stages": stages,
        "mentions": n_mentions,
        "triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "corpus_gen_sec": round(gen_sec, 3),
    }
    if own_spark:
        spark.stop()
    return out


def run_multi(
    n_docs: int = 20_000,
    n_labels_cl: int = 400,
    n_labels_uo: int = 100,
    obo_paths: list[str] | None = None,
    gate_docs: int = 2_000,
    cores: int | None = None,
    spark=None,
) -> dict:
    """Multi-OBO flagship: merge the real Cell Ontology with the real
    Units Ontology (two id spaces — the only distinct OBO projects in
    the reference checkout; the reference's config-17-style loads
    merge EFO+DOID+CL+UBERON the same way) via ontology_from_obos
    (later-files-win, dangling drop), take labels from BOTH id spaces,
    run the staged pipeline on a corpus mentioning both, and gate
    triple P/R >= 0.95 against the frozen python oracle on a
    gate_docs subset."""
    import pandas as pd

    from cello_spark import oracle
    from cello_spark.plans.kg import build_kg_pipeline
    from cello_spark.session import get_spark
    from cello_spark.sources.fixtures import (
        make_documents,
        make_model_weights,
        make_thresholds,
    )
    from cello_spark.sources.ontology import ontology_from_obos

    obo_paths = obo_paths or [
        "/root/reference/cello/onto_lib_py3/obo/CL.18-11-13.obo",
        "/root/reference/cello/onto_lib_py3/obo/UO.17-01-30.obo",
    ]
    texts = []
    for p in obo_paths:
        with open(p) as f:
            texts.append(f.read())
    full = ontology_from_obos(texts)
    live = full.terms[~full.terms.is_obsolete.astype(bool)]
    cl = sorted(t for t in live.term_id if t.startswith("CL:"))[:n_labels_cl]
    uo = sorted(t for t in live.term_id if t.startswith("UO:"))[:n_labels_uo]
    labels = cl + uo
    onto = ontology_from_obos(texts, labels=labels)

    own_spark = spark is None
    if own_spark:
        spark = get_spark(
            app_name="bench_multi_obo",
            cores=cores or int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
        )
    try:
        return _run_multi_body(
            spark, onto, live, cl, uo, labels, obo_paths, n_docs,
            gate_docs,
        )
    finally:
        # one cleanup at the right depth: covers pipeline AND the
        # oracle-gate math below, success and failure alike
        if own_spark:
            spark.stop()


def _run_multi_body(
    spark, onto, live, cl, uo, labels, obo_paths, n_docs, gate_docs
) -> dict:
    import pandas as pd

    from cello_spark import oracle
    from cello_spark.plans.kg import build_kg_pipeline
    from cello_spark.sources.fixtures import (
        make_documents,
        make_model_weights,
        make_thresholds,
    )

    t_gen0 = time.monotonic()
    docs_pdf, feats_pdf, _ = make_documents(onto, n_docs=n_docs)
    docs = spark.createDataFrame(docs_pdf)
    feats = spark.createDataFrame(feats_pdf)
    gen_sec = time.monotonic() - t_gen0
    weights = make_model_weights(onto)
    thresholds = make_thresholds(onto)

    workdir = tempfile.mkdtemp(prefix="kg_multi_obo_")
    try:
        pipe = build_kg_pipeline(
            spark, workdir, docs, feats, onto, weights, thresholds
        )
        t0 = time.monotonic()
        results = pipe.run()
        wall = time.monotonic() - t0
        stages = {r.name: r.rows for r in results}
        got_all = pipe.output("triples").toPandas()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # --- P/R gate vs the frozen python oracle on a doc subset ---
    gate_ids = set(docs_pdf.doc_id.iloc[:gate_docs])
    lab_set = set(labels)
    label_edges = [
        (c, p)
        for c, p, r in onto.edges[["src", "dst", "rel"]].itertuples(index=False)
        if r == "is_a" and c in lab_set and p in lab_set
    ]
    gate_feats = feats_pdf[feats_pdf.doc_id.isin(gate_ids)]
    probs = oracle.score_probs(gate_feats, weights)
    rec = oracle.reconcile_all(probs, label_edges)
    bins = oracle.binarize(rec, thresholds, label_edges)
    ms, fb = oracle.select_one_most_specific(
        rec, bins, thresholds, label_edges, qualifier_terms=set()
    )
    live_ids = set(live.term_id)
    live_edges = onto.edges[
        onto.edges.src.isin(live_ids) & onto.edges.dst.isin(live_ids)
    ]
    patched = pd.concat([live_edges, onto.patch_edges]).drop_duplicates()
    want = oracle.emit_triples(patched, ms, fb)
    got = got_all[
        ~got_all.subj.str.startswith("doc_") | got_all.subj.isin(gate_ids)
    ]
    p, r = oracle.precision_recall(got, want)

    out = {
        "obos": [os.path.basename(p_) for p_ in obo_paths],
        "n_terms": len(onto.terms),
        "n_edges": len(onto.edges),
        "n_labels": len(labels),
        "n_labels_by_space": {"CL": len(cl), "UO": len(uo)},
        "n_docs": n_docs,
        "stages": stages,
        "triples": stages["triples"],
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(stages["triples"] / wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "corpus_gen_sec": round(gen_sec, 3),
        "pr_gate": {
            "gate_docs": gate_docs,
            "precision": round(p, 5),
            "recall": round(r, 5),
            "pass": bool(p >= 0.95 and r >= 0.95),
        },
    }
    return out


def _gate_canonical_map(onto, prefixes: tuple[str, ...]) -> dict[str, str]:
    """Want-side canonical map for the multi-project P/R gate, built
    from oracle primitives (connected components over term ↔
    normalized-alias/xref pairs; canonical = lexicographic-min member
    with an ontology prefix, else min member). Mirrors the SEMANTICS
    of plans/kg.prepare_ontology so the gate checks the pipeline's
    rewrite end-to-end; the alias fold set is shared via
    plans.kg._normalize (a drifted fold would break mention parity
    long before it broke this map)."""
    from cello_spark import oracle
    from cello_spark.plans.kg import _normalize

    live = onto.terms[~onto.terms.is_obsolete.astype(bool)]
    pairs = []
    for t in live.itertuples(index=False):
        if t.name:
            pairs.append((t.term_id, _normalize(t.name)))
        for syn in t.synonyms:
            if syn["syn_str"]:
                pairs.append((t.term_id, _normalize(syn["syn_str"])))
        for x in t.xrefs:
            pairs.append((t.term_id, x))
    comp = oracle.connected_components(pairs)
    members: dict[str, list[str]] = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    m: dict[str, str] = {}
    for nodes in members.values():
        terms = sorted(n for n in nodes if n.startswith(prefixes))
        canonical = terms[0] if terms else min(nodes)
        for n in nodes:
            m[n] = canonical
    return m


def run_multi3(
    n_docs: int = 20_000,
    n_labels_cl: int = 300,
    n_labels_uo: int = 80,
    n_labels_zz: int = 40,
    gate_docs: int = 2_000,
    cores: int | None = None,
    spark=None,
) -> dict:
    """THREE-ontology flagship: the two real OBO projects the
    reference checkout bundles (CL + UO) plus a deterministic
    synthetic third id space (ZZ, sources/fixtures.synthetic_obo_text)
    that (a) re-defines real UO term ids — the 3-way later-file-wins
    precedence the reference's config-17 multi-project loads rely on
    (onto_lib_py3/load_ontology.py) — and (b) carries cross-space
    xrefs into CL, so the canonicalization pass merges identities
    ACROSS id spaces and the canonical rewrite actually fires
    (term_prefix=('CL:','UO:','ZZ:')). The P/R gate applies the SAME
    canonical rule to the oracle's golden triples (gate map rebuilt
    from oracle primitives, not engine internals)."""
    import pandas as pd

    from cello_spark import oracle
    from cello_spark.plans.kg import build_kg_pipeline
    from cello_spark.session import get_spark
    from cello_spark.sources.fixtures import (
        make_documents,
        make_model_weights,
        make_thresholds,
        synthetic_obo_text,
    )
    from cello_spark.sources.ontology import ontology_from_obos

    obo_paths = [
        "/root/reference/cello/onto_lib_py3/obo/CL.18-11-13.obo",
        "/root/reference/cello/onto_lib_py3/obo/UO.17-01-30.obo",
    ]
    texts = []
    for p in obo_paths:
        with open(p) as f:
            texts.append(f.read())
    base = ontology_from_obos(texts)
    base_live = base.terms[~base.terms.is_obsolete.astype(bool)]
    cl_ids = sorted(t for t in base_live.term_id if t.startswith("CL:"))
    uo_ids = sorted(t for t in base_live.term_id if t.startswith("UO:"))
    cl = cl_ids[:n_labels_cl]
    uo = uo_ids[:n_labels_uo]
    # cross-space xref targets: real CL terms OUTSIDE the label set
    xref_targets = cl_ids[n_labels_cl : n_labels_cl + 20]
    # 3-way precedence probe: the synthetic third file re-defines two
    # real non-label UO ids, re-parenting them under the ZZ root
    override_ids = uo_ids[n_labels_uo : n_labels_uo + 2]
    overrides = [
        {
            "term_id": t,
            "name": f"zz revision of {t}",
            "is_a": ["ZZ:0000000"],
        }
        for t in override_ids
    ]
    zz_text = synthetic_obo_text(
        id_space="ZZ",
        n_terms=120,
        xref_targets=xref_targets,
        overrides=overrides,
    )
    full = ontology_from_obos(texts + [zz_text])
    live = full.terms[~full.terms.is_obsolete.astype(bool)]
    zz = sorted(t for t in live.term_id if t.startswith("ZZ:"))[:n_labels_zz]
    labels = cl + uo + zz
    onto = ontology_from_obos(texts + [zz_text], labels=labels)
    prefixes = ("CL:", "UO:", "ZZ:")

    # merge-precedence checks (fail loudly — this is what the 3rd OBO
    # is FOR)
    by_id = dict(zip(onto.terms.term_id, onto.terms.name))
    for t in override_ids:
        assert by_id[t] == f"zz revision of {t}", (t, by_id.get(t))
    e = {
        (r.src, r.dst)
        for r in onto.edges.itertuples(index=False)
        if r.src in set(override_ids)
    }
    assert e <= {(t, "ZZ:0000000") for t in override_ids}, e
    gate_map = _gate_canonical_map(onto, prefixes)
    cross_merges = sorted(
        n
        for n, c in gate_map.items()
        if n.startswith("ZZ:") and c.startswith("CL:")
    )
    assert cross_merges, "no cross-space xref merge formed"
    # consistency gate: the independently-rebuilt map must be
    # node-for-node identical to the engine's (a divergence means the
    # canonical RULE drifted — fail the flagship loudly, don't let the
    # P/R gate silently compare two different rules)
    from cello_spark.plans.kg import prepare_ontology

    em = prepare_ontology(onto, term_prefix=prefixes)["canonical_map"]
    em = dict(zip(em.node, em.canonical))
    diffs = {
        k
        for k in set(em) | set(gate_map)
        if em.get(k, k) != gate_map.get(k, k)
    }
    assert not diffs, sorted(diffs)[:10]

    own_spark = spark is None
    if own_spark:
        spark = get_spark(
            app_name="bench_multi3_obo",
            cores=cores or int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
        )
    try:
        t_gen0 = time.monotonic()
        docs_pdf, feats_pdf, _ = make_documents(onto, n_docs=n_docs)
        docs = spark.createDataFrame(docs_pdf)
        feats = spark.createDataFrame(feats_pdf)
        gen_sec = time.monotonic() - t_gen0
        weights = make_model_weights(onto)
        thresholds = make_thresholds(onto)

        workdir = tempfile.mkdtemp(prefix="kg_multi3_obo_")
        try:
            pipe = build_kg_pipeline(
                spark, workdir, docs, feats, onto, weights, thresholds,
                term_prefix=prefixes,
            )
            t0 = time.monotonic()
            results = pipe.run()
            wall = time.monotonic() - t0
            stages = {r.name: r.rows for r in results}
            got_all = pipe.output("triples").toPandas()
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

        # --- P/R gate vs the frozen python oracle, canonical-rewritten
        gate_ids = set(docs_pdf.doc_id.iloc[:gate_docs])
        lab_set = set(labels)
        label_edges = [
            (c, p)
            for c, p, r in onto.edges[["src", "dst", "rel"]].itertuples(
                index=False
            )
            if r == "is_a" and c in lab_set and p in lab_set
        ]
        gate_feats = feats_pdf[feats_pdf.doc_id.isin(gate_ids)]
        probs = oracle.score_probs(gate_feats, weights)
        rec = oracle.reconcile_all(probs, label_edges)
        bins = oracle.binarize(rec, thresholds, label_edges)
        ms, fb = oracle.select_one_most_specific(
            rec, bins, thresholds, label_edges, qualifier_terms=set()
        )
        live_ids = set(live.term_id)
        live_edges = onto.edges[
            onto.edges.src.isin(live_ids) & onto.edges.dst.isin(live_ids)
        ]
        patched = pd.concat([live_edges, onto.patch_edges]).drop_duplicates()
        want = oracle.emit_triples(patched, ms, fb)
        # the rewrite applies ONLY the prefix-owned non-identity slice
        # (exactly the engine's semantics, canonical_rewrite_triples:
        # foreign-namespace terms the CL release embeds — UBERON/GO/PR
        # — are outside the merged id spaces and never rewrite)
        rw = {
            n: c
            for n, c in gate_map.items()
            if n.startswith(prefixes) and c != n
        }
        want = want.assign(
            subj=want.subj.map(lambda s: rw.get(s, s)),
            obj=want.obj.map(lambda s: rw.get(s, s)),
        ).drop_duplicates()
        got = got_all[
            ~got_all.subj.str.startswith("doc_") | got_all.subj.isin(gate_ids)
        ]
        p, r = oracle.precision_recall(got, want)
    finally:
        if own_spark:
            spark.stop()

    return {
        "obos": [os.path.basename(p_) for p_ in obo_paths]
        + ["ZZ.synthetic (fixtures.synthetic_obo_text)"],
        "n_terms": len(onto.terms),
        "n_edges": len(onto.edges),
        "n_labels": len(labels),
        "n_labels_by_space": {"CL": len(cl), "UO": len(uo), "ZZ": len(zz)},
        "overridden_ids": override_ids,
        "cross_space_merges": len(cross_merges),
        "n_docs": n_docs,
        "stages": stages,
        "triples": stages["triples"],
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(stages["triples"] / wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "corpus_gen_sec": round(gen_sec, 3),
        "pr_gate": {
            "gate_docs": gate_docs,
            "precision": round(p, 5),
            "recall": round(r, 5),
            "pass": bool(p >= 0.95 and r >= 0.95),
        },
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--multi3":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        out = run_multi3(n_docs=n_docs)
        path = os.path.join(REPO, "BENCH", "real_obo.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing["multi3_obo"] = out
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)
        print(json.dumps(out))
        if not out["pr_gate"]["pass"]:
            raise SystemExit(1)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--multi":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
        out = run_multi(n_docs=n_docs)
        path = os.path.join(REPO, "BENCH", "real_obo.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing["multi_obo"] = out
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)
        print(json.dumps(out))
        if not out["pr_gate"]["pass"]:
            raise SystemExit(1)
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_labels = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    obo = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_OBO
    out = run(n_docs=n_docs, n_labels=n_labels, obo_path=obo)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "real_obo.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for k in ("multi_obo", "multi3_obo"):
            if k in prev:
                existing[k] = prev[k]
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
