"""S5 training bundle, S8 ontology-config registry, O5 threshold
source selection."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cello_spark.sources.bundles import (
    OntologyConfig,
    apply_ontology_config,
    load_training_bundle,
    save_training_bundle,
    select_threshold_source,
)


@pytest.fixture()
def bundle_dir(spark, onto, small_world, tmp_path):
    """Synthetic bundle in the reference layout, built from the fixture
    world: 60 docs as items, true labels ancestor-closed."""
    from cello_spark.sources.fixtures import closure_from_edges

    feats = spark.createDataFrame(small_world["features"]).limit(60)
    items = {r.doc_id for r in feats.select("doc_id").collect()}
    truth = small_world["truth"]
    anc = {}
    for d, a in closure_from_edges(pd.concat([onto.edges, onto.patch_edges])):
        anc.setdefault(d, set()).add(a)
    lab = set(onto.labels)
    labels = {
        t.doc_id: sorted(
            ({t.true_label} | (anc.get(t.true_label, set()) & lab)) & lab
        )
        for t in truth.itertuples(index=False)
        if t.doc_id in items
    }
    # label graph in the reference's parent -> [children] shape
    label_graph: dict[str, list[str]] = {}
    for c, p, r in pd.concat([onto.edges, onto.patch_edges])[
        ["src", "dst", "rel"]
    ].itertuples(index=False):
        if r == "is_a" and c in lab and p in lab:
            label_graph.setdefault(p, []).append(c)
    item_to_study = {
        i: f"study{sum(ord(c) for c in i) % 3}" for i in sorted(labels)
    }
    item_to_tags = {i: ["poly_a_rna"] for i in sorted(labels)}
    path = str(tmp_path / "bundle")
    save_training_bundle(
        feats.select("doc_id", "features").withColumnRenamed("doc_id", "item"),
        labels,
        label_graph,
        item_to_study,
        item_to_tags,
        path,
    )
    return path, labels, label_graph


def test_bundle_roundtrip_and_fit(spark, bundle_dir):
    """The loaded bundle drives fit_hierarchical_lr end-to-end (the
    reference's load → fit flow, load_training_data.py:19-89)."""
    from cello_spark.operators.training import fit_hierarchical_lr

    path, labels, label_graph = bundle_dir
    b = load_training_bundle(spark, path)
    assert b.features.count() == len(labels)
    got_labels = {
        (r.item, r.label) for r in b.labels_long.collect()
    }
    want_labels = {(i, l) for i, ls in labels.items() for l in ls}
    assert got_labels == want_labels
    assert sorted(b.label_edges) == sorted(
        (c, p) for p, cs in label_graph.items() for c in cs
    )
    # ms labels: per item, no label dominated by another carried label
    ms = {}
    for r in b.ms_labels_long.collect():
        ms.setdefault(r.item, set()).add(r.ms_label)
    assert all(v <= set(labels[i]) for i, v in ms.items())
    # study groups survive
    assert b.item_study.count() == len(labels)
    # and the bundle trains a model
    weights = fit_hierarchical_lr(
        b.features,
        b.labels_long,
        b.label_edges,
        ms_labels_long=b.ms_labels_long,
        item_study=b.item_study,
        n_iter=3,
    )
    assert set(weights.columns) >= {"label", "coef", "intercept", "is_trivial"}
    assert len(weights) == b.labels_long.select("label").distinct().count()


def test_ontology_config_registry(spark, onto):
    terms = spark.createDataFrame(onto.terms)
    edges = spark.createDataFrame(pd.concat([onto.edges, onto.patch_edges]))
    # full: drops only obsolete terms (all fixture ids share the CS space)
    t_full, e_full = apply_ontology_config(terms, edges, "full")
    assert t_full.filter(F.col("is_obsolete")).count() == 0
    assert t_full.count() == onto.terms[~onto.terms.is_obsolete].shape[0]
    # cell_slice: subgraph under the root, root excluded
    t_slice, e_slice = apply_ontology_config(terms, edges, "cell_slice")
    ids = {r.term_id for r in t_slice.select("term_id").collect()}
    assert "CS:0000000" not in ids
    assert len(ids) > 0 and ids < {
        r.term_id for r in t_full.select("term_id").collect()
    } | {"CS:0000000"}
    # every surviving edge endpoint survives
    eps = {r.src for r in e_slice.collect()} | {r.dst for r in e_slice.collect()}
    assert eps <= ids
    # unknown id space empties the ontology
    t_none, _ = apply_ontology_config(
        terms, edges, OntologyConfig(config_id="x", id_spaces=["NOPE"])
    )
    assert t_none.count() == 0


def test_select_threshold_source_tie_keeps_last():
    thr_a = pd.DataFrame({"label": ["l1"], "threshold": [0.1]})
    thr_b = pd.DataFrame({"label": ["l1"], "threshold": [0.2]})
    thr_c = pd.DataFrame({"label": ["l1"], "threshold": [0.3]})
    inp = ["g1", "g2", "g3", "g4"]
    # b wins outright (2/2 vs 1/2)
    name, thr = select_threshold_source(
        inp, [("a", ["g1", "zz"], thr_a), ("b", ["g1", "g2"], thr_b)]
    )
    assert name == "b" and thr is thr_b
    # exact tie: LAST candidate kept (the reference's >= update,
    # cello/cello.py:614-681)
    name, thr = select_threshold_source(
        inp, [("a", ["g1", "g2"], thr_a), ("c", ["g3", "g4"], thr_c)]
    )
    assert name == "c" and thr is thr_c
    with pytest.raises(ValueError):
        select_threshold_source(inp, [])
