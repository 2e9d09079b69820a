"""M11 model registry (reference models/model.py:15-22): name→factory
dispatch over the distributed operators, all four classifier variants
plus the scale/pca preprocessor chain."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cello_spark.plans.registry import (
    CLASSIFIERS,
    PREPROCESSORS,
    ModelSpec,
    build_model,
)


def _training_world(spark, small_world, label_edges):
    """(features_df(item, features), labels_long(item, label)) — truth
    labels ancestor-closed over the label DAG, 120 items."""
    feats = (
        spark.createDataFrame(small_world["features"])
        .select(F.col("doc_id").alias("item"), "features")
        .limit(120)
    )
    anc = {}
    for c, p in label_edges:
        anc.setdefault(c, set()).add(p)

    def lineage(lab):
        out, frontier = {lab}, set(anc.get(lab, ()))
        while frontier:
            out |= frontier
            frontier = {g for f in frontier for g in anc.get(f, ())} - out
        return out

    truth = small_world["truth"]
    rows = [
        (t.doc_id, l)
        for t in truth.itertuples(index=False)
        for l in lineage(t.true_label)
    ]
    labels_long = spark.createDataFrame(
        pd.DataFrame(rows, columns=["item", "label"])
    ).join(feats.select("item"), "item", "left_semi")
    return feats, labels_long


def test_spec_validation():
    with pytest.raises(KeyError, match="unknown classifier"):
        ModelSpec(classifier="gbm")
    with pytest.raises(KeyError, match="unknown preprocessor"):
        ModelSpec(preprocessors=[("whiten", {})])
    assert set(CLASSIFIERS) == {
        "onn", "ind_one_vs_rest", "cdc", "isotonic_regression",
    }
    assert set(PREPROCESSORS) == {"scale", "pca"}


def test_explicit_training_sets_reproduce_default_fit(
    spark, small_world, label_edges
):
    """fit_hierarchical_lr(training_sets=SO1∪SO2 sets) must equal the
    default mask path bit-for-bit — the explicit-sets plumbing adds no
    new semantics when fed the same sets."""
    from cello_spark.operators.training import (
        fit_hierarchical_lr,
        most_specific_labels,
        negative_examples,
        positive_examples,
    )
    from cello_spark.plans.registry import _edges_closure_dfs

    feats, labels_long = _training_world(spark, small_world, label_edges)
    labels = sorted(
        r["label"] for r in labels_long.select("label").distinct().collect()
    )
    _, closure_df = _edges_closure_dfs(spark, labels, label_edges)

    ms = most_specific_labels(labels_long, label_edges)
    pos = positive_examples(labels_long, closure_df).withColumn(
        "y", F.lit(1)
    )
    neg = negative_examples(
        labels_long,
        closure_df,
        ms,
        labels_long.select("label").distinct(),
    ).withColumn("y", F.lit(0))
    sets = pos.unionByName(neg)

    kw = dict(l2=1.0, n_iter=3)
    w_default = fit_hierarchical_lr(feats, labels_long, label_edges, **kw)
    w_explicit = fit_hierarchical_lr(
        feats, labels_long, label_edges, training_sets=sets, **kw
    )
    assert list(w_default.label) == list(w_explicit.label)
    # the two paths partition the training frame differently, so the
    # deterministic per-partition accumulation sums in a different
    # order — identical semantics, ~1e-15 float noise
    np.testing.assert_allclose(
        np.stack(w_default.coef), np.stack(w_explicit.coef), atol=1e-10
    )
    np.testing.assert_allclose(
        w_default.intercept.to_numpy(),
        w_explicit.intercept.to_numpy(),
        atol=1e-10,
    )


@pytest.fixture(scope="module")
def fitted_pair(spark, small_world, label_edges):
    """ind_one_vs_rest and isotonic_regression fitted on the same
    world (shared because the fit dominates test time)."""
    feats, labels_long = _training_world(spark, small_world, label_edges)
    out = {}
    for name in ("ind_one_vs_rest", "isotonic_regression"):
        out[name] = build_model(name, {"n_iter": 3}).fit(
            feats, labels_long, label_edges
        )
    return feats, out


def test_ind_vs_isotonic_reconciliation(fitted_pair):
    """Same coefficients; ind emits raw sigmoid probs while isotonic's
    are hierarchy-consistent (child prob ≤ parent prob)."""
    feats, models = fitted_pair
    ind, iso = models["ind_one_vs_rest"], models["isotonic_regression"]
    np.testing.assert_array_equal(ind.linking_model.W, iso.linking_model.W)

    docs = feats.select(F.col("item").alias("doc_id"), "features").limit(20)
    p_ind = (
        ind.predict(docs).select("doc_id", "probs").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    p_iso = (
        iso.predict(docs).select("doc_id", "probs").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    P_ind = np.stack([np.asarray(p) for p in p_ind.probs])
    P_iso = np.stack([np.asarray(p) for p in p_iso.probs])

    lm = iso.linking_model
    edge_parent, edge_child = lm.edge_idx[:, 0], lm.edge_idx[:, 1]
    # isotonic: every child ≤ parent (Dykstra feasibility)
    assert (
        P_iso[:, edge_child] <= P_iso[:, edge_parent] + 1e-5
    ).all()
    # ind: probs are the raw scores (reconcile is identity)
    X = np.stack(
        [np.asarray(r["features"]) for r in docs.orderBy("doc_id").collect()]
    )
    raw = lm.score(X)
    np.testing.assert_allclose(P_ind, raw, atol=1e-6)


def test_cdc_clr_kernel_matches_cascade_operator(
    spark, small_world, label_edges
):
    """The clr reconcile kernel must agree with the relational
    clr_marginals operator on identical conditional probabilities."""
    from cello_spark.operators.cascade import clr_marginals

    feats, labels_long = _training_world(spark, small_world, label_edges)
    m = build_model("cdc", {"n_iter": 3}).fit(feats, labels_long, label_edges)
    lm = m.linking_model
    assert lm.reconcile_mode == "clr"

    docs = feats.select(F.col("item").alias("doc_id"), "features").limit(10)
    X = np.stack(
        [np.asarray(r["features"]) for r in docs.orderBy("doc_id").collect()]
    )
    ids = [r["doc_id"] for r in docs.orderBy("doc_id").collect()]
    P = lm.score(X)
    M = lm.reconcile(P)

    cond = spark.createDataFrame(
        pd.DataFrame(
            [
                (ids[i], lm.labels[j], float(P[i, j]))
                for i in range(len(ids))
                for j in range(len(lm.labels))
            ],
            columns=["item", "label", "prob"],
        )
    )
    strict = [
        (lm.labels[i], lm.labels[j])
        for i, j in zip(*np.nonzero(lm.anc_strict))
    ]
    cws = spark.createDataFrame(
        pd.DataFrame(
            strict + [(l, l) for l in lm.labels],
            columns=["descendant", "ancestor"],
        )
    )
    got = {
        (r["item"], r["label"]): r["marginal"]
        for r in clr_marginals(cond, cws).collect()
    }
    for i, d in enumerate(ids):
        for j, l in enumerate(lm.labels):
            assert got[(d, l)] == pytest.approx(M[i, j], abs=1e-9)


def test_onn_predict_returns_neighbor_labels(spark, small_world, label_edges):
    feats, labels_long = _training_world(spark, small_world, label_edges)
    train = feats.limit(40)
    m = build_model("onn").fit(train, labels_long, label_edges)
    docs = feats.select(F.col("item").alias("doc_id"), "features").limit(15)
    out = m.predict(docs).toPandas()
    assert set(out.columns) == {"doc_id", "ref_id", "distance", "labels"}
    assert len(out) == 15
    # a training item is its own nearest neighbor at distance 0
    train_ids = {r["item"] for r in train.select("item").collect()}
    self_hits = out[out.doc_id.isin(train_ids)]
    assert (self_hits.doc_id == self_hits.ref_id).all()
    # expanded ||x||²+||r||²-2x·r form cancels to ~1e-8 at self-pairs
    assert (self_hits.distance.abs() < 1e-6).all()


def test_preprocessor_chain_back_projection(spark, small_world, label_edges):
    """scale→pca→LR fitted in preprocessed space scores RAW features
    identically to transform-then-score (exact back-projection)."""
    from cello_spark.operators.preprocess import transform_features

    feats, labels_long = _training_world(spark, small_world, label_edges)
    m = build_model(
        "isotonic_regression",
        {"n_iter": 3},
        preprocessors=[("scale", {}), ("pca", {"n_components": 4})],
    ).fit(feats, labels_long, label_edges)

    docs = feats.select(F.col("item").alias("doc_id"), "features").limit(10)
    X_raw = np.stack(
        [np.asarray(r["features"]) for r in docs.orderBy("doc_id").collect()]
    )
    Z = transform_features(docs, m.preprocessor_models).orderBy("doc_id")
    X_pre = np.stack([np.asarray(r["features"]) for r in Z.collect()])

    from cello_spark.operators.preprocess import chain_affine

    aff = chain_affine(m.preprocessor_models)
    np.testing.assert_allclose(X_pre, X_raw @ aff.A.T + aff.c, atol=1e-8)

    # end-to-end: the registry's folded raw-space model must score raw
    # features exactly like a manually-chained fit (fit LR on the
    # TRANSFORMED features, score the TRANSFORMED features, no folding)
    from cello_spark.operators.linking import LinkingModel
    from cello_spark.operators.training import fit_hierarchical_lr

    z_train = transform_features(feats, m.preprocessor_models)
    w_manual = fit_hierarchical_lr(
        z_train, labels_long, label_edges, n_iter=3
    )
    lm_manual = LinkingModel.from_tables(
        w_manual,
        pd.DataFrame({"label": w_manual.label, "threshold": 0.5}),
        label_edges,
    )
    s_manual = lm_manual.score(X_pre)
    s_folded = m.linking_model.score(X_raw)
    np.testing.assert_allclose(s_folded, s_manual, atol=1e-8)


def test_onn_confidence_matrix_vs_numpy_oracle(
    spark, small_world, label_edges
):
    """confidence=True emits the reference-shaped per-label matrix
    (-distance on the neighbor's labels, -inf elsewhere), verified
    against an independent numpy nearest-neighbor oracle."""
    import numpy as np

    feats, labels_long = _training_world(spark, small_world, label_edges)
    train = feats.limit(40)
    m = build_model("onn").fit(train, labels_long, label_edges)
    docs = feats.select(F.col("item").alias("doc_id"), "features").limit(12)
    out = m.predict(docs, confidence=True).toPandas()

    # fresh oracle: brute-force euclidean 1-NN over the same tables
    train_pdf = train.toPandas()
    lab_pdf = labels_long.toPandas()
    lab_by_item = lab_pdf.groupby("item")["label"].apply(set).to_dict()
    ref = train_pdf[train_pdf.item.isin(lab_by_item)].reset_index(drop=True)
    # fit keeps only labelled items; ref_id tie-break = lowest id
    ref = ref.sort_values("item").reset_index(drop=True)
    R = np.stack([np.asarray(v, float) for v in ref["features"]])
    universe = sorted({l for ls in lab_by_item.values() for l in ls})
    docs_pdf = docs.toPandas()
    expected = {}
    for r in docs_pdf.itertuples(index=False):
        x = np.asarray(r.features, float)
        d = np.sqrt(((R - x) ** 2).sum(axis=1))
        j = int(np.argmin(d))  # numpy argmin = first min = lowest ref_id
        nn_labels = lab_by_item[ref["item"][j]]
        for l in universe:
            expected[(r.doc_id, l)] = (
                -d[j] if l in nn_labels else float("-inf")
            )

    got = {(r.doc_id, r.label): r.confidence for r in out.itertuples(index=False)}
    assert set(got) == set(expected)
    for k, v in expected.items():
        if v == float("-inf"):
            assert got[k] == float("-inf"), k
        else:
            assert got[k] == pytest.approx(v, abs=1e-6), k
    # shape: every doc carries the FULL universe
    assert len(out) == len(docs_pdf) * len(universe)

    with pytest.raises(ValueError, match="onn"):
        build_model("isotonic_regression", {"n_iter": 1}).fit(
            feats, labels_long, label_edges
        ).predict(docs, confidence=True)
