"""Training operators (SO1/SO2 set ops, M9 weights, distributed IRLS
fit M3/M4) vs pure-python oracles on the fixture world."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cello_spark.operators.training import (
    cdc_training_sets,
    fit_hierarchical_lr,
    most_specific_labels,
    negative_examples,
    positive_examples,
    study_weights,
)

# tiny DAG:   a
#            / \
#           b   c
#          /
#         d
EDGES = [("b", "a"), ("c", "a"), ("d", "b")]
CLOSURE = [("b", "a"), ("c", "a"), ("d", "b"), ("d", "a")]
ITEM_LABELS = [
    ("i1", "d"), ("i1", "b"), ("i1", "a"),
    ("i2", "c"), ("i2", "a"),
    ("i3", "b"), ("i3", "a"),
]


def _closure_df(spark):
    return spark.createDataFrame(CLOSURE, "descendant string, ancestor string")


def _labels_df(spark):
    return spark.createDataFrame(ITEM_LABELS, "item string, label string")


def test_positive_examples_oracle(spark):
    got = {
        (r["item"], r["label"])
        for r in positive_examples(_labels_df(spark), _closure_df(spark)).collect()
    }
    # oracle: item positive for L iff it carries L or a descendant of L
    desc = {}
    for d, a in CLOSURE:
        desc.setdefault(a, set()).add(d)
    items = {}
    for i, l in ITEM_LABELS:
        items.setdefault(i, set()).add(l)
    exp = set()
    for i, labs in items.items():
        for L in "abcd":
            if L in labs or (desc.get(L, set()) & labs):
                exp.add((i, L))
    assert got == exp


def test_negative_examples_oracle(spark):
    labels_df = _labels_df(spark)
    closure_df = _closure_df(spark)
    ms = most_specific_labels(labels_df, EDGES)
    all_labels = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "label string")
    got = {
        (r["item"], r["label"])
        for r in negative_examples(labels_df, closure_df, ms, all_labels).collect()
    }
    # oracle per reference SO2: neg = all - pos - ambiguous
    anc = {}
    for d, a in CLOSURE:
        anc.setdefault(d, set()).add(a)
    items = {}
    for i, l in ITEM_LABELS:
        items.setdefault(i, set()).add(l)
    ms_oracle = {
        i: {l for l in labs if not any(l in anc.get(o, set()) for o in labs)}
        for i, labs in items.items()
    }
    desc = {}
    for d, a in CLOSURE:
        desc.setdefault(a, set()).add(d)
    exp = set()
    for i, labs in items.items():
        for L in "abcd":
            pos = L in labs or bool(desc.get(L, set()) & labs)
            ambig = bool(ms_oracle[i] & anc.get(L, set()))
            if not pos and not ambig:
                exp.add((i, L))
    assert got == exp
    # spot checks: i3 (ms=b) is ambiguous for d (b is ancestor of d) →
    # d NOT a negative for i3; c IS a negative for i3
    assert ("i3", "d") not in got
    assert ("i3", "c") in got


def _brute_cdc(item_labels, edges, mode):
    """Driver-side mirror of the reference algorithm
    (cascaded_discriminative_classifiers.py:196-261), written
    independently of the Spark plan."""
    items = {}
    for i, l in item_labels:
        items.setdefault(i, set()).add(l)
    universe = {l for _, l in item_labels}
    children = {}
    parents_of = {}
    for c, p in edges:
        children.setdefault(p, set()).add(c)
        parents_of.setdefault(c, set()).add(p)

    def desc(l):
        out, frontier = set(), set(children.get(l, ()))
        while frontier:
            out |= frontier
            frontier = {g for f in frontier for g in children.get(f, ())} - out
        return out

    def anc(l):
        out, frontier = set(), set(parents_of.get(l, ()))
        while frontier:
            out |= frontier
            frontier = {g for f in frontier for g in parents_of.get(f, ())} - out
        return out

    def ms(labs):
        return {l for l in labs if not any(o in labs for o in desc(l) if o != l)}

    out = set()
    for L in universe:
        pos = {i for i, labs in items.items() if L in labs or (labs & desc(L))}
        par = parents_of.get(L, set())
        neg = {i for i, labs in items.items() if par <= labs} - pos
        if mode == "remove_ambiguous":
            neg -= {i for i in neg if par <= ms(items[i])}
        out |= {(i, L, 1) for i in pos} | {(i, L, 0) for i in neg}
    return out


@pytest.mark.parametrize("mode", ["assert_ambiguous_negative", "remove_ambiguous"])
def test_cdc_training_sets_match_reference_brute_force(spark, mode):
    # diamond + extra leaf: a <- {b, c}; {b, c} <- d; b <- e
    edges = [("b", "a"), ("c", "a"), ("d", "b"), ("d", "c"), ("e", "b")]
    closure = [
        ("b", "a"), ("c", "a"), ("e", "b"), ("e", "a"),
        ("d", "b"), ("d", "c"), ("d", "a"),
    ]
    item_labels = [
        ("i1", "d"),
        ("i2", "b"), ("i2", "c"),
        ("i3", "b"),
        ("i4", "a"),
        ("i5", "e"),
        ("i6", "a"), ("i6", "b"),
    ]
    got = {
        (r["item"], r["label"], r["y"])
        for r in cdc_training_sets(
            spark.createDataFrame(item_labels, "item string, label string"),
            spark.createDataFrame(closure, "descendant string, ancestor string"),
            spark.createDataFrame(edges, "child string, parent string"),
            mode=mode,
        ).collect()
    }
    assert got == _brute_cdc(item_labels, edges, mode)
    # spot-checks from the hand-derivation (mode-sensitive rows)
    if mode == "assert_ambiguous_negative":
        assert ("i4", "b", 0) in got and ("i4", "c", 0) in got
        assert ("i2", "d", 0) in got
    else:
        assert ("i4", "b", 0) not in got  # ms(i4)={a} ⊇ parents(b)
        assert ("i6", "c", 0) in got  # ms(i6)={b} ⊉ {a}


def test_cdc_fit_predict_end_to_end(spark, onto, small_world, label_edges):
    """SO3 feeds training: CDC pos/neg sets drive fit_hierarchical_lr
    and the fitted model links documents (fit -> predict closes)."""
    import pandas as pd

    feats = spark.createDataFrame(small_world["features"]).limit(80)
    truth = small_world["truth"]
    edges_df = spark.createDataFrame(label_edges, "child string, parent string")
    from cello_spark.operators.graph import transitive_closure

    closure_df = transitive_closure(
        edges_df.select(
            F.col("child").alias("src"), F.col("parent").alias("dst")
        ).withColumn("rel", F.lit("is_a")),
        rels=("is_a",),
    )
    base = spark.createDataFrame(
        pd.DataFrame(
            [(t.doc_id, t.true_label) for t in truth.itertuples(index=False)],
            columns=["item", "label"],
        )
    ).join(feats.select(F.col("doc_id").alias("item")), "item", "left_semi")
    # ancestor-close the label sets (the reference's exp_to_labels form)
    labels_long = positive_examples(base, closure_df)
    sets = cdc_training_sets(labels_long, closure_df, edges_df)
    # pos/neg are disjoint and both non-empty on the fixture world
    n_pos = sets.filter("y = 1").count()
    n_neg = sets.filter("y = 0").count()
    assert n_pos > 0 and n_neg > 0
    assert (
        sets.groupBy("item", "label").count().filter("count > 1").count() == 0
    )


def test_most_specific_labels(spark):
    got = {
        (r["item"], r["ms_label"])
        for r in most_specific_labels(_labels_df(spark), EDGES).collect()
    }
    assert got == {("i1", "d"), ("i2", "c"), ("i3", "b")}


def test_study_weights(spark):
    df = spark.createDataFrame(
        [("i1", "s1"), ("i2", "s1"), ("i3", "s2")], "item string, study string"
    )
    got = {r["item"]: r["weight"] for r in study_weights(df).collect()}
    assert got == {"i1": 0.5, "i2": 0.5, "i3": 1.0}


@pytest.fixture(scope="module")
def trained(spark, onto, label_edges):
    from cello_spark.sources.fixtures import make_documents

    _, feats, truth = make_documents(onto, n_docs=300, seed=7)
    # multi-label sets = true label + its label-DAG ancestors
    anc = {}
    for c, p in label_edges:
        anc.setdefault(c, set()).add(p)

    def lineage(lab):
        out, frontier = {lab}, set(anc.get(lab, ()))
        while frontier:
            out |= frontier
            frontier = {g for f in frontier for g in anc.get(f, ())} - out
        return out

    rows = [
        (r.doc_id, l)
        for r in truth.itertuples(index=False)
        for l in lineage(r.true_label)
    ]
    features = spark.createDataFrame(
        feats.rename(columns={"doc_id": "item"})
    )
    labels_long = spark.createDataFrame(rows, "item string, label string")
    weights = fit_hierarchical_lr(
        features, labels_long, label_edges, l2=1.0, n_iter=6
    )
    return feats, truth, labels_long, weights, lineage


def test_fit_separates_labels(trained, label_edges):
    feats, truth, labels_long, weights, lineage = trained
    X = np.stack([np.asarray(v) for v in feats["features"]])
    W = np.stack([np.asarray(c) for c in weights.coef])
    b = weights.intercept.to_numpy()
    P = 1.0 / (1.0 + np.exp(-(X @ W.T + b)))
    labels = weights.label.tolist()
    truth_sets = {
        r.doc_id: lineage(r.true_label) for r in truth.itertuples(index=False)
    }
    Y = np.array(
        [[l in truth_sets[d] for l in labels] for d in feats["doc_id"]]
    )
    nontrivial = ~weights.is_trivial.to_numpy()
    acc = ((P > 0.5) == Y)[:, nontrivial].mean()
    assert acc > 0.9, f"training accuracy {acc:.3f}"
    # root label has every item positive → no negatives → trivial
    assert weights.is_trivial.any()


def test_fit_deterministic(spark, trained, label_edges):
    feats, truth, labels_long, weights, lineage = trained
    features = spark.createDataFrame(feats.rename(columns={"doc_id": "item"}))
    again = fit_hierarchical_lr(
        features, labels_long, label_edges, l2=1.0, n_iter=6
    )
    np.testing.assert_array_equal(
        np.stack(weights.coef.map(np.asarray)), np.stack(again.coef.map(np.asarray))
    )
    np.testing.assert_array_equal(
        weights.intercept.to_numpy(), again.intercept.to_numpy()
    )


def test_trained_model_feeds_linking(spark, trained, onto, label_edges):
    """End-to-end: fitted weights drop into LinkingModel and recover
    the true most-specific label for most docs."""
    from cello_spark.operators.linking import LinkingModel, link_documents
    from cello_spark.sources.fixtures import make_thresholds

    feats, truth, _, weights, _ = trained
    thresholds = make_thresholds(onto)
    model = LinkingModel.from_tables(weights, thresholds, label_edges)
    linked = link_documents(spark.createDataFrame(feats), model).toPandas()
    merged = linked.merge(truth, on="doc_id")
    hit = (merged.most_specific == merged.true_label).mean()
    assert hit > 0.75, f"most-specific recovery {hit:.3f}"


def test_model_save_load_roundtrip(tmp_path, trained):
    import numpy as np
    from cello_spark.operators.training import load_model, save_model

    _, _, _, weights, _ = trained
    p = str(tmp_path / "model.parquet")
    save_model(weights, p)
    back = load_model(p)
    assert back.label.tolist() == weights.label.tolist()
    np.testing.assert_array_equal(
        np.stack(back.coef.map(np.asarray)), np.stack(weights.coef.map(np.asarray))
    )
    assert back.is_trivial.tolist() == weights.is_trivial.tolist()


def test_fit_empty_training_frame_raises(spark):
    """Degenerate input: features ⋈ labels empty → clear ValueError,
    not a TypeError from first() returning None."""
    features = spark.createDataFrame(
        [("x1", [0.0, 1.0])], "item string, features array<double>"
    )
    labels_long = spark.createDataFrame(
        [("other", "a")], "item string, label string"
    )
    with pytest.raises(ValueError, match="empty training frame"):
        fit_hierarchical_lr(features, labels_long, [], n_iter=1)


def test_fit_perfect_separation_finite(spark):
    """Perfectly separated 1-D data must not crash on a singular
    Newton system (unregularized bias row) — the lstsq fallback keeps
    every step finite, and the fit still separates the classes."""
    rows = [(f"p{i}", [float(10 + i)]) for i in range(5)] + [
        (f"n{i}", [float(-10 - i)]) for i in range(5)
    ]
    features = spark.createDataFrame(rows, "item string, features array<double>")
    labels_long = spark.createDataFrame(
        [(f"p{i}", "pos") for i in range(5)]
        + [(f"n{i}", "neg") for i in range(5)],
        "item string, label string",
    )
    w = fit_hierarchical_lr(features, labels_long, [], l2=1e-6, n_iter=25)
    W = np.stack(w.coef.map(np.asarray))
    b = w.intercept.to_numpy()
    assert np.isfinite(W).all() and np.isfinite(b).all()
    row = w[w.label == "pos"].iloc[0]
    p_pos = 1.0 / (1.0 + np.exp(-(10.0 * row.coef[0] + row.intercept)))
    p_neg = 1.0 / (1.0 + np.exp(-(-10.0 * row.coef[0] + row.intercept)))
    assert p_pos > 0.9 and p_neg < 0.1


def test_per_label_study_weights_vs_numpy_oracle(spark):
    """M9 exact semantics (ensemble_binary_classifiers.py:238-251):
    item weight for label l = 1/|same-study items within l's OWN
    pos+neg set|. Construct a case where an ambiguous item is excluded
    from one label's set but not another's — so the per-label group
    sizes genuinely differ from the global ones — and check the fitted
    coefficients against an independent full-batch numpy Newton fit."""
    rng = np.random.default_rng(0)
    edges = [("B", "A"), ("C", "A")]  # A is parent of leaves B, C
    n, d = 40, 3
    X = rng.normal(size=(n, d))
    items = [f"i{k}" for k in range(n)]
    # half the items are labeled B, half C; every item carries A too
    true_leaf = ["B" if k % 2 == 0 else "C" for k in range(n)]
    # items 0-9 are "coarse": labeled ONLY A (ms label = A) — they are
    # ambiguous negatives for B and C (A is an ancestor) and get
    # excluded from both leaf sets, but stay in A's own set
    labels_rows, studies = [], []
    for k, it in enumerate(items):
        if k < 10:
            labels_rows.append((it, "A"))
        else:
            labels_rows += [(it, "A"), (it, true_leaf[k])]
        studies.append((it, f"s{k % 3}"))

    features = spark.createDataFrame(
        [(it, X[k].tolist()) for k, it in enumerate(items)],
        "item string, features array<double>",
    )
    labels_long = spark.createDataFrame(labels_rows, "item string, label string")
    item_study = spark.createDataFrame(studies, "item string, study string")
    got = fit_hierarchical_lr(
        features, labels_long, edges, item_study=item_study, l2=1.0, n_iter=6
    )

    # ---- independent numpy oracle (full batch, fresh code) ----------
    labels = ["A", "B", "C"]
    anc = {"B": {"A"}, "C": {"A"}, "A": set()}
    lab_sets = {}
    ms_sets = {}
    for it, l in labels_rows:
        lab_sets.setdefault(it, set()).add(l)
    for it, ls in lab_sets.items():
        ms_sets[it] = {l for l in ls if not any(l in anc[o] for o in ls)}
    study_of = dict(studies)
    Ln = len(labels)
    y = np.zeros((n, Ln), bool)
    mask = np.zeros((n, Ln), bool)
    for k, it in enumerate(items):
        for j, l in enumerate(labels):
            pos = any(l == o or l in anc[o] for o in lab_sets[it])
            # ambiguous: some most-specific label of the item is a
            # STRICT ancestor of l (the item might belong to l)
            ambig = any(m != l and m in anc[l] for m in ms_sets[it])
            y[k, j] = pos
            mask[k, j] = pos or not ambig
    c_pos = (y & mask).sum(0).astype(float)
    c_neg = (~y & mask).sum(0).astype(float)
    tot = c_pos + c_neg
    wp = np.where(c_pos > 0, tot / (2 * np.maximum(c_pos, 1e-12)), 0.0)
    wn = np.where(c_neg > 0, tot / (2 * np.maximum(c_neg, 1e-12)), 0.0)
    # per-label group sizes over each label's own masked set
    g = {}
    for j in range(Ln):
        for k, it in enumerate(items):
            if mask[k, j]:
                g[(j, study_of[it])] = g.get((j, study_of[it]), 0) + 1
    w_item = np.array(
        [[1.0 / g[(j, study_of[it])] if mask[k, j] else 0.0
          for j in range(Ln)] for k, it in enumerate(items)]
    )
    Xb = np.concatenate([X, np.ones((n, 1))], axis=1)
    W = np.zeros((Ln, d)); b = np.zeros(Ln)
    trivial = c_neg <= 0
    for _ in range(6):
        P = 1 / (1 + np.exp(-(X @ W.T + b)))
        cw = np.where(y, wp, wn) * w_item * mask
        R = (P - y.astype(float)) * cw
        Sm = P * (1 - P) * cw
        for j in range(Ln):
            if trivial[j]:
                continue
            grad = Xb.T @ R[:, j]
            grad[:-1] += 1.0 * W[j]
            H = (Xb * Sm[:, j][:, None]).T @ Xb + np.diag([1.0] * d + [0.0])
            delta = np.linalg.solve(H, grad)
            W[j] -= delta[:-1]; b[j] -= delta[-1]

    got = got.sort_values("label").reset_index(drop=True)
    np.testing.assert_allclose(
        np.stack(got.coef.map(np.asarray)), W, atol=1e-6
    )
    np.testing.assert_allclose(got.intercept.to_numpy(), b, atol=1e-6)
    # sanity: the scenario actually exercises differing group sizes —
    # A's masked set (40 items) vs B/C's (30 items)
    assert g[(0, "s0")] != g[(1, "s0")]


def test_most_specific_labels_no_edges_is_identity(spark):
    """With no hierarchy nothing dominates — every label survives,
    including one that collides with any internal sentinel."""
    from cello_spark.operators.training import most_specific_labels

    rows = [("i1", "A"), ("i1", "__none__"), ("i2", "B")]
    labels = spark.createDataFrame(rows, "item string, label string")
    got = {
        (r.item, r.ms_label)
        for r in most_specific_labels(labels, []).collect()
    }
    assert got == {("i1", "A"), ("i1", "__none__"), ("i2", "B")}
