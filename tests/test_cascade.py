"""CLR cascade marginals (M7), OneNN (M8), metrics (A8) vs numpy/python
oracles."""

import math

import numpy as np
import pandas as pd

from cello_spark.operators.cascade import clr_marginals, closure_with_self
from cello_spark.operators.metrics import (
    confusion_matrix,
    per_class_report,
    triple_pr,
)
from cello_spark.operators.similarity import one_nn


def test_clr_marginals(spark):
    #   a ← b ← d ;  a ← c
    closure = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "b"), ("d", "a")],
        "descendant string, ancestor string",
    )
    cws = closure_with_self(closure)
    probs = [
        ("i1", "a", 0.9), ("i1", "b", 0.8), ("i1", "c", 0.5), ("i1", "d", 0.6),
        ("i2", "a", 1.0), ("i2", "b", 0.2), ("i2", "c", 0.0), ("i2", "d", 0.5),
    ]
    cond = spark.createDataFrame(probs, "item string, label string, prob double")
    got = {
        (r["item"], r["label"]): r["marginal"]
        for r in clr_marginals(cond, cws).collect()
    }
    # oracle: product over ancestors∪self
    p = {(i, l): v for i, l, v in probs}
    anc = {"a": ["a"], "b": ["a", "b"], "c": ["a", "c"], "d": ["a", "b", "d"]}
    for (i, l), v in got.items():
        want = math.prod(p[(i, a)] for a in anc[l])
        assert abs(v - want) < 1e-12, (i, l, v, want)
    assert got[("i2", "c")] == 0.0  # zero conditional → zero marginal


def test_one_nn_euclidean_and_correlation(spark):
    rng = np.random.default_rng(5)
    R = rng.standard_normal((4, 8))
    X = np.concatenate([R + 0.01 * rng.standard_normal((4, 8)), rng.standard_normal((3, 8))])
    items = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    ref = pd.DataFrame({"ref_id": np.arange(4), "embedding": list(R)})
    for metric in ("euclidean", "correlation", "jensen_shannon"):
        got = {
            r["id"]: (r["ref_id"], r["distance"])
            for r in one_nn(items, ref, metric=metric).collect()
        }
        # numpy oracle
        for i in range(len(X)):
            if metric == "euclidean":
                D = np.linalg.norm(R - X[i], axis=1)
            elif metric == "correlation":
                xc = X[i] - X[i].mean()
                D = np.array(
                    [
                        1
                        - (xc @ (r - r.mean()))
                        / (np.linalg.norm(xc) * np.linalg.norm(r - r.mean()) + 1e-12)
                        for r in R
                    ]
                )
            else:
                def dist(a):
                    a = a - a.min(); a = a / a.sum()
                    return a

                def H(a):
                    t = np.where(a > 0, a * np.log(a), 0.0)
                    return -t.sum()

                px = dist(X[i])
                D = np.sqrt(
                    np.maximum(
                        np.array(
                            [
                                H(0.5 * (px + dist(r)))
                                - 0.5 * (H(px) + H(dist(r)))
                                for r in R
                            ]
                        ),
                        0.0,
                    )
                )
            j = int(np.argmin(D))
            assert got[i][0] == j, (metric, i)
            assert abs(got[i][1] - D[j]) < 1e-9
        # the first four items are perturbed copies of the refs
        if metric == "euclidean":
            assert all(got[i][0] == i for i in range(4))


def test_triple_pr(spark):
    got = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("x", "p", "y")],
        "subj string, pred string, obj string",
    )
    want = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("q", "p", "r")],
        "subj string, pred string, obj string",
    )
    row = triple_pr(got, want).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 1)
    assert abs(row["precision"] - 2 / 3) < 1e-12
    assert abs(row["recall"] - 2 / 3) < 1e-12


def test_per_class_report_and_confusion(spark):
    pairs = spark.createDataFrame(
        [("i1", "a", "a"), ("i2", "a", "b"), ("i3", "b", "b"), ("i4", "b", "b")],
        "item string, truth string, pred string",
    )
    rep = {r["label"]: r for r in per_class_report(pairs).collect()}
    assert rep["a"]["support"] == 2 and rep["a"]["tp"] == 1
    assert abs(rep["a"]["precision"] - 1.0) < 1e-12  # 1 predicted 'a', correct
    assert abs(rep["a"]["recall"] - 0.5) < 1e-12
    assert abs(rep["b"]["precision"] - 2 / 3) < 1e-12
    assert abs(rep["b"]["recall"] - 1.0) < 1e-12
    cm = {(r["truth"], r["pred"]): r["n"] for r in confusion_matrix(pairs).collect()}
    assert cm == {("a", "a"): 1, ("a", "b"): 1, ("b", "b"): 2}
