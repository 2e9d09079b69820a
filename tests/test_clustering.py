"""M12 clustering analog (deterministic Lloyd KMeans) vs a pure-numpy
oracle, plus the auto-clustering gate and the clustered-linking wiring
(the reference's leiden→predict-per-cluster→map-back flow,
cello/cello_predict.py:239-254, cello/cello.py:340-362)."""

import numpy as np
import pytest

from cello_spark.operators.clustering import (
    cluster_documents,
    kmeans_assign,
    kmeans_fit,
)


def _blobs(n_per: int = 40, d: int = 4, seed: int = 11):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[8.0] * d, [-8.0] * d, [8.0] * (d // 2) + [-8.0] * (d - d // 2)]
    )
    X = np.concatenate(
        [c + rng.standard_normal((n_per, d)) for c in centers]
    )
    ids = [f"doc{i:04d}" for i in range(len(X))]
    return ids, X


def _oracle_lloyd(ids, X, k, n_iter):
    """Same semantics as kmeans_fit: seeded k-means++ init over the
    id-ordered sample, ties → lowest centroid, empty cluster keeps its
    centroid."""
    from cello_spark.operators.clustering import kmeanspp_init

    order = np.argsort(np.asarray(ids))
    C = kmeanspp_init(X[order].astype(np.float64), k)
    for _ in range(n_iter):
        d2 = (
            (X * X).sum(1)[:, None]
            + (C * C).sum(1)[None, :]
            - 2.0 * X @ C.T
        )
        a = np.argmin(d2, axis=1)
        C_new = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                C_new[j] = X[m].mean(axis=0)
        if np.allclose(C_new, C, rtol=0.0, atol=1e-12):
            return C_new
        C = C_new
    return C


def test_kmeans_matches_numpy_oracle(spark):
    ids, X = _blobs()
    df = spark.createDataFrame(
        [(i, x.tolist()) for i, x in zip(ids, X)],
        "item string, features array<double>",
    )
    C = kmeans_fit(df, k=3, n_iter=15)
    C_oracle = _oracle_lloyd(ids, X, 3, 15)
    np.testing.assert_allclose(C, C_oracle, atol=1e-9)
    got = {
        r["item"]: r["cluster"] for r in kmeans_assign(df, C).collect()
    }
    d2 = (
        (X * X).sum(1)[:, None]
        + (C_oracle * C_oracle).sum(1)[None, :]
        - 2.0 * X @ C_oracle.T
    )
    want = np.argmin(d2, axis=1)
    assert [got[i] for i in ids] == list(want)
    # the three planted blobs are recovered exactly
    for s in range(3):
        blk = {got[i] for i in ids[s * 40 : (s + 1) * 40]}
        assert len(blk) == 1


def test_kmeans_deterministic(spark):
    """Bit-identical rerun on the same partitioning; across different
    partitionings centroids agree to round-off and the assignments of
    well-separated blobs coincide exactly."""
    ids, X = _blobs(seed=23)
    rows = [(i, x.tolist()) for i, x in zip(ids, X)]

    def fit(parts):
        df = spark.createDataFrame(
            rows, "item string, features array<double>"
        ).repartition(parts)
        return df, kmeans_fit(df, k=3)

    df1, a = fit(7)
    _, a2 = fit(7)
    np.testing.assert_array_equal(a, a2)  # same partitioning → bitwise
    df13, b = fit(13)
    np.testing.assert_allclose(a, b, rtol=1e-9)
    got_a = {r["item"]: r["cluster"] for r in kmeans_assign(df1, a).collect()}
    got_b = {r["item"]: r["cluster"] for r in kmeans_assign(df13, b).collect()}
    assert got_a == got_b


def test_cluster_documents_gate(spark):
    ids, X = _blobs(n_per=10)  # 30 items ≤ min_items=50 → None
    df = spark.createDataFrame(
        [(i, x.tolist()) for i, x in zip(ids, X)],
        "item string, features array<double>",
    )
    assert cluster_documents(df, k=3, min_items=50) is None
    out = cluster_documents(df, k=3, min_items=10)
    assert out is not None and out.count() == 30


def test_kmeans_feeds_clustered_linking(spark, small_world, label_edges):
    """End-to-end M12→J3/O3: auto-cluster the fixture docs, link per
    cluster, map back — every member of a cluster carries its
    cluster's decision."""
    from cello_spark.operators.linking import (
        LinkingModel,
        link_documents_clustered,
    )

    features = spark.createDataFrame(small_world["features"])
    n = features.count()
    clusters = cluster_documents(
        features, k=8, min_items=50, id_col="doc_id"
    ).withColumnRenamed("item", "doc_id")
    model = LinkingModel.from_tables(
        small_world["weights"], small_world["thresholds"], label_edges
    )
    linked = link_documents_clustered(features, clusters, model).toPandas()
    assert len(linked) == n
    per = linked.groupby("cluster").most_specific.nunique()
    assert (per == 1).all()
