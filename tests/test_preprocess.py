"""M1 Scale / M2 PCA / M10 chain + back-projection tests.

The numpy oracles here are written from the published sklearn
definitions (StandardScaler: population-std z-score with zero-std -> 1;
PCA: centered SVD) — independent of the engine's moment-pass/eigh
implementation."""

from __future__ import annotations

import numpy as np
import pytest

from cello_spark.operators.preprocess import (
    back_project,
    chain_affine,
    fit_pca,
    fit_scale,
    transform_features,
)


def _rand_features(rng, n_rows=80, d=7):
    X = rng.normal(size=(n_rows, d)) * rng.uniform(0.5, 3.0, size=d)
    X += rng.uniform(-2, 2, size=d)
    X[:, 2] = 1.5  # a zero-variance feature (StandardScaler edge rule)
    return X


def _feat_df(spark, X):
    return spark.createDataFrame(
        [(f"d{i:04d}", row.tolist()) for i, row in enumerate(X)],
        "doc_id string, features array<double>",
    ).repartition(5)


def _numpy_pca_components(X, k):
    """Oracle: centered SVD (sklearn PCA definition), with the engine's
    documented sign convention applied so signed comparison is valid."""
    Xc = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    comps = vt[:k]
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps


def test_fit_scale_matches_numpy_standard_scaler(spark):
    rng = np.random.default_rng(7)
    X = _rand_features(rng)
    m = fit_scale(_feat_df(spark, X))
    np.testing.assert_allclose(m.mean, X.mean(axis=0), atol=1e-9)
    std = X.std(axis=0)  # ddof=0, the StandardScaler definition
    std_expected = np.where(std == 0.0, 1.0, std)
    np.testing.assert_allclose(m.scale, std_expected, atol=1e-9)
    # transform parity through the Spark pass
    out = (
        transform_features(_feat_df(spark, X), [m])
        .orderBy("doc_id")
        .toPandas()
    )
    got = np.stack(out["features"].to_numpy())
    want = (X - m.mean) / m.scale
    np.testing.assert_allclose(got, want, atol=1e-9)
    # the zero-variance column passes through centered, not NaN
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[:, 2], 0.0, atol=1e-12)


def test_fit_pca_matches_numpy_svd(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(120, 6)) @ rng.normal(size=(6, 6))  # correlated
    k = 4
    m = fit_pca(_feat_df(spark, X), n_components=k)
    want = _numpy_pca_components(X, k)
    np.testing.assert_allclose(np.abs(m.components), np.abs(want), atol=1e-7)
    np.testing.assert_allclose(m.components, want, atol=1e-7)
    # explained variance descending and matching the centered covariance
    assert (np.diff(m.explained_variance) <= 1e-12).all()
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    np.testing.assert_allclose(
        m.explained_variance,
        np.sort(np.linalg.eigvalsh(cov))[::-1][:k],
        atol=1e-9,
    )
    # transform parity: projection of centered data onto components
    out = (
        transform_features(_feat_df(spark, X), [m]).orderBy("doc_id").toPandas()
    )
    got = np.stack(out["features"].to_numpy())
    np.testing.assert_allclose(got, Xc @ want.T, atol=1e-7)


def test_chain_scale_then_pca_equals_stepwise(spark):
    rng = np.random.default_rng(13)
    X = _rand_features(rng, n_rows=100, d=6)
    df = _feat_df(spark, X)
    scale = fit_scale(df)
    Z = (X - scale.mean) / scale.scale
    pca = fit_pca(_feat_df(spark, Z), n_components=3)
    # chained one-pass transform == stepwise numpy chain
    out = (
        transform_features(df, [scale, pca]).orderBy("doc_id").toPandas()
    )
    got = np.stack(out["features"].to_numpy())
    want = (Z - pca.mean) @ pca.components.T
    np.testing.assert_allclose(got, want, atol=1e-8)
    # collapsed affine == stepwise affine on raw numpy
    aff = chain_affine([scale, pca])
    np.testing.assert_allclose(aff.apply(X), want, atol=1e-8)


def test_back_projection_scores_raw_features_exactly():
    rng = np.random.default_rng(17)
    X = rng.normal(size=(50, 8))
    from cello_spark.operators.preprocess import PCAModel, ScaleModel

    scale = ScaleModel(mean=X.mean(0), scale=np.maximum(X.std(0), 1e-9))
    Z = (X - scale.mean) / scale.scale
    comps = _numpy_pca_components(Z, 4)
    pca = PCAModel(mean=Z.mean(0), components=comps,
                   explained_variance=np.ones(4))
    Y = (Z - pca.mean) @ comps.T
    W = rng.normal(size=(5, 4))
    b = rng.normal(size=5)
    W2, b2 = back_project(W, b, [scale, pca])
    np.testing.assert_allclose(X @ W2.T + b2, Y @ W.T + b, atol=1e-10)


def test_linking_model_with_preprocessors_parity(spark, onto, small_world, label_edges):
    """End-to-end M10: fit the chain on fixture features, train-space
    model back-projected == transform-then-score, through the real
    link_documents pass."""
    from cello_spark.operators.linking import LinkingModel, link_documents

    feats = spark.createDataFrame(small_world["features"]).limit(60).cache()
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in feats.toPandas()["features"]]
    )
    scale = fit_scale(feats)
    Z = (X - scale.mean) / scale.scale
    pca = fit_pca(_feat_df(spark, Z), n_components=5)
    rng = np.random.default_rng(23)
    labels = sorted(onto.labels)
    W = rng.normal(size=(len(labels), 5))
    b = rng.normal(size=len(labels))
    thr = np.full(len(labels), 0.5)
    model_pca = LinkingModel(
        labels=labels, W=W, b=b,
        trivial=np.zeros(len(labels), dtype=bool),
        thresholds=thr, label_edges=label_edges,
    )
    model_raw = model_pca.with_preprocessors([scale, pca])
    # path A: preprocess in Spark, score in PCA space
    a = (
        link_documents(transform_features(feats, [scale, pca]), model_pca)
        .orderBy("doc_id")
        .toPandas()
    )
    # path B: back-projected model over raw features (zero extra passes)
    bdf = link_documents(feats, model_raw).orderBy("doc_id").toPandas()
    Pa = np.stack(a["probs"].to_numpy())
    Pb = np.stack(bdf["probs"].to_numpy())
    np.testing.assert_allclose(Pa, Pb, atol=1e-5)
    np.testing.assert_array_equal(
        np.stack(a["bins"].to_numpy()), np.stack(bdf["bins"].to_numpy())
    )
    # the two paths agree to ~1e-12 in scores; Dykstra's averaging makes
    # EXACT cross-label ties common, and argmax under fp noise may break
    # those differently. Any selection mismatch must therefore be an
    # exact tie between the two selected labels' reconciled probs.
    lab_pos = {l: i for i, l in enumerate(labels)}
    for i, (la, lb) in enumerate(
        zip(a["most_specific"].tolist(), bdf["most_specific"].tolist())
    ):
        if la != lb:
            pa = Pa[i, lab_pos[la]]
            pb = Pa[i, lab_pos[lb]]
            assert abs(pa - pb) < 1e-6, (
                f"row {i}: selections {la}/{lb} differ without a tie "
                f"({pa} vs {pb})"
            )


def test_empty_features_raises(spark):
    df = spark.createDataFrame([], "doc_id string, features array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_scale(df)


def test_fit_scale_constant_large_column_zero_variance(spark):
    """A constant column of large magnitude must hit the zero-variance
    rule (scale=1, centered to 0) — the one-pass E[x²]−mean² leaves fp
    noise that would otherwise produce garbage z-scores."""
    import numpy as np

    from cello_spark.operators.preprocess import fit_scale

    rows = [(f"d{i}", [1e6, float(i)]) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, features array<double>")
    m = fit_scale(df)
    assert m.scale[0] == 1.0  # zero-variance rule fired despite noise
    assert m.mean[0] == pytest.approx(1e6)
    # the genuinely varying column keeps its real std
    assert m.scale[1] == pytest.approx(np.std(np.arange(50.0)), rel=1e-9)
