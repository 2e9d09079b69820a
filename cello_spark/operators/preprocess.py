"""M1 Scale + M2 PCA preprocessors with coefficient back-projection
(M10 preprocessor chain).

Reference semantics:
  - Scale = sklearn StandardScaler (population std, ddof=0; zero-std
    features get scale 1.0) — reference cello/models/scale.py:28-54.
  - PCA = sklearn decomposition.PCA: center on the fitted mean, project
    onto the top-k right singular vectors — reference
    cello/models/pca.py:29-57; CellO fits 3000 components ahead of the
    classifier (cello/cello.py:71-76) and every predict path runs the
    preprocessor chain before scoring (models/model.py:39-91).
  - Back-projection: a linear classifier fitted in PCA space is mapped
    back to raw-feature space with components.T @ coefs — reference
    models/isotonic_regression.py:139-163. Here generalized: every
    preprocessor is an affine map x -> A x + c, the chain composes into
    ONE affine map, and (affine ∘ linear-model) collapses into a
    raw-space (W', b'). So at predict time preprocessing costs ZERO
    extra passes — it folds into the scoring matmul inside
    `link_documents`.

Spark-first fit strategy: both fits are ONE map-side-only pass over the
features table (mapInPandas emitting per-partition moment partials:
count, Σx, and for PCA the Gram Σ x xᵀ), combined on the driver in
partition-id order (bit-deterministic), then a small driver-side eigh.
No shuffle touches the data; nothing is collected except
O(n_features²) partials. This is the same partial-aggregation shape as
`fit_hierarchical_lr` and survives 100× row scale unchanged — the only
ceiling is n_features² driver memory (72 MB at the reference's 3000
genes), which matches the reference's own driver-side randomized SVD.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


class AffineTransform:
    """x -> x @ A.T + c, the collapsed form of a preprocessor chain."""

    def __init__(self, A: np.ndarray, c: np.ndarray) -> None:
        self.A = np.asarray(A, dtype=np.float64)
        self.c = np.asarray(c, dtype=np.float64)

    def apply(self, X: np.ndarray) -> np.ndarray:
        return X @ self.A.T + self.c

    def compose(self, inner: "AffineTransform") -> "AffineTransform":
        """self ∘ inner: first inner, then self."""
        return AffineTransform(self.A @ inner.A, self.A @ inner.c + self.c)


class ScaleModel:
    """Fitted z-score scaler (population std; zero-std -> 1.0)."""

    def __init__(self, mean: np.ndarray, scale: np.ndarray, with_std: bool = True):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.scale = np.asarray(scale, dtype=np.float64)
        self.with_std = with_std

    def as_affine(self) -> AffineTransform:
        inv = 1.0 / self.scale
        return AffineTransform(np.diag(inv), -self.mean * inv)


class PCAModel:
    """Fitted PCA: components (k, n_features) rows = principal axes,
    mean = fitted center. Sign convention: each component is flipped so
    its max-|coordinate| entry is positive (deterministic analog of
    sklearn's svd_flip)."""

    def __init__(self, mean: np.ndarray, components: np.ndarray,
                 explained_variance: np.ndarray):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)
        self.explained_variance = np.asarray(explained_variance, dtype=np.float64)

    def as_affine(self) -> AffineTransform:
        return AffineTransform(self.components, -self.components @ self.mean)


def chain_affine(models: Sequence[ScaleModel | PCAModel]) -> AffineTransform:
    """Collapse an ordered preprocessor chain into one affine map."""
    if not models:
        raise ValueError("empty preprocessor chain")
    aff = models[0].as_affine()
    for m in models[1:]:
        aff = m.as_affine().compose(aff)
    return aff


def back_project(
    W: np.ndarray,  # (n_labels, k) coefficients in preprocessed space
    b: np.ndarray,  # (n_labels,)
    models: Sequence[ScaleModel | PCAModel],
) -> tuple[np.ndarray, np.ndarray]:
    """Collapse (preprocessor chain ∘ linear model) into raw-space
    (W', b'): score(x) = W (A x + c) + b = (W A) x + (W c + b).
    Exact — no approximation (reference isotonic_regression.py:139-163
    is the PCA-only special case)."""
    aff = chain_affine(models)
    W = np.asarray(W, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return W @ aff.A, W @ aff.c + b


# ---------------------------------------------------------------------------
# distributed moment pass
# ---------------------------------------------------------------------------


def _moment_partials(
    features: DataFrame, second: str | None
) -> tuple[int, np.ndarray, np.ndarray | None]:
    """One map-side pass: per-partition (count, Σx, second-moment)
    partials, combined on the driver in partition-id order
    (bit-deterministic for a fixed input layout).

    second: "gram" ships the full Σ x xᵀ (d², needed by PCA), "diag"
    ships only Σ x² per column (d doubles — all a scaler needs; the
    full Gram would be O(rows·d²) matmul CPU and a d²-double payload
    per partition, 72 MB at d=3000), None ships neither."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        n = 0
        s = None
        g = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["features"]]
            )
            n += len(X)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            if second == "gram":
                gg = X.T @ X
                g = gg if g is None else g + gg
            elif second == "diag":
                dd = (X * X).sum(axis=0)
                g = dd if g is None else g + dd
        if n == 0:
            return
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "pid": [pid],
                "n": [n],
                "s": [s.tolist()],
                "g": [g.ravel().tolist() if second else []],
            }
        )

    parts = features.select("features").mapInPandas(
        run, "pid int, n long, s array<double>, g array<double>"
    )
    rows = sorted(parts.collect(), key=lambda r: r["pid"])
    if not rows:
        raise ValueError("cannot fit preprocessor on an empty features table")
    n_total = sum(r["n"] for r in rows)
    s_total = np.zeros(len(rows[0]["s"]), dtype=np.float64)
    for r in rows:
        s_total += np.asarray(r["s"], dtype=np.float64)
    g_total = None
    if second:
        d = len(s_total)
        size = d * d if second == "gram" else d
        g_total = np.zeros(size, dtype=np.float64)
        for r in rows:
            g_total += np.asarray(r["g"], dtype=np.float64)
        if second == "gram":
            g_total = g_total.reshape(d, d)
    return n_total, s_total, g_total


def fit_scale(features: DataFrame, with_std: bool = True) -> ScaleModel:
    """M1: fit a z-score scaler in one map-side pass + one tiny
    variance pass folded into the same Gram partials (variance =
    diagonal of the covariance). `features` = (..., features:
    array<double>)."""
    n, s, sq = _moment_partials(features, second="diag")
    mean = s / n
    ex2 = sq / n
    var = np.maximum(ex2 - mean**2, 0.0)
    # cancellation floor: one-pass E[x²]−mean² leaves fp noise of order
    # eps·E[x²] for (near-)constant columns of large magnitude, which
    # would defeat the zero-variance rule below and turn z-scores into
    # noise/noise. Anything within ~100 ulps of full cancellation IS
    # zero variance (a real relative std this small is below float64's
    # resolving power in one pass anyway).
    var[var <= (ex2 + mean**2) * 1e-13] = 0.0
    if with_std:
        std = np.sqrt(var)
        std[std == 0.0] = 1.0  # sklearn StandardScaler zero-variance rule
    else:
        std = np.ones_like(mean)
    return ScaleModel(mean=mean, scale=std, with_std=with_std)


def fit_pca(features: DataFrame, n_components: int) -> PCAModel:
    """M2: fit PCA from the covariance eigendecomposition. One
    map-side Gram pass; driver-side eigh of the (n_features²)
    covariance; top-k eigenvectors with the deterministic sign
    convention. Equivalent to sklearn PCA (centered SVD) up to the
    sign convention for distinct eigenvalues."""
    n, s, g = _moment_partials(features, second="gram")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize against fp drift
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: max-|coordinate| entry positive (ties -> the
    # first such index, which argmax already gives)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
    )


def transform_features(
    features: DataFrame, models: Sequence[ScaleModel | PCAModel]
) -> DataFrame:
    """Apply a preprocessor chain to (item/doc_id, features) — the
    chain is collapsed to ONE affine map first, so this is a single
    broadcast-matmul mapInPandas pass regardless of chain length.
    Output schema: same id column, features: array<double> (length =
    output dim of the chain)."""
    aff = chain_affine(models)
    spark = features.sparkSession
    bc = spark.sparkContext.broadcast((aff.A, aff.c))
    id_col = [c for c, _ in features.dtypes if c != "features"]
    id_schema = ", ".join(
        f"{c} {t}" for c, t in features.dtypes if c != "features"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        A, c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["features"]]
            )
            Y = X @ A.T + c
            out = pdf[id_col].copy()
            out["features"] = list(Y)
            yield out

    return features.mapInPandas(run, f"{id_schema}, features array<double>")
