"""Similarity search over embedding columns (`array<float>`).

- `cosine_topk_bruteforce`: exact top-k — broadcast the (small) query
  set against the corpus; dot products computed JVM-side with
  zip_with/aggregate inside codegen; global top-k via a per-query
  window. The corpus side never shuffles for scoring (only the final
  per-query top-k shuffles, keyed by query id — tiny).
- `ivf_build` / `ivf_topk`: IVF (inverted-file) scale path — corpus
  vectors are assigned once to their nearest of C centroids (default:
  spherical-k-means fitted on the corpus via the shuffle-free Lloyd
  pass in operators/clustering.py; `method="seeded"` keeps the random
  fallback); queries probe only the closest `n_probe` centroid
  partitions. At 100 TB the assignment is a narrow one-pass job and
  search touches ~n_probe/C of the data.
- `embedding_near_dup_pairs`: embedding-cosine near-duplicate pairs via
  the same centroid bucketing (pairs only form within a bucket).

The numeric kernels (centroid assignment) run as Arrow-batched
pandas UDFs — matrix math, never per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T

from cello_spark.partitioning import ensure_min_partitions


def _dot(a, b):
    # accumulate in float64 — float32 embeddings would otherwise lose
    # precision vs any double-precision oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(a, b):
    """JVM-side cosine similarity of two array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,  # (vec_id, embedding)
    queries: DataFrame,  # (query_id, embedding) — SMALL (broadcast)
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query. Output
    (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    vec_id asc for determinism."""
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = ensure_min_partitions(corpus).crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("embedding"), F.col("q_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def seeded_centroids(dim: int, n_centroids: int, seed: int = 42) -> np.ndarray:
    """Deterministic unit-norm centroids. (Fallback when the corpus is
    too small or too skewed to k-means; `kmeans_centroids` is the
    default quality path.)"""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_centroids, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    seed: int = 42,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 10,
) -> np.ndarray:
    """Spherical-k-means centroids, trained on a deterministic sample
    (operators/clustering.py kmeans_fit_sample — the faiss-style IVF
    recipe: codebook quality saturates long before the sample does, so
    training never scans the full corpus; assignment does, once).
    Embeddings are L2-normalized driver-side and the centroids
    re-normalized to the unit sphere so nearest-centroid-by-dot ==
    nearest-by-cosine."""
    from cello_spark.operators.clustering import kmeans_fit_sample

    C = kmeans_fit_sample(
        corpus,
        k=n_centroids,
        n_iter=n_iter,
        id_col=id_col,
        features_col=emb_col,
        seed=seed,
        normalize=True,
    )
    return C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)


def _assign_udf(
    spark, centroids: np.ndarray, emb_col: str, out_col: str, n_assign: int = 1
):
    """n_assign=1: one row per vector, nearest centroid. n_assign>1:
    the vector is REPLICATED into its n_assign nearest buckets
    (multi-assignment — border vectors exist in every bucket they are
    close to, the standard recall lever for bucketed near-dup; costs
    n_assign× the bucket rows, still linear)."""
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        n = min(n_assign, len(C))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            sims = Xn @ C.T
            if n == 1:
                pdf = pdf.copy()
                pdf[out_col] = np.argmax(sims, axis=1).astype(np.int32)
                yield pdf
                continue
            # top-n centroids per row (order within top-n irrelevant)
            top = np.argpartition(-sims, n - 1, axis=1)[:, :n].astype(np.int32)
            rep = pdf.loc[pdf.index.repeat(n)].reset_index(drop=True)
            rep[out_col] = top.reshape(-1)
            yield rep

    return assign


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    emb_col: str = "embedding",
    method: str = "kmeans",  # kmeans | seeded
    id_col: str = "vec_id",
    n_assign: int = 1,
) -> tuple[DataFrame, np.ndarray]:
    """Assign each corpus vector to its `n_assign` nearest centroids
    (1 = plain IVF; >1 replicates border vectors into neighboring
    buckets). Returns (corpus + centroid_id, centroids). One narrow
    mapInPandas pass; at scale, write the result partitioned by
    centroid_id so probes prune whole files. `method="kmeans"`
    (default) fits spherical-k-means centroids on the corpus —
    data-adapted buckets, higher probe recall than `"seeded"` random
    hyperplane centroids at the same n_probe."""
    spark = corpus.sparkSession
    if method == "kmeans":
        C = kmeans_centroids(
            corpus, n_centroids, seed=seed, emb_col=emb_col, id_col=id_col
        )
    elif method == "seeded":
        dim = len(corpus.select(emb_col).first()[0])
        C = seeded_centroids(dim, n_centroids, seed)
    else:
        raise ValueError(f"ivf_build: unknown method {method!r}")
    schema = T.StructType(
        corpus.schema.fields + [T.StructField("centroid_id", T.IntegerType())]
    )
    assigned = ensure_min_partitions(corpus).mapInPandas(
        _assign_udf(spark, C, emb_col, "centroid_id", n_assign=n_assign), schema
    )
    return assigned, C


def ivf_topk(
    assigned: DataFrame,  # corpus + centroid_id
    centroids: np.ndarray,
    queries: DataFrame,  # (query_id, embedding) — small
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: per query, score only vectors in the
    `n_probe` nearest centroid buckets. Query→probe mapping is computed
    driver-side (queries are small); the bucket filter is a broadcast
    semi-join → partition pruning when `assigned` is stored partitioned
    by centroid_id."""
    spark = assigned.sparkSession
    qrows = queries.select("query_id", "embedding").collect()
    probe_rows = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / (np.linalg.norm(v) + 1e-12)
        sims = centroids @ v
        for c in np.argsort(-sims)[:n_probe]:
            probe_rows.append((r["query_id"], int(c)))
    # probe schema inherits the caller's query_id type (string ids are
    # as legal here as in cosine_topk_bruteforce, the exact drop-in)
    qid_type = queries.schema["query_id"].dataType.simpleString()
    probes = spark.createDataFrame(
        probe_rows, f"query_id {qid_type}, centroid_id int"
    )
    q = queries.select("query_id", F.col("embedding").alias("q_emb"))
    # dropDuplicates: with multi-assignment ivf_build(n_assign>1) a
    # vector lives in several buckets and can enter a query's candidate
    # set once per probed bucket — identical cosine twice would then
    # occupy two of the top-k ranks and displace a real neighbor
    cand = assigned.join(F.broadcast(probes), "centroid_id").dropDuplicates(
        ["query_id", "vec_id"]
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "vec_id",
        cosine_similarity_col(F.col("embedding"), F.col("q_emb")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def one_nn(
    items: DataFrame,  # (id, embedding)
    ref_pdf: pd.DataFrame,  # (ref_id, embedding) — small reference set
    metric: str = "euclidean",  # euclidean | correlation | jensen_shannon
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """1-nearest-neighbor against a broadcast reference matrix — the
    reference's OneNN classifier (cello/models/one_nn.py:60-152;
    Jensen-Shannon distance :47-57). Distance matrix per Arrow batch in
    vectorized numpy; argmin tie-break = lowest ref_id (refs sorted).
    Output (id, ref_id, distance)."""
    spark = items.sparkSession
    ref_sorted = ref_pdf.sort_values("ref_id").reset_index(drop=True)
    R = np.stack([np.asarray(v, dtype=np.float64) for v in ref_sorted[emb_col]])
    ref_ids = ref_sorted["ref_id"].to_numpy()
    bc = spark.sparkContext.broadcast((R, ref_ids, metric))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        R_, ids_, metric_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            if metric_ == "euclidean":
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    + (R_ * R_).sum(axis=1)[None, :]
                    - 2.0 * (X @ R_.T)
                )
                D = np.sqrt(np.maximum(d2, 0.0))
            elif metric_ == "correlation":
                Xc = X - X.mean(axis=1, keepdims=True)
                Rc = R_ - R_.mean(axis=1, keepdims=True)
                Xn = Xc / (np.linalg.norm(Xc, axis=1, keepdims=True) + 1e-12)
                Rn = Rc / (np.linalg.norm(Rc, axis=1, keepdims=True) + 1e-12)
                D = 1.0 - Xn @ Rn.T
            elif metric_ == "jensen_shannon":
                # rows treated as distributions (shift nonneg, L1 norm —
                # a deliberate deviation: the reference's jensen_shannon
                # (one_nn.py:47-57) assumes inputs already ARE
                # distributions; _distify makes the metric total on raw
                # embeddings). Divergence
                # JSD(p, q) = H((p+q)/2) - (H(p) + H(q)) / 2, emitted as
                # the JS DISTANCE sqrt(JSD) like the reference; sqrt is
                # monotone so the argmin neighbor is unaffected.
                def _distify(A):
                    A = A - A.min(axis=1, keepdims=True)
                    return A / (A.sum(axis=1, keepdims=True) + 1e-12)

                def _H(A):
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t = np.where(A > 0, A * np.log(A), 0.0)
                    return -t.sum(axis=-1)

                P_ = _distify(X)
                Q_ = _distify(R_)
                M = 0.5 * (P_[:, None, :] + Q_[None, :, :])
                D = _H(M) - 0.5 * (_H(P_)[:, None] + _H(Q_)[None, :])
                D = np.sqrt(np.maximum(D, 0.0))
            else:
                raise ValueError(f"unknown metric {metric_!r}")
            nn = np.argmin(D, axis=1)  # first (lowest ref idx) on ties
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "ref_id": ids_[nn],
                    "distance": D[np.arange(len(X)), nn],
                }
            )

    id_type = dict(items.dtypes)[id_col]
    ref_type = "string" if ref_ids.dtype == object else "long"
    return ensure_min_partitions(items).select(id_col, emb_col).mapInPandas(
        run, f"id {id_type}, ref_id {ref_type}, distance double"
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ t).
    Bucketed: pairs form only within a centroid bucket → the self-join
    is per-bucket (quadratic only in bucket size, not corpus size).
    Border-pair recall comes from 2-way multi-assignment (each vector
    lives in its TWO nearest buckets, so a pair straddling one
    boundary still co-occurs); pairs found in both shared buckets are
    deduped AFTER the threshold filter, where the row set is already
    tiny. Pairs whose members share no bucket at all remain missed —
    the standard IVF recall/cost trade."""
    assigned, _ = ivf_build(
        corpus, n_centroids=n_centroids, seed=seed, n_assign=2
    )
    l = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("emb_a"),
    )
    r = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        l.join(r, "centroid_id")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_similarity_col(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .dropDuplicates(["a", "b"])
    )
