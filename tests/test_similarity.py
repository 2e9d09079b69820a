"""Similarity search: brute-force exactness vs numpy, IVF recall,
embedding near-dup bucketing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cello_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def corpus_np(corpus):
    rows = corpus.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, X


@pytest.fixture(scope="module")
def queries(spark, corpus):
    # use the first 3 corpus vectors as queries
    return (
        corpus.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .cache()
    )


def _numpy_topk(ids, X, q, k):
    qn = q / np.linalg.norm(q)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ qn
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


def test_bruteforce_matches_numpy(spark, corpus, corpus_np, queries):
    ids, X = corpus_np
    got = S.cosine_topk_bruteforce(corpus, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qrow in queries.collect():
        want = _numpy_topk(ids, X, np.asarray(qrow.embedding, dtype=np.float64), 5)
        rows = sorted(by_q[qrow.query_id])
        assert [v for _, v, _ in rows] == [i for i, _ in want]
        for (_, _, c), (_, s) in zip(rows, want):
            assert abs(c - s) < 1e-6
        # self is always rank 1 with cosine ~1
        assert rows[0][1] == qrow.query_id and rows[0][2] > 0.999999


def test_ivf_recall_vs_bruteforce(spark, corpus, queries):
    k = 10
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk_bruteforce(corpus, queries, k=k).collect()
    }
    assigned, C = S.ivf_build(corpus, n_centroids=8, seed=42)
    approx = {
        (r.query_id, r.vec_id)
        for r in S.ivf_topk(assigned, C, queries, k=k, n_probe=8).collect()
    }
    # probing ALL centroids == exhaustive search → exact equality
    assert approx == exact
    # partial probe: reasonable recall, and strictly fewer candidates scored
    approx4 = {
        (r.query_id, r.vec_id)
        for r in S.ivf_topk(assigned, C, queries, k=k, n_probe=4).collect()
    }
    recall = len(approx4 & exact) / len(exact)
    assert recall >= 0.5, recall


def test_ivf_kmeans_centroids_at_least_match_seeded(spark, corpus, queries):
    """Data-adapted (spherical-k-means) centroids must not lose recall
    vs the random-hyperplane fallback at a tight probe budget — the
    point of fitting them (the upgrade round 1 flagged as missing)."""
    k = 10
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk_bruteforce(corpus, queries, k=k).collect()
    }
    recall = {}
    for method in ("kmeans", "seeded"):
        assigned, C = S.ivf_build(corpus, n_centroids=8, seed=42, method=method)
        got = {
            (r.query_id, r.vec_id)
            for r in S.ivf_topk(assigned, C, queries, k=k, n_probe=2).collect()
        }
        recall[method] = len(got & exact) / len(exact)
    assert recall["kmeans"] >= recall["seeded"], recall
    assert recall["kmeans"] >= 0.5, recall


def test_ivf_assignment_deterministic(spark, corpus):
    a1, _ = S.ivf_build(corpus, n_centroids=8, seed=42)
    a2, _ = S.ivf_build(corpus, n_centroids=8, seed=42)
    d1 = {r.vec_id: r.centroid_id for r in a1.collect()}
    d2 = {r.vec_id: r.centroid_id for r in a2.collect()}
    assert d1 == d2


def test_embedding_near_dup_bucketed_recall_vs_bruteforce(spark, corpus, corpus_np):
    """Recall gate for the scale-path operator (q_embedding_near_dup_
    bucketed): its pairs must be a subset of the exact all-pairs result
    (precision 1.0 — cosines are computed exactly) with recall above
    the IVF single-probe expectation."""
    thr = 0.5
    ids, X = corpus_np
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S_mat = Xn @ Xn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    exact = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(iu[S_mat[iu, ju] >= thr], ju[S_mat[iu, ju] >= thr])
    }
    got = {
        (r.a, r.b)
        for r in S.embedding_near_dup_pairs(
            corpus, threshold=thr, n_centroids=8
        ).collect()
    }
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    if exact:
        recall = len(got & exact) / len(exact)
        assert recall >= 0.5, f"recall {recall} over {len(exact)} true pairs"


def test_embedding_near_dup_pairs(spark):
    # plant exact duplicates in a small corpus
    base = [([1.0, 0.0, 0.0], 1), ([1.0, 0.001, 0.0], 2), ([0.0, 1.0, 0.0], 3)]
    rows = [(i, emb, 0) for emb, i in base]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = S.embedding_near_dup_pairs(df, threshold=0.999, n_centroids=2)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_ivf_multi_assign_no_duplicate_vec_ids(spark, corpus, queries):
    """n_assign>1 replicates vectors across buckets; the top-k must
    still contain each vec_id at most once per query."""
    assigned, C = S.ivf_build(corpus, n_centroids=8, seed=42, n_assign=2)
    rows = S.ivf_topk(assigned, C, queries, k=10, n_probe=8).collect()
    seen = {}
    for r in rows:
        key = (r.query_id, r.vec_id)
        assert key not in seen, f"duplicate {key} at ranks {seen.get(key)}/{r.rank}"
        seen[key] = r.rank


def test_ivf_topk_string_query_ids(spark, corpus, queries):
    """ivf_topk must accept the same id types cosine_topk_bruteforce
    does — the probe table schema follows the caller's query_id."""
    q = queries.select(
        F.concat(F.lit("q"), F.col("query_id").cast("string")).alias("query_id"),
        "embedding",
    )
    assigned, C = S.ivf_build(corpus, n_centroids=8, seed=42)
    rows = S.ivf_topk(assigned, C, q, k=3, n_probe=2).collect()
    assert rows and all(r.query_id.startswith("q") for r in rows)


def test_salted_join_rejects_outer_modes(spark):
    from cello_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "a")], "key int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "key int, d string")
    with pytest.raises(ValueError, match="unsupported"):
        salted_join(fact, dim, "key", k=4, how="right")
    # inner path still fine
    assert salted_join(fact, dim, "key", k=4).count() == 1
