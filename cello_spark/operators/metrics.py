"""Evaluation metrics as DataFrame aggregates (A8 — the reference's
sklearn-based P/R/F1 in new_cello/evaluation/__init__.py:14-94,
re-expressed relationally so it runs at triple-table scale).

`triple_pr` is the distributed face of the pytest P/R gate
(oracle.precision_recall): tp = |got ∩ want| via an inner join, so at
10^12 triples the comparison is two shuffles on the triple key, never a
driver-side set build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_KEYS = ["subj", "pred", "obj"]


def triple_pr(got: DataFrame, want: DataFrame, keys: list[str] = TRIPLE_KEYS) -> DataFrame:
    """One-row DataFrame (tp, fp, fn, precision, recall, f1) comparing
    two triple tables on `keys` (order-insensitive, distinct)."""
    # ONE action: full-outer join of the two distinct sets (both
    # shuffles land on the same keys, so the join adds no exchange)
    # counting both-present / left-only / right-only in a single
    # aggregate. The previous three-action form (inner-join count +
    # two distinct counts) materialized each distinct set twice.
    g = got.select(*keys).distinct().withColumn("__g", F.lit(1))
    w = want.select(*keys).distinct().withColumn("__w", F.lit(1))
    r = (
        g.join(w, keys, "full_outer")
        .agg(
            F.count_if(
                F.col("__g").isNotNull() & F.col("__w").isNotNull()
            ).alias("tp"),
            F.count_if(
                F.col("__g").isNotNull() & F.col("__w").isNull()
            ).alias("fp"),
            F.count_if(
                F.col("__g").isNull() & F.col("__w").isNotNull()
            ).alias("fn"),
        )
        .first()
    )
    tp, fp, fn = r["tp"], r["fp"], r["fn"]
    n_g, n_w = tp + fp, tp + fn
    precision = tp / n_g if n_g else 0.0
    recall = tp / n_w if n_w else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    spark = got.sparkSession
    return spark.createDataFrame(
        [(tp, fp, fn, float(precision), float(recall), float(f1))],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )


def per_class_report(
    pairs: DataFrame,  # (item, truth, pred)
) -> DataFrame:
    """Per-class precision/recall/F1/support for single-label
    predictions — groupBy aggregates only (two shuffles on the class
    key). Classes appearing only in predictions get support 0."""
    support = pairs.groupBy(F.col("truth").alias("label")).agg(
        F.count(F.lit(1)).alias("support")
    )
    tp = (
        pairs.filter(F.col("truth") == F.col("pred"))
        .groupBy(F.col("truth").alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    pred_n = pairs.groupBy(F.col("pred").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    out = (
        support.join(tp, "label", "left")
        .join(pred_n, "label", "full")
        .fillna(0, subset=["tp", "support", "n_pred"])
        .withColumn(
            "precision",
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0),
        )
        .withColumn(
            "recall",
            F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(
                0.0
            ),
        )
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2
                * F.col("precision")
                * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
    return out.select("label", "support", "tp", "n_pred", "precision", "recall", "f1")


def confusion_matrix(pairs: DataFrame) -> DataFrame:
    """(truth, pred, n) counts — the sparse confusion matrix."""
    return pairs.groupBy("truth", "pred").agg(F.count(F.lit(1)).alias("n"))
