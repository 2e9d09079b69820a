"""Cascaded (conditional) classifier marginals — the reference's CDC
algorithm (M7/J6/A7).

The reference computes, per (cell, label), the marginal probability as
the product of per-label CONDITIONAL probabilities over the label's
ancestors-including-itself:

    marginal(s, l) = exp( Σ_{a ∈ ancestors(l) ∪ {l}} log p_cond(s, a) )

(reference cello/models/cascaded_discriminative_classifiers.py:147-194,
ancestor-sum at :171-180).

Spark-first: one broadcast join of the long conditional-score table
against the ancestor closure, then a partial+final aggregate — Catalyst
gives the map-side combine for free. The closure is ontology-sized
(broadcast); the only shuffle is the groupBy on (item, label), exactly
the output key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clr_marginals(
    cond_probs: DataFrame,  # (item, label, prob) conditional probabilities
    closure_with_self: DataFrame,  # (descendant, ancestor) INCLUDING self-pairs
    eps: float = 0.0,
) -> DataFrame:
    """(item, label, marginal) with marginal = exp(Σ log prob) over the
    label's ancestors∪self. `eps` > 0 clamps probabilities away from 0
    before the log (the reference takes raw logs; 0 → marginal 0, which
    `log` reproduces via -inf → exp → 0.0)."""
    p = F.col("prob") if eps <= 0 else F.greatest(F.col("prob"), F.lit(eps))
    fan = (
        cond_probs.withColumnRenamed("label", "ancestor")
        .join(F.broadcast(closure_with_self), "ancestor")
        .select(
            "item",
            F.col("descendant").alias("label"),
            p.alias("p"),
            # Spark's log returns NULL (not -inf) for p <= 0, which a
            # sum would silently skip — zero factors are handled by the
            # explicit min-gate below instead
            F.log(p).alias("log_p"),
        )
    )
    return fan.groupBy("item", "label").agg(
        F.when(F.min("p") <= 0, F.lit(0.0))
        .otherwise(F.exp(F.sum("log_p")))
        .alias("marginal")
    )


def closure_with_self(closure_strict: DataFrame) -> DataFrame:
    """Augment a strict (descendant, ancestor) closure with self-pairs
    for every node appearing on either side."""
    nodes = (
        closure_strict.select(F.col("descendant").alias("n"))
        .union(closure_strict.select(F.col("ancestor").alias("n")))
        .distinct()
    )
    return closure_strict.union(
        nodes.select(F.col("n").alias("descendant"), F.col("n").alias("ancestor"))
    )
