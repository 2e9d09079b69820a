"""M11 model registry — the reference's name→class factory
(cello/models/model.py:15-22: CLASSIFIERS onn / ind_one_vs_rest / cdc /
isotonic_regression; PREPROCESSORS scale / pca) re-expressed over the
engine's distributed operators.

Spark-first shape: `fit` runs the distributed preprocessor passes
(one Gram/moment pass each) and the distributed IRLS ensemble fit; the
fitted bundle collapses the whole chain into ONE broadcastable
`LinkingModel` (preprocessors back-projected into raw-feature space,
reconciliation variant selected by classifier name), so `predict` is
the same single `mapInPandas` pass regardless of spec. `onn` keeps the
reference's instance-based semantics: the (small) labelled reference
matrix is broadcast and predict is one vectorized distance pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from cello_spark.operators.linking import LinkingModel, link_documents
from cello_spark.operators.preprocess import (
    fit_pca,
    fit_scale,
    transform_features,
)
from cello_spark.operators.similarity import one_nn
from cello_spark.operators.training import (
    _ancestor_masks,
    cdc_training_sets,
    fit_hierarchical_lr,
)

#: classifier name → reconciliation mode of the fitted LinkingModel
#: (reference models/model.py:15-20; onn is instance-based, not linear)
CLASSIFIERS = {
    "onn": None,
    "ind_one_vs_rest": "none",
    "cdc": "clr",
    "isotonic_regression": "dykstra",
}

#: preprocessor name → fit callable (features_df, **params) → model
#: (reference models/model.py:22)
PREPROCESSORS = {
    "scale": fit_scale,
    "pca": fit_pca,
}


@dataclass
class ModelSpec:
    """Declarative model config — the registry's unit of dispatch.
    `preprocessors` is an ordered list of (name, params) pairs, e.g.
    [("scale", {}), ("pca", {"n_components": 64})]."""

    classifier: str = "isotonic_regression"
    classifier_params: dict = field(default_factory=dict)
    preprocessors: list[tuple[str, dict]] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.classifier not in CLASSIFIERS:
            raise KeyError(
                f"unknown classifier {self.classifier!r}; "
                f"registry has {sorted(CLASSIFIERS)}"
            )
        for name, _ in self.preprocessors:
            if name not in PREPROCESSORS:
                raise KeyError(
                    f"unknown preprocessor {name!r}; "
                    f"registry has {sorted(PREPROCESSORS)}"
                )


def _edges_closure_dfs(spark, labels: list[str], label_edges):
    """(direct_edges_df, strict_closure_df) over the label DAG —
    ontology-sized, built driver-side from the same ancestor masks the
    fit uses (no Spark iteration needed at dictionary scale)."""
    anc_strict, _ = _ancestor_masks(labels, label_edges)
    closure_rows = [
        (labels[i], labels[j]) for i, j in zip(*np.nonzero(anc_strict))
    ]
    edges_df = spark.createDataFrame(
        [(c, p) for c, p in label_edges], "child string, parent string"
    )
    closure_df = spark.createDataFrame(
        closure_rows or [("", "")], "descendant string, ancestor string"
    )
    if not closure_rows:
        closure_df = closure_df.limit(0)
    return edges_df, closure_df


class KGModel:
    """A fitted registry model. Linear variants hold one broadcastable
    `LinkingModel`; onn holds the labelled reference matrix."""

    def __init__(self, spec: ModelSpec) -> None:
        self.spec = spec
        self.preprocessor_models: list = []
        self.linking_model: LinkingModel | None = None
        self.onn_ref: pd.DataFrame | None = None  # (ref_id, embedding)
        self.onn_labels: pd.DataFrame | None = None  # (ref_id, label)

    # -- fit ------------------------------------------------------------

    def fit(
        self,
        features: DataFrame,  # (item, features: array<double>)
        labels_long: DataFrame,  # (item, label)
        label_edges: list[tuple[str, str]],
        thresholds_pdf: pd.DataFrame | None = None,  # (label, threshold)
        item_study: DataFrame | None = None,
    ) -> "KGModel":
        spec = self.spec
        spark = features.sparkSession

        if spec.classifier == "onn":
            # instance-based (one_nn.py:60-152): keep every training
            # item; the reference set must be broadcastable-small,
            # exactly like the reference's in-memory training matrix
            ref = (
                features.join(
                    labels_long.groupBy("item").agg(
                        F.array_sort(F.collect_set("label")).alias("labels")
                    ),
                    "item",
                )
                .select(
                    F.col("item").alias("ref_id"),
                    F.col("features").alias("embedding"),
                    "labels",
                )
                .toPandas()
            )
            self.onn_ref = ref[["ref_id", "embedding"]]
            self.onn_labels = ref[["ref_id", "labels"]]
            return self

        cur = features
        for name, params in spec.preprocessors:
            model = PREPROCESSORS[name](cur, **params)
            self.preprocessor_models.append(model)
            cur = transform_features(cur, [model])

        fit_kwargs = dict(spec.classifier_params)
        if spec.classifier == "cdc":
            # CDC trains on the all-parents pos/neg sets (SO3) and
            # predicts conditional→marginal products (clr mode)
            labels = sorted(
                r["label"]
                for r in labels_long.select("label").distinct().collect()
            )
            edges_df, closure_df = _edges_closure_dfs(
                spark, labels, label_edges
            )
            fit_kwargs["training_sets"] = cdc_training_sets(
                labels_long, closure_df, edges_df
            )
        weights = fit_hierarchical_lr(
            cur, labels_long, label_edges, item_study=item_study, **fit_kwargs
        )

        if thresholds_pdf is None:
            thresholds_pdf = pd.DataFrame(
                {"label": weights.label, "threshold": 0.5}
            )
        lm = LinkingModel.from_tables(
            weights,
            thresholds_pdf,
            label_edges,
            reconcile_mode=CLASSIFIERS[spec.classifier],
        )
        if self.preprocessor_models:
            # fold the chain into raw-space W/b — predict then needs no
            # extra pass (isotonic_regression.py:139-163 generalized)
            lm = lm.with_preprocessors(self.preprocessor_models)
        self.linking_model = lm
        return self

    # -- predict --------------------------------------------------------

    def predict(self, features: DataFrame, confidence: bool = False) -> DataFrame:
        """Linear variants: the standard linked frame (doc_id, probs,
        bins, most_specific, final_labels). onn: (doc_id, ref_id,
        distance, labels) — the neighbor's label set, the reference's
        OneNN output.

        `confidence=True` (onn only) additionally fans the neighbor
        out to the reference-shaped per-label confidence matrix
        (one_nn.py:60-152: -distance for the neighbor's labels, -inf
        for every other label in the training universe), in long form
        (doc_id, label, confidence) — one row per (doc, universe
        label). The fan-out is a broadcast nested-loop join against
        the label universe (dict-sized), so the document side still
        never shuffles."""
        if self.spec.classifier == "onn":
            assert self.onn_ref is not None, "predict before fit"
            metric = self.spec.classifier_params.get("metric", "euclidean")
            hits = one_nn(
                features.select(
                    F.col("doc_id").alias("vec_id"),
                    F.col("features").alias("embedding"),
                ),
                self.onn_ref,
                metric=metric,
                id_col="vec_id",
                emb_col="embedding",
            )
            spark = features.sparkSession
            labs = spark.createDataFrame(self.onn_labels)
            base = hits.select(
                F.col("id").alias("doc_id"), "ref_id", "distance"
            ).join(F.broadcast(labs), "ref_id")
            if not confidence:
                return base
            universe = sorted(
                {l for ls in self.onn_labels["labels"] for l in ls}
            )
            uni = spark.createDataFrame(
                [(l,) for l in universe], "label string"
            )
            return base.crossJoin(F.broadcast(uni)).select(
                "doc_id",
                "label",
                F.when(
                    F.array_contains("labels", F.col("label")),
                    -F.col("distance"),
                )
                .otherwise(F.lit(float("-inf")))
                .alias("confidence"),
            )
        if confidence:
            raise ValueError(
                "confidence output is the onn variant's shape; linear "
                "variants already emit per-label probs"
            )
        assert self.linking_model is not None, "predict before fit"
        return link_documents(features, self.linking_model)


def build_model(
    classifier: str,
    classifier_params: dict | None = None,
    preprocessors: list[tuple[str, dict]] | None = None,
) -> KGModel:
    """The factory entry point, mirroring Model(classifier,
    preprocessors) construction in the reference (model.py:25-36)."""
    return KGModel(
        ModelSpec(
            classifier=classifier,
            classifier_params=dict(classifier_params or {}),
            preprocessors=list(preprocessors or []),
        )
    )
