"""The reference's user-facing predict flow, end to end
(cello/cello_predict.py main → cello/cello.py predict): take a raw
expression table in any accepted unit, produce the three reference
output tables.

Chain (each step is an already-tested operator):

  1. units → canonical log(TPM+1)      normalize_units
     (cello_predict.py:224-237)
  2. multi-mapped gene sum (optional)  sum_duplicate_genes
     (cello.py:162-173, gene_map from match_genes)
  3. model/data compatibility gate     check_compatibility
     (cello.py:474-487)
  4. model-order dense features        features_vector
     (cello.py:517-519)
  5. cluster once / replicate back     link_documents_clustered
     (optional, cello.py:340-362,:579-611) else per-sample
     link_documents — score→reconcile→binarize→most-specific in ONE
     mapInPandas pass
  6. three output tables               link_results_long + selects
     (cello_predict.py:196-207): probability (sample, label, prob),
     binary (sample, label, bin), most_specific (sample, label);
     optional O4 human-readable rename (cello_predict.py:182-194).

Scale shape: steps 1/2/4 are one keyed aggregate each over the long
table; the model is a broadcast bundle; no step shuffles the sample
axis more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cello_spark.operators.linking import (
    LinkingModel,
    link_documents,
    link_documents_clustered,
    link_results_long,
)
from cello_spark.sources.expression import (
    THREE_PRIME_ASSAY,
    check_compatibility,
    features_vector,
    normalize_units,
    sum_duplicate_genes,
)
from cello_spark.sources.ontology import rename_to_names


def predict_expression(
    long_df: DataFrame,  # (sample_id, gene_id, value)
    model: LinkingModel,
    features: list[str],  # the model's gene list, in model order
    units: str = "LOG1_TPM",
    assay: str = THREE_PRIME_ASSAY,
    gene_map: DataFrame | None = None,  # (gene_id, train_gene_id)
    clusters: DataFrame | None = None,  # (doc_id, cluster) precomputed
    terms: DataFrame | None = None,  # ontology terms dim → O4 rename
    strict: bool = True,  # P4 gate on missing model genes
) -> dict[str, DataFrame]:
    """Returns {"probability", "binary", "most_specific"} DataFrames —
    the long-format equivalents of the reference's three TSVs."""
    x = normalize_units(long_df, units, assay)
    if gene_map is not None:
        x = sum_duplicate_genes(x, gene_map)
    if strict:
        check_compatibility(x.select("gene_id"), features)
    feats = features_vector(x, features)
    if clusters is not None:
        linked = link_documents_clustered(feats, clusters, model).drop("cluster")
    else:
        linked = link_documents(feats, model)
    long_out = link_results_long(linked, model.labels)
    probability = long_out.select("doc_id", "label", "prob")
    binary = long_out.select("doc_id", "label", "bin")
    most_specific = linked.filter(F.col("most_specific") != "").select(
        "doc_id", F.col("most_specific").alias("label")
    )
    if terms is not None:
        probability = rename_to_names(probability, terms, "label")
        binary = rename_to_names(binary, terms, "label")
        most_specific = rename_to_names(most_specific, terms, "label")
    return {
        "probability": probability,
        "binary": binary,
        "most_specific": most_specific,
    }


def write_outputs(
    outputs: dict[str, DataFrame],
    out_dir: str,
    fmt: str = "parquet",
) -> None:
    """S13 sink for the predict flow (cello_predict.py:196-207 writes
    probability.tsv / binary.tsv / most_specific.tsv). `fmt="tsv"`
    mirrors the reference's files (header, tab-separated, distributed
    write — one file per partition, as a 10^12-doc output must be);
    `fmt="parquet"` is the scale-native default."""
    if fmt not in ("parquet", "tsv"):
        raise ValueError(f"fmt must be parquet|tsv, got {fmt!r}")
    for name, df in outputs.items():
        path = f"{out_dir}/{name}"
        if fmt == "parquet":
            df.write.mode("overwrite").parquet(path)
        else:
            df.write.mode("overwrite").option("sep", "\t").option(
                "header", "true"
            ).csv(path)
