"""End-to-end KG-construction pipeline wiring.

Stages (SURVEY §7.1):
  1. ontology       — terms+edges (patched, inverse edges, obsolete
                      filter) → normalized edge table
  2. closure        — (descendant, ancestor) transitive closure (is_a)
  3. onto_triples   — (child, rel, parent) schema-layer triples
  4. mentions       — dictionary mention detection over document spans
  5. linked         — score/reconcile/binarize/most-specific (one
                      mapInPandas pass)
  6. canonical_map  — alias/xref connected components → canonical ids
  7. triples        — ontology ∪ typing triples, subjects/objects
                      rewritten to canonical ids, bucketed write

Inputs arrive via the ctx dict (documents/features as DataFrames,
ontology bundle driver-side) so the same wiring runs on fixtures in
tests, on the bench generator, and on real tables in production.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from cello_spark.operators.graph import connected_components, transitive_closure
from cello_spark.operators.linking import LinkingModel, link_documents, typing_triples
from cello_spark.operators.mentions import detect_mentions
from cello_spark.plans.pipeline import Pipeline
from cello_spark.sources.fixtures import Ontology, term_id, QUALIFIER_SUFFIXES
from cello_spark.sources.ontology import (
    alias_dictionary,
    apply_patch,
    filter_obsolete,
    ontology_triples,
    with_inverse_edges,
)

TERM_PREFIX = "CS:"


def canonical_mapping(components: DataFrame, term_prefix: str = TERM_PREFIX) -> DataFrame:
    """(node, canonical): per component, canonical = min member whose id
    has the ontology prefix; fallback = min member. Deterministic."""
    ranked = components.groupBy("component").agg(
        F.min(F.when(F.col("node").startswith(term_prefix), F.col("node"))).alias(
            "canon_term"
        ),
        F.min("node").alias("canon_any"),
    )
    return (
        components.join(ranked, "component")
        .select(
            "node",
            F.coalesce("canon_term", "canon_any").alias("canonical"),
        )
    )


def build_kg_pipeline(
    spark: SparkSession,
    workdir: str,
    documents: DataFrame,
    features: DataFrame,
    onto: Ontology,
    weights_pdf: pd.DataFrame,
    thresholds_pdf: pd.DataFrame,
    n_buckets: int = 32,
) -> Pipeline:
    terms_df = spark.createDataFrame(onto.terms)
    edges_df = spark.createDataFrame(onto.edges)
    patch_df = spark.createDataFrame(onto.patch_edges)
    label_edges = [
        (c, p)
        for c, p, r in pd.concat([onto.edges, onto.patch_edges])[
            ["src", "dst", "rel"]
        ].itertuples(index=False)
        if r == "is_a" and c in set(onto.labels) and p in set(onto.labels)
    ]
    qualifiers = {term_id(s) for s in QUALIFIER_SUFFIXES}
    model = LinkingModel.from_tables(
        weights_pdf, thresholds_pdf, label_edges, qualifier_labels=qualifiers
    )

    pipe = Pipeline(spark, workdir)

    def stage_ontology(ctx: dict) -> DataFrame:
        live_terms, live_edges = filter_obsolete(terms_df, edges_df)
        patched = apply_patch(live_edges, patch_df)
        return with_inverse_edges(patched)

    def stage_closure(ctx: dict) -> DataFrame:
        return transitive_closure(ctx["ontology"], rels=("is_a",))

    def stage_onto_triples(ctx: dict) -> DataFrame:
        return ontology_triples(ctx["ontology"])

    def stage_mentions(ctx: dict) -> DataFrame:
        live_terms, _ = filter_obsolete(terms_df, edges_df)
        return detect_mentions(documents, alias_dictionary(live_terms))

    def stage_linked(ctx: dict) -> DataFrame:
        # mention gate: only docs that mention at least one ontology
        # term get linked (left_semi keeps the doc side partitioning)
        mentioned = ctx["mentions"].select("doc_id").dropDuplicates()
        gated = features.join(mentioned, "doc_id", "left_semi")
        return link_documents(gated, model)

    def stage_canonical_map(ctx: dict) -> DataFrame:
        live_terms, _ = filter_obsolete(terms_df, edges_df)
        # alias graph: term_id ↔ name/synonym/xref strings
        pairs = (
            alias_dictionary(live_terms)
            .select(F.col("term_id").alias("a"), F.col("alias_norm").alias("b"))
            .unionByName(
                live_terms.select(
                    F.col("term_id").alias("a"), F.explode("xrefs").alias("b")
                )
            )
        )
        comps = connected_components(pairs)
        return canonical_mapping(comps)

    def stage_triples(ctx: dict) -> DataFrame:
        raw = ctx["onto_triples"].unionByName(typing_triples(ctx["linked"]))
        cmap = ctx["canonical_map"]
        # rewrite subj/obj to canonical ids (docs/labels not in the map
        # pass through); both joins broadcast — the map is dict-sized
        subj_map = F.broadcast(
            cmap.select(F.col("node").alias("subj"), F.col("canonical").alias("subj_c"))
        )
        obj_map = F.broadcast(
            cmap.select(F.col("node").alias("obj"), F.col("canonical").alias("obj_c"))
        )
        return (
            raw.join(subj_map, "subj", "left")
            .join(obj_map, "obj", "left")
            .select(
                F.coalesce("subj_c", "subj").alias("subj"),
                "pred",
                F.coalesce("obj_c", "obj").alias("obj"),
            )
            .dropDuplicates()
        )

    (
        pipe.add_stage("ontology", stage_ontology)
        .add_stage("closure", stage_closure)
        .add_stage("onto_triples", stage_onto_triples)
        .add_stage("mentions", stage_mentions)
        .add_stage("linked", stage_linked)
        .add_stage("canonical_map", stage_canonical_map)
        .add_stage("triples", stage_triples)
    )
    return pipe
