"""cello_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
CellO reference (gene-expression → Cell-Ontology classification),
re-expressed Spark-first.

Sub-packages
------------
sources    : ingest — OBO-ish ontology parser, document/fixture
             generators, bucketed sinks (Iceberg behind an import-try,
             parquet fallback).
functions  : column-level / vectorized functions — text analysis,
             scoring UDFs, similarity math.
operators  : relational & graph operators — transitive closure,
             most-specific, connected components, mention detection,
             dedup families, entity-linking decisions.
plans      : pipeline orchestration — stage manifest, checkpoint /
             resume, per-partition lineage metrics.
streaming  : incremental ingest via Structured Streaming (optional).

Everything here derives only from public knowledge: the Apache Spark /
PySpark API and the behavior (not code) of the reference repo.
"""

__version__ = "0.1.0"

from cello_spark.session import get_spark  # noqa: F401
