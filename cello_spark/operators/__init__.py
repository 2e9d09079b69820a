"""Relational & graph operators: transitive closure, DAG algebra,
connected components, mention detection, dedup families, entity-linking
decision operators."""
