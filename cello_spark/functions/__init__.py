"""Column-level / vectorized functions: text analysis, scoring math,
hierarchy reconciliation, similarity kernels. Numpy-only modules in
here must stay importable without a SparkSession (they run inside
executor Python workers and in the offline oracle)."""
