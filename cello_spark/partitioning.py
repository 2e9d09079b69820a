"""Partition-parallelism helpers.

The "tiny input, explosive operator" hazard: AQE coalesces a small
shuffle output (or a small parquet scan) down to one partition because
the *input* bytes are small — but a following explode / self-join can
multiply rows by orders of magnitude, and that work then runs in a
single task. Pair-enumeration joins (LSH bands, shingle inverted
index) are the canonical case: 5k docs → 6.7M candidate pairs
generated serially unless the probe side is spread first.

`ensure_min_partitions` is the targeted fix: a round-robin (or keyed)
repartition applied ONLY when the current partition count is below the
cluster's task slots. On a real 100 TB table the scan already has
thousands of splits and this is a no-op — the repartition shuffle is
never paid at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(
    df: DataFrame, factor: int = 2, key: str | None = None
) -> DataFrame:
    """Repartition `df` to factor * defaultParallelism iff it currently
    has fewer partitions than the cluster has task slots. `key` makes
    the repartition hash-keyed (for downstream co-partitioning) instead
    of round-robin. Explicit numPartitions are respected by AQE (never
    re-coalesced)."""
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= slots:
        return df
    n = factor * slots
    return df.repartition(n, key) if key else df.repartition(n)
