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

from pyspark.sql import DataFrame, Window, functions as F


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


def per_group_sorted_index(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    idx_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based rank of each row in its group's (order_cols)-sorted
    order, computed WITHOUT a per-group single-task window sort.

    `row_number().over(Window.partitionBy(group))` sends every row of
    a group to ONE task's sort — the hub-key hazard: a predicate with
    10^8 distinct objects, or a hub node's adjacency list, becomes a
    single straggler (or OOM) at scale. This helper computes the exact
    same global per-group rank via order-preserving range partitioning:

    1. `repartitionByRange(group_cols + order_cols)` — each partition
       holds a contiguous slice of the global sort order, bounded by
       ~|df|/num_partitions rows regardless of group sizes (a hub
       group simply spans several consecutive partitions);
    2. a local `row_number` windowed on (range-partition id, group) —
       every window partition is a subset of one range partition, so
       no task ever sorts more than a partition's worth of rows;
    3. per-(partition, group) counts (a tiny table: at most one row
       per group per partition it touches, and groups are contiguous,
       so its size is ~n_groups + num_partitions) prefix-summed over
       partition ids within each group give the offset of each
       partition's slice;
    4. offset + local rank - 1 = the exact global per-group rank —
       invariant to where the (sampled) range boundaries fall, so the
       output is deterministic even though the partitioning isn't.

    The offsets join key is (partition id, group) — bounded by the
    range-partition size, never a hub key. order_cols must be a total
    order within each group (callers dedupe first); ties across rows
    would make ranks partition-dependent.
    """
    spark = df.sparkSession
    n = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    cols = [*group_cols, *order_cols]
    part = df.repartitionByRange(n, *cols).withColumn(
        "__rpid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__rpid", *group_cols).orderBy(*order_cols)
    local = part.withColumn("__lrn", F.row_number().over(w_local))
    counts = part.groupBy("__rpid", *group_cols).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__rpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__rpid",
        *group_cols,
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(offsets, ["__rpid", *group_cols])
        .withColumn(idx_col, (F.col("__off") + F.col("__lrn") - 1).cast("int"))
        .drop("__rpid", "__lrn", "__off")
    )


def capped_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n_max: int,
    n_buckets: int = 64,
    bucket_key: str | None = None,
) -> DataFrame:
    """Keep the first n_max rows per group in (order_cols) order — the
    distributed two-phase top-k that replaces a single
    `row_number().over(partitionBy(group)) <= n_max` window.

    Phase 1 pre-caps within (group, hash-salt bucket): each bucket's
    window task sorts ~|group|/n_buckets rows, so a hub group is split
    across n_buckets tasks instead of one. Phase 2 ranks the survivors
    — at most n_buckets * n_max rows per group, a bound set by the
    PARAMETERS, not the data — and keeps the global first n_max.
    Output is identical to the single-window form because phase 1 can
    never evict a row that is within the global top n_max (each bucket
    keeps its own top n_max, a superset of its contribution to the
    global top n_max).

    bucket_key defaults to the first order column; pass an id column
    when order_cols start with a computed expression's column.
    """
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")
    key = bucket_key or order_cols[0]
    bucketed = df.withColumn(
        "__bkt", F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets))
    )
    w1 = Window.partitionBy("__bkt", *group_cols).orderBy(*order_cols)
    pre = (
        bucketed.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= n_max)
        .drop("__bkt", "__rk")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        pre.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= n_max)
        .drop("__rk")
    )
