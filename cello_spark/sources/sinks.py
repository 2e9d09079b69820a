"""Sinks: bucketed triple-table writes.

Production target is an Iceberg table with explicit bucket-by-subject
partitioning (`PARTITIONED BY (bucket(N, subj))`), which gives:
- co-located joins on subj without a shuffle (storage-partitioned join)
- partition pruning for per-doc lookups
- atomic snapshot commits → the unit of the pipeline's resumability.

The Iceberg runtime jars are not on this sandbox classpath, so the
writer degrades to plain parquet with an explicit `bucket` column and
`partitionBy("bucket")` — the same layout on disk, minus snapshot
metadata (the stage manifest in plans/pipeline.py supplies the
atomicity instead: outputs land in a temp dir, the manifest entry is
the commit point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 32


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def write_bucketed(
    df: DataFrame,
    path_or_table: str,
    bucket_col: str = "subj",
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Bucket-partitioned write. With Iceberg on the classpath this
    would be:

        df.writeTo(tbl).partitionedBy(bucket(n, col)).createOrReplace()

    Parquet fallback: deterministic bucket column + partitionBy, with a
    repartition on (bucket) so each output partition is written by the
    tasks that own it (no tiny-file explosion)."""
    spark = df.sparkSession
    if iceberg_available(spark) and not path_or_table.startswith("/"):
        writer = (
            df.writeTo(path_or_table)
            .using("iceberg")
            .partitionedBy(F.bucket(n_buckets, F.col(bucket_col)))
        )
        # honor `mode` exactly like the parquet fallback does — a
        # silent createOrReplace on mode="append" would be data loss
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(
                f"write_bucketed: unsupported mode {mode!r} for the "
                "Iceberg path (use 'overwrite' or 'append')"
            )
        return
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    )
    (
        out.repartition(n_buckets, "bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path_or_table)
    )


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
