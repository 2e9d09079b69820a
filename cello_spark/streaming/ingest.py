"""Structured-Streaming incremental ingest for the KG pipeline.

The reference has no streaming path (SURVEY §2.12); the batch pipeline
covers its semantics. This module is the incremental-ingest extension a
production deployment needs: new document files landing in a table
directory are picked up exactly-once (file-source checkpointing),
mention detection runs as the SAME stateless operator used in batch
(operators/mentions.detect_mentions — streaming reuses the batch plan,
nothing is reimplemented), and outputs append to the mentions table.

Two processing styles:
- `ingest_available_now` : catch-up batch over whatever files are new,
  then stop — the cron/airflow-style micro-batch. Combined with the
  stage-level manifest (plans/pipeline.py) this gives file-level
  incremental resume on the ingest side.
- `start_ingest_stream`  : continuous micro-batches (caller manages
  lifecycle) with optional watermarked per-term rate aggregation for
  monitoring.

The per-row span-sequence invariant holds by construction: documents
are never mutated — mentions are an additive side table keyed by
(doc_id, span_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cello_spark.operators.mentions import detect_mentions

DOCUMENT_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_documents(
    spark: SparkSession, input_dir: str, schema: str | None = None
) -> DataFrame:
    """Streaming source over a documents directory (parquet files
    appended by an upstream writer). maxFilesPerTrigger bounds
    micro-batch size so executor memory is stable regardless of how
    many files arrive between triggers.

    `schema=None` takes the physical schema from the files already
    present (streams need an explicit schema; the logical contract is
    DOCUMENT_SCHEMA, but e.g. the offset column may be materialized as
    int32 or int64 depending on the writer)."""
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def streaming_mentions(
    documents_stream: DataFrame, alias_dict: DataFrame
) -> DataFrame:
    """The batch mention operator applied to a stream — stateless
    (explode + broadcast joins), so no watermark/state is involved;
    dedup is skipped (at-least-once per (span, term), see
    detect_mentions(distinct=False))."""
    return detect_mentions(documents_stream, alias_dict, distinct=False)


def ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    alias_dict: DataFrame,
    timeout_sec: int = 300,
) -> None:
    """Process all files not yet recorded in the checkpoint, append the
    detected mentions to `output_dir`, then stop (Trigger.AvailableNow).
    Re-invoking after new files land processes ONLY the new files —
    exactly-once ingest via the file-source + sink commit logs."""
    docs = stream_documents(spark, input_dir)
    mentions = streaming_mentions(docs, alias_dict)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - defensive stop on timeout
        q.stop()
        raise TimeoutError(f"ingest did not finish within {timeout_sec}s")


def mention_rates(
    mentions_stream: DataFrame,
    event_time_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-term mention counts for
    monitoring dashboards. Late rows beyond the watermark are dropped
    (standard streaming-agg semantics)."""
    with_ts = mentions_stream.withColumn(
        event_time_col,
        F.coalesce(F.col(event_time_col), F.current_timestamp())
        if event_time_col in mentions_stream.columns
        else F.current_timestamp(),
    )
    return (
        with_ts.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window), "term_id")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def start_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    alias_dict: DataFrame,
    trigger_seconds: int = 30,
) -> StreamingQuery:
    """Continuous micro-batch ingest (caller owns the query lifecycle)."""
    docs = stream_documents(spark, input_dir)
    mentions = streaming_mentions(docs, alias_dict)
    return (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
