"""Streaming extraction + event-time aggregation.

- ``extract_stream``: file-source stream of pages -> the SAME fused batch
  extraction (extract_chunks) applied per micro-batch via foreachBatch, with
  Spark's streaming checkpoint giving exactly-once output and restart-resume
  (the streaming counterpart of lineage.run_with_lineage).
- ``windowed_event_counts``: watermarked tumbling-window aggregation over an
  (event_id, ts, user_id, event_type, value) stream — late rows beyond the
  watermark drop, state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extract import extract_chunks
from ..schema import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet drops (a landing zone a crawler
    appends to). Explicit schema — no inference on the hot path."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_path)


def extract_stream(
    pages_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    num_partitions: int = 32,
    available_now: bool = True,
) -> StreamingQuery:
    """Micro-batch extraction with idempotent batch writes.

    The streaming checkpoint makes batch REPLAY possible after a crash; a
    plain append would then duplicate the replayed batch's rows
    (foreachBatch is at-least-once). Writing each batch into its own
    ``batch_id=`` partition with dynamic partition overwrite makes the
    replay overwrite its previous (possibly partial) output instead —
    the standard exactly-once foreachBatch sink pattern."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = extract_chunks(batch_df, num_partitions=num_partitions)
        (
            chunks.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_path)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-event-type counts + value sums with a watermark
    bounding state (late rows beyond it are dropped)."""
    return (
        # event-time must be TIMESTAMP (not NTZ) for watermarking
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
