"""Structured Streaming front-end: continuous binlog tail -> lake MERGE.

The reference's continuous mode is a blocking reader thread pushing events to
callbacks (DefaultBinaryLogWrapper.java:90-100). Spark-native equivalent: a
streaming source over the event envelope (file source here; Kafka/socket in
production — same envelope schema) driving foreachBatch, where each
micro-batch runs the full batch pipeline (pipeline.apply_batch) with the
epoch id as the exactly-once batch key.

Delivery contract vs the reference (SURVEY.md §3.4):
  reference: at-least-once, listener exceptions swallowed but position still
             advanced (can silently drop deliveries).
  this engine: exactly-once — a failed batch fails the query (retry replays
             the same epoch id; LakeTable.merge skips already-committed
             epochs; the fold/dedup absorbs replayed suffixes).

Restart/resume: Structured Streaming's checkpointLocation stores source
offsets; the lake's (stream_id, batch_id) + binlog lineage make the sink
idempotent — kill the query at any point and restart converges to the
identical table (test_streaming.py proves it by sha256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import CdcConfig, apply_batch
from ..schema import EVENT_SCHEMA
from ..sources.lake import LakeTable


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source of binlog-shaped parquet events.

    Files arriving in `source_dir` are discovered in order; at cluster scale
    the same envelope would come from Kafka (`format("kafka")`) with
    identical downstream stages.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def start_cdc_stream(
    events: DataFrame,
    table: LakeTable,
    cfg: CdcConfig,
    *,
    checkpoint_dir: str,
    stream_id: str = "cdc",
    trigger_available_now: bool = True,
):
    """Run the CDC apply as a streaming query; returns the StreamingQuery."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_batch(
            batch_df,
            table,
            cfg,
            stream_id=stream_id,
            batch_id=int(epoch_id),
        )

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
