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

import os
import shutil
from dataclasses import replace

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import CdcConfig, apply_batch
from ..schema import EVENT_SCHEMA
from ..sources.checkpoint import split_on_xid
from ..sources.lake import LakeTable


class CdcLifecycleListener:
    """Stream lifecycle callbacks — the BinLogLifecycleListener /
    MariadbCdcListener.started surface (BinLogLifecycleListener.java:5-11,
    MariadbCdcListener.java:9-15, BinLogReaderLifecycleListenerTest.java:
    37-56). Spark mapping: `on_started` fires once the StreamingQuery is
    live (the reader-thread onConnected+onStarted pair collapses — there is
    no separate socket phase), `on_batch` after each committed epoch with
    its apply metrics, `on_stopped` when the query terminates, and
    `on_start_failed` if the query could not start at all.

    Divergence kept deliberate: batch FAILURES are not swallowed (the
    reference logs listener exceptions and advances the position,
    BinaryLogEventProcessor.java:106-113; this engine fails the epoch and
    replays it — exactly-once beats at-least-once-with-drops). Callbacks
    themselves run driver-side and are invoked outside the apply, so a
    listener bug cannot corrupt a committed batch either.
    """

    def on_started(self, query) -> None:  # pragma: no cover - default noop
        pass

    def on_batch(self, epoch: int, metrics: dict) -> None:  # pragma: no cover
        pass

    def on_stopped(self) -> None:  # pragma: no cover - default noop
        pass

    def on_start_failed(self, exc: Exception) -> None:  # pragma: no cover
        pass


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


def read_bus_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka-SHAPED streaming source of change-envelope frames.

    Yields the column contract `spark.readStream.format("kafka")` produces
    once key/value are cast to string — (key, value, topic, partition,
    offset, timestamp) — backed by parquet files so the identical downstream
    plan (parse_debezium -> fold -> MERGE) is testable without a broker. A
    production deployment swaps this one reader call for the Kafka format
    (the sandbox ships no spark-sql-kafka package or broker); everything
    downstream is byte-identical because it only touches these columns.
    """
    reader = spark.readStream.schema(
        "key string, value string, topic string, partition int,"
        " offset long, timestamp timestamp"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def start_bus_cdc_stream(
    frames: DataFrame,
    table: LakeTable,
    cfg: CdcConfig,
    *,
    checkpoint_dir: str,
    stream_id: str = "bus",
    trigger_available_now: bool = True,
):
    """Consume a Debezium-enveloped bus stream (e.g. a Kafka CDC topic
    another connector populates) into a lake table — the inverse-connector
    counterpart of start_cdc_stream for streams that arrive ALREADY decoded
    to change records (no TABLE_MAP/wire-decode stages; the envelope carries
    named string images).

    Per epoch: parse_debezium (pure from_json projection; tombstone/
    heartbeat bus messages drop) -> include/exclude table filter -> the same
    ordered LWW fold -> position-gated exactly-once MERGE keyed
    (stream_id, epoch). Replayed epochs skip via the committed-batch check,
    exactly like the binlog path.
    """
    from ..functions.export import parse_debezium
    from ..operators.filters import filter_tables
    from ..pipeline import fold_for_merge

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        if epoch <= table.committed_batch(stream_id):
            return
        changes = parse_debezium(batch_df).withColumn(
            "has_column_names", F.lit(True)
        )
        include = cfg.included_tables
        if include is None:
            include = [f"{cfg.database}.{cfg.table}"]
        changes = filter_tables(changes, include, cfg.excluded_tables)
        folded = fold_for_merge(changes, cfg)
        table.merge(folded, stream_id=stream_id, batch_id=epoch)

    writer = (
        frames.writeStream.foreachBatch(_apply)
        .queryName(f"cdc-bus-{stream_id}")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_cdc_stream(
    events: DataFrame,
    table: LakeTable,
    cfg: CdcConfig,
    *,
    checkpoint_dir: str,
    stream_id: str = "cdc",
    trigger_available_now: bool = True,
    agg_views: list | None = None,
    lifecycle: CdcLifecycleListener | None = None,
    changes_sink=None,
):
    """Run the CDC apply as a streaming query; returns the StreamingQuery.

    `changes_sink` (callable(DataFrame)) is the onDataChanged equivalent:
    per epoch it receives the decoded row-level change records for a
    custom downstream sink; at-least-once delivery under replay (see
    pipeline.apply_batch).

    `lifecycle` (CdcLifecycleListener) mirrors the reference's listener
    surface: on_batch fires synchronously after each applied epoch with its
    metrics; on_started/on_stopped ride Spark's StreamingQueryListener (an
    async driver-side delivery thread — observable shortly after the fact,
    never blocking the stream); on_start_failed fires if the query cannot
    start.

    `agg_views` (operators.ivm.AggView) are maintained incrementally per
    micro-batch from the merge delta; ivm's per-table-version idempotence
    composes with the epoch replay contract (a replayed epoch's merge is
    skipped, so its view maintenance is too).

    XID gating under streaming: the file source is forward-only (its
    checkpoint advances past consumed files), so events held back by the
    XID gate would be LOST if we relied on re-delivery. Instead each epoch
    persists its held (uncommitted-tail) events to an explicit carry buffer
    under the checkpoint dir and merges the previous epoch's buffer into the
    next batch. The buffer write is idempotent per epoch (overwrite), so a
    replayed epoch rewrites the identical carry; pruning keeps only the last
    two epochs. (Local-FS paths here; an object-store deployment would use
    the same layout via the Hadoop FileSystem API.)
    """
    carry_root = os.path.join(checkpoint_dir, "xid_carry")

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        # Persist the micro-batch: apply_batch and the XID gate run several
        # actions over it, and an unpersisted foreachBatch frame re-scans the
        # source (and re-runs any upstream decode, e.g. unframe+CRC) once per
        # action. MEMORY_AND_DISK also makes upstream `observe()` metrics
        # (frame_gate) exact — the scan-side accumulator fires once.
        batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        df, eff_cfg = batch_df, cfg
        if cfg.gate_on_xid:
            prev = _read_carry(batch_df.sparkSession, carry_root, epoch)
            if prev is not None:
                df = df.unionByName(prev)
            committed, held = split_on_xid(df)
            # persist the held tail BEFORE the apply: a crash mid-apply
            # replays this epoch and rewrites the identical carry
            held.write.mode("overwrite").parquet(
                os.path.join(carry_root, str(epoch))
            )
            # already gated here; don't re-collect the commit bound inside
            df, eff_cfg = committed, replace(cfg, gate_on_xid=False)
        try:
            res = apply_batch(
                df,
                table,
                eff_cfg,
                stream_id=stream_id,
                batch_id=epoch,
                agg_views=agg_views,
                changes_sink=changes_sink,
            )
        finally:
            batch_df.unpersist()
        if cfg.gate_on_xid:
            _prune_carry(carry_root, keep_from=epoch - 1)
        if lifecycle is not None:
            lifecycle.on_batch(epoch, res)

    query_name = f"cdc-{stream_id}"
    writer = (
        events.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if lifecycle is not None:
        _register_lifecycle(events.sparkSession, query_name, lifecycle)
    try:
        query = writer.start()
    except Exception as e:  # startFailed (MariadbCdcListener.java:11-13)
        if lifecycle is not None:
            lifecycle.on_start_failed(e)
        raise
    return query


def _register_lifecycle(spark, query_name: str, lifecycle) -> None:
    """Bridge CdcLifecycleListener onto Spark's StreamingQueryListener,
    scoped to one query by name and self-removing on termination."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Adapter(StreamingQueryListener):
        def __init__(self):
            self._qid = None

        def onQueryStarted(self, event):
            if event.name == query_name and self._qid is None:
                self._qid = str(event.id)
                lifecycle.on_started(event.id)

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            # terminated events carry no name: match the id captured at start
            if self._qid is not None and str(event.id) == self._qid:
                lifecycle.on_stopped()
                spark.streams.removeListener(self)

    spark.streams.addListener(_Adapter())


def _read_carry(
    spark: SparkSession, carry_root: str, epoch: int
) -> DataFrame | None:
    """Latest persisted carry buffer from an epoch strictly before `epoch`
    (normally epoch-1; after a restart, whatever survived pruning)."""
    if not os.path.isdir(carry_root):
        return None
    prior = [
        int(d) for d in os.listdir(carry_root) if d.isdigit() and int(d) < epoch
    ]
    if not prior:
        return None
    path = os.path.join(carry_root, str(max(prior)))
    return spark.read.schema(EVENT_SCHEMA).parquet(path)


def _prune_carry(carry_root: str, keep_from: int) -> None:
    """Drop carry buffers older than keep_from (epoch replay only ever reads
    one epoch back, so two retained buffers bound the storage)."""
    if not os.path.isdir(carry_root):
        return
    for d in os.listdir(carry_root):
        if d.isdigit() and int(d) < keep_from:
            shutil.rmtree(os.path.join(carry_root, d), ignore_errors=True)
