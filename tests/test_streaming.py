"""Structured Streaming: micro-batched apply, kill/restart reconvergence.

Ports the reference's lifecycle scenarios (MariadbCdc_103_Basic_Test start/
stop/resume, 76-123) to streaming: events arrive as files; the query is
stopped mid-stream and restarted from its checkpoint; the final table must be
byte-identical to a one-shot batch apply."""

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.lake import LakeTable
from mariadb_cdc_spark.streaming.stream import read_event_stream, start_cdc_stream

REPO_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _hashes(table):
    return {
        (r["repo"], r["path"]): hashlib.sha256((r["content"] or "").encode()).hexdigest()
        for r in table.read().select("repo", "path", "content").collect()
    }


def test_stream_equals_batch_with_restart(spark, sf_dir, tmp_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    cfg = CdcConfig()

    # one-shot batch reference result
    batch_table = LakeTable.create(
        spark, str(tmp_path / "batch"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    apply_batch(events, batch_table, cfg, stream_id="b", batch_id=0)
    expected = _hashes(batch_table)

    # stream the same events as 3 file chunks
    src = tmp_path / "stream_src"
    mx = events.agg(F.max("binlog_pos")).collect()[0][0]
    cuts = [0.35, 0.7, 1.0]
    lo = -1
    for i, frac in enumerate(cuts):
        hi = int(mx * frac) + 1
        chunk = events.where(
            (F.col("binlog_pos") > lo) & (F.col("binlog_pos") <= hi)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(str(src / f"chunk_{i}"))
        lo = hi

    # file-source streams read a flat dir; re-lay chunks as files
    flat = tmp_path / "flat_src"
    flat.mkdir()
    import shutil

    for i in range(len(cuts)):
        for j, f in enumerate(sorted((src / f"chunk_{i}").glob("*.parquet"))):
            shutil.copy(f, flat / f"chunk_{i}_{j}.parquet")

    stream_table = LakeTable.create(
        spark, str(tmp_path / "stream"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    ckpt = str(tmp_path / "ckpt")

    # phase 1: process one file per trigger, stop after first batch (a crash)
    ev = read_event_stream(spark, str(flat), max_files_per_trigger=1)
    q = start_cdc_stream(
        ev, stream_table, cfg, checkpoint_dir=ckpt, trigger_available_now=False
    )
    q.processAllAvailable()
    q.stop()
    v_mid = stream_table.metadata()["version"]
    assert v_mid > 0

    # phase 2: restart from checkpoint; availableNow drains the rest
    ev2 = read_event_stream(spark, str(flat))
    q2 = start_cdc_stream(ev2, stream_table, cfg, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    assert _hashes(stream_table) == expected
    events.unpersist()


def test_stream_replayed_epoch_is_noop(spark, sf_dir, tmp_path):
    """Re-running an already-committed epoch id must not change the table."""
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False)
    cfg = CdcConfig()
    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    apply_batch(events, table, cfg, stream_id="cdc", batch_id=0)
    v = table.metadata()["version"]
    h = _hashes(table)
    # simulate foreachBatch replay of epoch 0 after a sink-side crash
    apply_batch(events, table, cfg, stream_id="cdc", batch_id=0)
    assert table.metadata()["version"] == v
    assert _hashes(table) == h


def test_stream_xid_gate_carries_uncommitted_tail(spark, sf_dir, tmp_path):
    """ADVICE r1 (high): with gate_on_xid, events whose XID commit arrives
    in a LATER micro-batch must not be lost — the stream's forward-only file
    source never re-delivers them, so the carry buffer must.

    Layout: file A = all events except the final XIDs; file B = those XIDs.
    With maxFilesPerTrigger=1, A's tail past its last XID is held in epoch 0
    and must be applied in epoch 1 when B's commits arrive.
    """
    from mariadb_cdc_spark.schema import EVT_XID

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    cfg = CdcConfig(gate_on_xid=True)

    # reference result: full batch, gate satisfied by adding a final XID
    # covering everything
    mx = events.agg(
        F.max(F.struct("binlog_file", "binlog_pos")).alias("p")
    ).collect()[0]["p"]
    final_xid = spark.createDataFrame(
        [(1, mx["binlog_file"], int(mx["binlog_pos"]) + 1, EVT_XID)],
        "server_id long, binlog_file string, binlog_pos long, event_type string",
    )
    from mariadb_cdc_spark.gen import _pad_envelope

    final_xid = _pad_envelope(final_xid, {})
    full = events.unionByName(final_xid)

    batch_table = LakeTable.create(
        spark, str(tmp_path / "batch"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    apply_batch(full, batch_table, cfg, stream_id="b", batch_id=0)
    expected = _hashes(batch_table)
    assert len(expected) > 0

    flat = tmp_path / "src"
    flat.mkdir()
    events.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a"))
    final_xid.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b"))
    import shutil

    for name, d in [("a_events", "a"), ("b_commits", "b")]:
        for j, f in enumerate(sorted((tmp_path / d).glob("*.parquet"))):
            shutil.copy(f, flat / f"{name}_{j}.parquet")

    stream_table = LakeTable.create(
        spark, str(tmp_path / "stream"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    ev = read_event_stream(spark, str(flat), max_files_per_trigger=1)
    q = start_cdc_stream(
        ev, stream_table, cfg,
        checkpoint_dir=str(tmp_path / "ckpt"), trigger_available_now=False,
    )
    q.processAllAvailable()
    q.stop()

    assert _hashes(stream_table) == expected
    events.unpersist()


def test_lifecycle_listener_callbacks(spark, sf_dir, tmp_path):
    """The BinLogLifecycleListener / MariadbCdcListener.started surface
    (BinLogReaderLifecycleListenerTest.java:37-56): started fires once the
    query is live, on_batch per applied epoch with metrics, stopped on
    termination. Started/stopped ride Spark's async listener bus — poll."""
    import time

    from mariadb_cdc_spark.streaming.stream import CdcLifecycleListener

    class Recorder(CdcLifecycleListener):
        def __init__(self):
            self.started = False
            self.stopped = False
            self.batches = []

        def on_started(self, query_id):
            self.started = True

        def on_batch(self, epoch, metrics):
            self.batches.append((epoch, metrics))

        def on_stopped(self):
            self.stopped = True

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False)
    src = tmp_path / "src"
    events.coalesce(1).write.parquet(str(src))

    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    rec = Recorder()
    q = start_cdc_stream(
        read_event_stream(spark, str(src)),
        table,
        CdcConfig(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lifecycle=rec,
    )
    q.awaitTermination(120)
    for _ in range(100):  # listener-bus delivery is async
        if rec.started and rec.stopped:
            break
        time.sleep(0.1)
    assert rec.started and rec.stopped
    assert rec.batches and rec.batches[0][0] == 0
    assert rec.batches[0][1].get("version") is not None

def test_kafka_shaped_bus_stream_end_to_end(spark, sf_dir, tmp_path):
    """Bus-source integration (the 'Kafka-shaped' claim, pinned): decoded
    changes export as Debezium envelopes onto a Kafka-shaped frame
    (key/value/topic/partition/offset/timestamp — the exact column contract
    format('kafka') yields), a STREAMING query consumes them via
    read_bus_stream -> parse_debezium -> fold -> MERGE across multiple
    micro-batch epochs (one file per trigger, arbitrary file boundaries),
    and the final table is sha256-identical to the one-shot binlog apply.
    Junk bus messages (tombstones/heartbeats) are interleaved and must be
    skipped, not crash the epoch."""
    from mariadb_cdc_spark.functions.export import debezium_envelope
    from mariadb_cdc_spark.streaming.stream import (
        read_bus_stream,
        start_bus_cdc_stream,
    )

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    cfg = CdcConfig()

    batch_table = LakeTable.create(
        spark, str(tmp_path / "batch"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    bus_dir = tmp_path / "bus"
    bus_dir.mkdir()

    def producer(changes):
        # the mock Kafka producer: envelope + bus bookkeeping columns
        frame = debezium_envelope(changes, MERGE_KEYS).select(
            "key",
            "value",
            F.lit("cdc.codehub.repo_files").alias("topic"),
            F.spark_partition_id().alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
            F.current_timestamp().alias("timestamp"),
        )
        frame.coalesce(4).write.mode("append").parquet(str(bus_dir))

    apply_batch(
        events, batch_table, cfg, stream_id="b", batch_id=0,
        changes_sink=producer,
    )
    expected = _hashes(batch_table)
    assert len(expected) > 0

    # interleave non-envelope bus noise a real topic carries
    spark.createDataFrame(
        [(None, None), ('{"repo":"x"}', None), (None, "not json")],
        "key string, value string",
    ).select(
        "key", "value",
        F.lit("cdc.codehub.repo_files").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(-1).cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    ).coalesce(1).write.mode("append").parquet(str(bus_dir))

    bus_table = LakeTable.create(
        spark, str(tmp_path / "from_bus"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    frames = read_bus_stream(spark, str(bus_dir), max_files_per_trigger=1)
    q = start_bus_cdc_stream(
        frames, bus_table, cfg, checkpoint_dir=str(tmp_path / "bus_ckpt")
    )
    q.awaitTermination(180)
    assert _hashes(bus_table) == expected
    events.unpersist()
