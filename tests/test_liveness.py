"""S8/C1 liveness + STOP-event semantics (VERDICT r1 #9/#10): heartbeat
cadence, stalled-source detection (BinLogReader.java:333-380,
BinLogReaderHeartbeatTest.java:56-63), STOP position semantics
(BinlogEventType.java)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.operators.decode import decode_rows_events
from mariadb_cdc_spark.operators.filters import position_advancing
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.schema import EVT_HEARTBEAT, EVT_STOP
from mariadb_cdc_spark.sources.checkpoint import (
    batch_lineage,
    liveness_metrics,
    stalled_servers,
)
from mariadb_cdc_spark.sources.lake import LakeTable
from tests.test_e2e import REPO_SCHEMA
from tests.test_processor_semantics import _events


def hb(pos, ts_epoch, server_id=1, file="bin.000001"):
    return {
        "server_id": server_id,
        "binlog_file": file,
        "binlog_pos": pos,
        "event_type": EVT_HEARTBEAT,
        "ts": __import__("datetime").datetime.utcfromtimestamp(ts_epoch),
    }


def test_heartbeat_only_batch_advances_lineage(spark, tmp_table_path):
    """Heartbeats are position-advancing liveness carriers: a batch with
    NOTHING but heartbeats still moves the checkpoint forward."""
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=2
    )
    ev = _events(spark, [hb(100, 1000), hb(200, 1002), hb(300, 1004)])
    res = apply_batch(
        ev, table, CdcConfig(track_liveness=True), stream_id="hb", batch_id=0
    )
    assert res["lineage"]["1"]["pos"] == 300
    assert table.lineage()["1"]["pos"] == 300
    lv = res["liveness"]["1"]
    assert lv["n_heartbeats"] == 3
    assert abs(lv["heartbeat_interval_seconds"] - 2.0) < 1e-6
    assert table.metadata()["liveness"]["1"]["n_heartbeats"] == 3


def test_silence_window_surfaced_and_stall_detected(spark):
    ev = _events(
        spark,
        [hb(100, 1000), hb(200, 1010), hb(300, 1010 + 7200)],  # 2h gap
    )
    lv = liveness_metrics(ev)
    assert lv["1"]["max_silence_seconds"] >= 7200
    # now = 10 min after last event, timeout 5 min -> stalled
    now = 1010 + 7200 + 600
    assert stalled_servers(lv, now_epoch=now, keep_timeout_seconds=300) == ["1"]
    assert (
        stalled_servers(lv, now_epoch=now, keep_timeout_seconds=3600) == []
    )


def test_stop_event_position_semantics(spark, sf_dir, tmp_table_path):
    """STOP advances the position (it is not in the no-save set), carries
    no rows, and flows through the full apply without effect on data."""
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False, include_stop=True)
    stops = events.where(F.col("event_type") == EVT_STOP)
    assert stops.count() == 1
    assert position_advancing(stops).count() == 1
    assert decode_rows_events(stops).count() == 0

    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    res = apply_batch(events, table, CdcConfig(), stream_id="s", batch_id=0)
    # lineage reflects the STOP's sentinel position (it sorts last)
    assert res["lineage"]["1"]["file"] == "bin.999999"
    assert table.read().count() > 0
