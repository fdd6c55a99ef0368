"""Snapshot-then-stream bootstrap (operators.bootstrap): seed the lake from
a consistent snapshot + captured position, tail only post-snapshot events.
Reference starts tailing at the current master position with table contents
assumed pre-loaded (MariadbCdc.java:96-114); here the pre-load is a
replay-safe engine primitive."""

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.operators.bootstrap import (
    bootstrap_snapshot,
    snapshot_position,
)
from mariadb_cdc_spark.operators.filters import position_advancing
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.checkpoint import batch_lineage, events_after
from mariadb_cdc_spark.sources.lake import LakeTable

from tests.test_ivm_history import REPO_SCHEMA, split_by_wave

SF = "/root/testdata/sf0.001"


def _new_table(spark, prefix):
    tmp = tempfile.mkdtemp(prefix=prefix)
    return LakeTable.create(
        spark, f"{tmp}/repo_files", REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )


def _state(table):
    rows = table.read().select("repo", "path", "commit", "lang", "content")
    return sorted(tuple(r) for r in rows.collect())


@pytest.fixture(scope="module")
def stream(spark):
    repo = repo_table(spark, SF)
    events = generate_events(repo, include_audit=False)
    b0, b1 = split_by_wave(events, repo.count(), max_wave_b0=0)
    # The snapshot is consistent as-of the last CHANGE it reflects — compute
    # its position from b0's data events only (split_by_wave replicates the
    # gtid-less control events of every file into both halves, and a rotate
    # at the tip of the log must not drag the snapshot position forward).
    pos = batch_lineage(b0.where(F.col("gtid").isNotNull()))
    return repo, events, b0, pos


def test_bootstrap_plus_tail_equals_full_replay(spark, stream):
    repo, events, _, pos = stream
    cfg = CdcConfig()

    full = _new_table(spark, "cdc_boot_full_")
    apply_batch(events, full, cfg, stream_id="full", batch_id=0)

    boot = _new_table(spark, "cdc_boot_bs_")
    # Wave 0 is the full-image INSERT of every key, so the repo table IS the
    # state as of b0's max data-event position — a consistent snapshot + its
    # captured position.
    bootstrap_snapshot(repo, boot, pos, stream_id="bs", batch_id=0)
    # Tail the WHOLE stream (b0 included): resume_from_lineage must prune
    # the pre-snapshot prefix.
    apply_batch(
        events, boot, cfg, stream_id="bs", batch_id=1,
        resume_from_lineage=True,
    )
    assert _state(boot) == _state(full)


def test_lineage_committed_and_scan_pruned(spark, stream):
    repo, _, b0, pos = stream
    boot = _new_table(spark, "cdc_boot_lin_")
    bootstrap_snapshot(repo, boot, pos, stream_id="bs", batch_id=0)
    lin = boot.lineage()
    for server, p in pos.items():
        assert lin[server]["file"] == p["file"]
        assert lin[server]["pos"] == p["pos"]
    # the captured-position filter removes every pre-snapshot DATA event;
    # metadata events (FD/TABLE_MAP) are deliberately kept — a later rows
    # event is only decodable through its preceding TABLE_MAP
    kept = events_after(b0, lin)
    # every remaining position-advancing event is non-data (the control
    # events past the snapshot point that split_by_wave replicated into b0)
    assert position_advancing(kept).where(
        F.col("gtid").isNotNull()
    ).count() == 0
    # metadata events (FD/TABLE_MAP) are kept across the resume point
    assert kept.where(
        F.col("event_type").isin("FORMAT_DESCRIPTION", "TABLE_MAP")
    ).count() > 0


def test_pre_snapshot_replay_is_gated_even_without_resume(spark, stream):
    repo, _, b0, pos = stream
    cfg = CdcConfig()
    boot = _new_table(spark, "cdc_boot_gate_")
    bootstrap_snapshot(repo, boot, pos, stream_id="bs", batch_id=0)
    before = _state(boot)
    # replay the pre-snapshot events WITHOUT the lineage filter: every
    # folded update carries a position <= the snapshot stamp, so the
    # per-key merge gate rejects all of them
    apply_batch(b0, boot, cfg, stream_id="bs", batch_id=1)
    assert _state(boot) == before


def test_bootstrap_refuses_populated_table(spark, stream):
    repo, _, _, pos = stream
    boot = _new_table(spark, "cdc_boot_refuse_")
    bootstrap_snapshot(repo, boot, pos, stream_id="bs", batch_id=0)
    with pytest.raises(ValueError, match="empty table"):
        bootstrap_snapshot(repo, boot, pos, stream_id="bs2", batch_id=0)


def test_snapshot_position_picks_max_across_servers():
    lin = {
        "1": {"file": "binlog.000002", "pos": 900},
        "2": {"file": "binlog.000002", "pos": 1400},
    }
    assert snapshot_position(lin) == ("binlog.000002", 1400)
    with pytest.raises(ValueError):
        snapshot_position({})


def test_overlapping_event_at_snapshot_position_loses(spark):
    """An event AT the snapshot position (same file/pos, any row_idx) is
    already reflected in the snapshot and must lose the gate — the
    snapshot/stream overlap guarantee."""
    snap = spark.createDataFrame(
        [("r", "p", "c0", "py", "body")],
        ["repo", "path", "commit", "lang", "content"],
    )
    boot = _new_table(spark, "cdc_boot_tie_")
    lin = {"1": {"file": "binlog.000001", "pos": 500}}
    bootstrap_snapshot(snap, boot, lin, stream_id="bs", batch_id=0)
    dup = spark.createDataFrame(
        [("r", "p", "UPSERT", {"content": "stale"}, "binlog.000001", 500, 7,
          1)],
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("final_op", T.StringType()),
            T.StructField(
                "image", T.MapType(T.StringType(), T.StringType())
            ),
            T.StructField("last_file", T.StringType()),
            T.StructField("last_pos", T.LongType()),
            T.StructField("last_row_idx", T.IntegerType()),
            T.StructField("n_changes", T.LongType()),
        ]),
    )
    boot.merge(dup, stream_id="bs", batch_id=1)
    row = boot.read().select("content").collect()[0]
    assert row["content"] == "body"
