"""End-to-end: synthetic binlog events -> pipeline -> lake table, verified
against the sequential pure-Python oracle by per-key sha256(content)
(the BASELINE.json replay-to-identical-state invariant)."""

import hashlib

from pyspark.sql import functions as F

from mariadb_cdc_spark.gen import (
    MAIN_DATABASE,
    MAIN_TABLE,
    MERGE_KEYS,
    generate_events,
    repo_table,
)
from mariadb_cdc_spark.oracle import content_hashes, replay
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.lake import LakeTable
from pyspark.sql import types as T

REPO_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _collect_events(events):
    return [r.asDict(recursive=True) for r in events.collect()]


def _lake_hashes(table):
    rows = table.read().select("repo", "path", "content").collect()
    return {
        (r["repo"], r["path"]): hashlib.sha256(
            (r["content"] or "").encode()
        ).hexdigest()
        for r in rows
    }


def test_pipeline_matches_oracle(spark, sf_dir, tmp_table_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, rows_per_event=3).cache()

    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    cfg = CdcConfig()
    res = apply_batch(events, table, cfg, stream_id="t", batch_id=0)
    assert res["epochs"] == 1

    st = replay(
        _collect_events(events),
        MERGE_KEYS,
        included=[f"{MAIN_DATABASE}.{MAIN_TABLE}"],
    )
    expected = content_hashes(st, (MAIN_DATABASE, MAIN_TABLE), MERGE_KEYS)
    actual = _lake_hashes(table)
    assert len(expected) > 50
    assert actual == expected
    events.unpersist()


def test_replay_duplicate_suffix_absorbed(spark, sf_dir, tmp_table_path):
    """At-least-once absorption: re-applying a duplicate suffix of the event
    stream (what a crash between delivery and position-save causes in the
    reference, BinaryLogEventProcessor.java:106-113) converges to the same
    state."""
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo).cache()

    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    cfg = CdcConfig()
    apply_batch(events, table, cfg, stream_id="t", batch_id=0)
    v1 = _lake_hashes(table)

    # duplicate suffix: last ~30% of positions replayed as a new batch
    mx = events.agg(F.max("binlog_pos")).collect()[0][0]
    suffix = events.where(F.col("binlog_pos") > mx * 0.7)
    assert suffix.count() > 0
    apply_batch(suffix, table, cfg, stream_id="t", batch_id=1)
    assert _lake_hashes(table) == v1
    events.unpersist()


def test_exactly_once_batch_skip(spark, sf_dir, tmp_table_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False)
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    cfg = CdcConfig()
    apply_batch(events, table, cfg, stream_id="s", batch_id=7)
    v = table.metadata()["version"]
    res = apply_batch(events, table, cfg, stream_id="s", batch_id=7)
    assert res == {"skipped": True}
    assert table.metadata()["version"] == v


def test_resume_from_lineage(spark, sf_dir, tmp_table_path):
    """Split the stream at a position boundary; applying part 1 then the FULL
    stream with resume_from_lineage must equal one-shot apply (the
    FileBinlogPositionTracker resume semantics)."""
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo).cache()

    one_shot = LakeTable.create(
        spark, tmp_table_path + "_a", REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    cfg = CdcConfig()
    apply_batch(events, one_shot, cfg, stream_id="s", batch_id=0)

    resumed = LakeTable.create(
        spark, tmp_table_path + "_b", REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    # First batch = a true (binlog_file, binlog_pos) PREFIX of the stream —
    # the reference's single-position checkpoint assumes in-order consumption.
    # The second batch contains rows events whose TABLE_MAP arrived only in
    # the first; the engine's persisted registry (TableInfos semantics) must
    # cover them.
    positions = sorted(
        (r["binlog_file"], r["binlog_pos"])
        for r in events.select("binlog_file", "binlog_pos").distinct().collect()
    )
    cut = positions[len(positions) // 2]
    first = events.where(
        F.struct("binlog_file", "binlog_pos")
        <= F.struct(
            F.lit(cut[0]).alias("binlog_file"),
            F.lit(int(cut[1])).cast("long").alias("binlog_pos"),
        )
    )
    apply_batch(first, resumed, cfg, stream_id="s", batch_id=0)
    assert resumed.lineage()  # position checkpointed
    apply_batch(
        events, resumed, cfg, stream_id="s", batch_id=1, resume_from_lineage=True
    )
    assert _lake_hashes(one_shot) == _lake_hashes(resumed)
    events.unpersist()
