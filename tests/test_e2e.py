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


def test_out_of_order_batches_converge_full_image(spark, sf_dir, tmp_table_path):
    """Position-gated MERGE commutativity: for FULL-row-image streams,
    applying the LATER half of the log before the EARLIER half converges to
    the same table as in-order apply (lake.py CDC gate columns).

    Scope note (validated by construction): with binlog_row_image=minimal a
    row-level gate cannot be commutative — a late partial UPDATE that lands
    first creates a row missing the earlier INSERT's columns, and the gate
    then correctly refuses the older INSERT. Making THAT commutative needs
    per-column write positions (storage cost on every row, always). The
    engine instead relies on in-order epoch delivery — which Structured
    Streaming's sequential foreachBatch guarantees — and keeps the row gate
    for what it is needed for: suffix REPLAY (replayed positions are never
    newer, so replays no-op; test_replay_duplicate_suffix_absorbed)."""
    repo = repo_table(spark, sf_dir)
    all_events = generate_events(repo, rows_per_event=3)
    # keep full-image events only: drop UPDATE_ROWS whose after-images are
    # partial (minimal row image, gen wave 2)
    events = all_events.where(
        (F.col("event_type") != "UPDATE_ROWS")
        | (F.size(F.element_at("rows_after", 1)) >= 5)
    ).cache()
    mid = events.approxQuantile("binlog_pos", [0.5], 0.0)[0]
    early = events.where(F.col("binlog_pos") <= mid)
    # a real binlog fetch always carries the TABLE_MAPs preceding its rows
    # events (the server re-emits them per transaction); the late half gets
    # its control-plane context the same way
    late = events.where(F.col("binlog_pos") > mid).unionByName(
        events.where(F.col("event_type") == "TABLE_MAP")
    )
    cfg = CdcConfig()

    in_order = LakeTable.create(
        spark, tmp_table_path + "_in", REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    apply_batch(early, in_order, cfg)
    apply_batch(late, in_order, cfg)

    reordered = LakeTable.create(
        spark, tmp_table_path + "_re", REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    apply_batch(late, reordered, cfg)
    apply_batch(early, reordered, cfg)

    assert _lake_hashes(reordered) == _lake_hashes(in_order)
    assert len(_lake_hashes(in_order)) > 50
    events.unpersist()


def test_xid_gate_holds_uncommitted_tail_until_commit(spark, sf_dir, tmp_table_path):
    """gate_on_xid: a batch cut mid-transaction applies nothing past the
    last XID; its lineage stops there too, so the next batch's
    resume_from_lineage re-reads and applies the held tail once its commit
    arrives — transactional atomicity via the resume contract."""
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, rows_per_event=3).cache()

    # last XID position = the commit horizon of batch 1
    horizon = (
        events.where(F.col("event_type") == "XID")
        .agg(F.max(F.struct("binlog_file", "binlog_pos")).alias("p"))
        .collect()[0]["p"]
    )
    # batch 1 = everything up to just after the LAST rows-event (so it ends
    # mid "transaction": rows past the horizon, commit not included)
    cfg = CdcConfig(gate_on_xid=True)
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    apply_batch(events, table, cfg, stream_id="x", batch_id=0)

    # only events <= horizon were applied
    st = replay(
        [
            e
            for e in _collect_events(events)
            if (e["binlog_file"], e["binlog_pos"])
            <= (horizon["binlog_file"], horizon["binlog_pos"])
            or e["event_type"] in ("TABLE_MAP", "FORMAT_DESCRIPTION")
        ],
        MERGE_KEYS,
        included=[f"{MAIN_DATABASE}.{MAIN_TABLE}"],
    )
    expected_gated = content_hashes(st, (MAIN_DATABASE, MAIN_TABLE), MERGE_KEYS)
    assert _lake_hashes(table) == expected_gated
    # lineage stopped at the horizon
    lin = table.lineage()["1"]
    assert (lin["file"], lin["pos"]) == (
        horizon["binlog_file"],
        horizon["binlog_pos"],
    )

    # batch 2: same stream with the tail now committed (a trailing XID);
    # resume_from_lineage re-reads the held events past the horizon
    xid_row = {f.name: None for f in events.schema.fields}
    xid_row.update(
        server_id=1, binlog_file="bin.999999", binlog_pos=4,
        event_type="XID", xid=424242,
    )
    tail_commit = events.sparkSession.createDataFrame(
        [tuple(xid_row[f.name] for f in events.schema.fields)],
        events.schema,
    )
    events2 = events.unionByName(tail_commit)
    apply_batch(
        events2, table, CdcConfig(gate_on_xid=True), stream_id="x",
        batch_id=1, resume_from_lineage=True,
    )
    st_full = replay(
        _collect_events(events),
        MERGE_KEYS,
        included=[f"{MAIN_DATABASE}.{MAIN_TABLE}"],
    )
    expected_full = content_hashes(st_full, (MAIN_DATABASE, MAIN_TABLE), MERGE_KEYS)
    assert _lake_hashes(table) == expected_full
    events.unpersist()


def test_engine_runs_under_stock_map_key_policy(spark, tmp_table_path):
    """VERDICT r1 #1: the engine must run under a stock SparkSession.

    The session fixture sets no mapKeyDedupPolicy, so the default EXCEPTION
    policy is active; any duplicate-key map build anywhere in the pipeline
    would throw DUPLICATED_MAP_KEY here.
    """
    assert (
        spark.conf.get("spark.sql.mapKeyDedupPolicy").upper() == "EXCEPTION"
    )
    repo = repo_table(spark, "/root/testdata/sf0.001")
    events = generate_events(repo, rows_per_event=2)
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    apply_batch(events, table, CdcConfig(), stream_id="stock", batch_id=0)
    assert table.read().count() > 0


def test_changes_sink_and_debezium_export(spark, sf_dir, tmp_table_path):
    """onDataChanged equivalent: the sink receives the batch's decoded
    changes (exported here as Debezium envelopes); replayed batches skip
    it; a failing sink leaves the batch uncommitted for retry."""
    from mariadb_cdc_spark.functions.export import debezium_envelope

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    table = LakeTable.create(
        spark, tmp_table_path, REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    seen = []
    def sink(changes):
        seen.append(debezium_envelope(changes, MERGE_KEYS).collect())

    apply_batch(
        events, table, CdcConfig(), stream_id="s", batch_id=0,
        changes_sink=sink,
    )
    assert len(seen) == 1 and len(seen[0]) > 100
    import json as _json

    vals = [_json.loads(r["value"]) for r in seen[0]]
    keys = [_json.loads(r["key"]) for r in seen[0]]
    assert all(set(k) == {"repo", "path"} and k["repo"] for k in keys)
    ops = {v["op"] for v in vals}
    assert ops == {"c", "u", "d"}
    ins = next(v for v in vals if v["op"] == "c")
    assert "before" not in ins and ins["after"]["content"]
    assert ins["source"]["connector"] == "mariadb-cdc-spark"
    assert ins["source"]["table"] == "repo_files" and ins["ts_ms"] > 0
    dele = next(v for v in vals if v["op"] == "d")
    assert "after" not in dele

    # replayed (already-committed) batch: sink NOT re-fired
    apply_batch(
        events, table, CdcConfig(), stream_id="s", batch_id=0,
        changes_sink=sink,
    )
    assert len(seen) == 1

    # failing sink: batch stays uncommitted; retry re-merges (gated
    # no-ops) and re-fires the sink — state unchanged, delivery completes
    before_hashes = _lake_hashes(table)
    def boom(_):
        raise RuntimeError("sink down")

    try:
        apply_batch(
            events, table, CdcConfig(), stream_id="s", batch_id=1,
            changes_sink=boom,
        )
        raise AssertionError("sink failure must propagate")
    except RuntimeError:
        pass
    assert table.committed_batch("s") == 0
    apply_batch(
        events, table, CdcConfig(), stream_id="s", batch_id=1,
        changes_sink=sink,
    )
    assert len(seen) == 2 and table.committed_batch("s") == 1
    assert _lake_hashes(table) == before_hashes
    events.unpersist()


def test_debezium_roundtrip_feeds_fold(spark):
    """Envelope symmetry: export -> parse restores the change records, and
    the parsed bus stream folds exactly like the native one; junk bus
    messages are skipped."""
    import datetime as dt

    from mariadb_cdc_spark.functions.export import (
        debezium_envelope,
        parse_debezium,
    )
    from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("INSERT", "db", "tbl", t0, None,
         {"repo": "r1", "path": "a", "content": "v1"}, 1, "bin.000001", 100, 0),
        ("UPDATE", "db", "tbl", t0, {"repo": "r1", "path": "a"},
         {"content": "v2"}, 1, "bin.000001", 200, 0),
        ("DELETE", "db", "tbl", t0, {"repo": "r2", "path": "b"},
         None, 1, "bin.000001", 300, 0),
    ]
    schema = (
        "op string, database string, table string, ts timestamp,"
        " before map<string,string>, after map<string,string>,"
        " server_id long, binlog_file string, binlog_pos long, row_idx int"
    )
    changes = spark.createDataFrame(rows, schema)
    bus = debezium_envelope(changes, ["repo", "path"])
    junk = spark.createDataFrame(
        [("k", None), ("k", '{"noise": true}')], "key string, value string"
    )
    parsed = parse_debezium(bus.unionByName(junk))
    got = sorted(
        [r.asDict(recursive=True) for r in parsed.collect()],
        key=lambda r: r["binlog_pos"],
    )
    want = sorted(
        [r.asDict(recursive=True) for r in changes.collect()],
        key=lambda r: r["binlog_pos"],
    )
    assert got == want

    folded = fold_changes(
        extract_keys(parsed, ["repo", "path"]), ["repo", "path"]
    ).collect()
    out = {(r["repo"], r["path"]): r for r in folded}
    assert out[("r1", "a")]["image"]["content"] == "v2"
    assert out[("r2", "b")]["final_op"] == "DELETE"


def test_query_noise_is_inert(spark, sf_dir, tmp_path):
    """Per-transaction BEGIN QUERY events + unrelated-table DDLs (the
    production event mix, gen include_query_noise) must not change the
    final table state, epoch count, or schema under apply_ddl=True — the
    rlike prefilter drops the BEGINs in-plan and the classifier discards
    the foreign DDLs without an epoch split."""
    repo = repo_table(spark, sf_dir)
    plain = generate_events(repo, include_audit=False)
    noisy = generate_events(repo, include_audit=False, include_query_noise=True)
    assert noisy.count() > plain.count()  # the noise is really there

    out = {}
    for name, ev in [("plain", plain), ("noisy", noisy)]:
        table = LakeTable.create(
            spark, str(tmp_path / name), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
        )
        res = apply_batch(ev, table, CdcConfig(), stream_id="t", batch_id=0)
        assert res["epochs"] == 1  # no split for BEGIN/foreign DDL
        assert [n for n, _ in table.metadata()["schema"]] == [
            "repo", "path", "commit", "lang", "content",
        ]
        out[name] = _lake_hashes(table)
    assert out["noisy"] == out["plain"]
