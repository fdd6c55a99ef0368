"""Multi-table apply: one decode pass, per-table MERGE targets (reference
listener semantics — all registered tables through one callback stream,
interleaved TABLE_MAPs attribute rows correctly:
BinaryLogEventProcessorTest.java:217-256)."""

from pyspark.sql import types as T

from mariadb_cdc_spark.gen import (
    AUDIT_TABLE,
    MAIN_DATABASE,
    MAIN_TABLE,
    MERGE_KEYS,
    generate_events,
    repo_table,
)
from mariadb_cdc_spark.pipeline import apply_batch_multi
from mariadb_cdc_spark.sources.lake import LakeTable

REPO_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
AUDIT_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ["audit_id", "repo", "action"]]
)


def test_multi_table_apply(spark, sf_dir, tmp_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=True).cache()

    main = LakeTable.create(
        spark, str(tmp_path / "main"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    audit = LakeTable.create(
        spark, str(tmp_path / "audit"), AUDIT_SCHEMA, ["audit_id"], n_buckets=2
    )
    res = apply_batch_multi(
        events,
        {
            (MAIN_DATABASE, MAIN_TABLE): (main, MERGE_KEYS),
            (MAIN_DATABASE, AUDIT_TABLE): (audit, ["audit_id"]),
        },
        stream_id="m",
        batch_id=0,
    )
    assert not res[(MAIN_DATABASE, MAIN_TABLE)].get("skipped")
    n_main = main.read().count()
    n_audit = audit.read().count()
    assert n_main > 100
    assert n_audit > 10
    # audit rows only carry audit columns; main rows only repo columns
    arow = audit.read().collect()[0]
    assert arow["action"] == "touch"
    # replay the same batch id: both skipped
    res2 = apply_batch_multi(
        events,
        {
            (MAIN_DATABASE, MAIN_TABLE): (main, MERGE_KEYS),
            (MAIN_DATABASE, AUDIT_TABLE): (audit, ["audit_id"]),
        },
        stream_id="m",
        batch_id=0,
    )
    assert res2[(MAIN_DATABASE, MAIN_TABLE)] == {"skipped": True}
    assert res2[(MAIN_DATABASE, AUDIT_TABLE)] == {"skipped": True}
    assert main.read().count() == n_main
    events.unpersist()


def test_multi_table_matches_single_table_apply(spark, sf_dir, tmp_path):
    """The main table's final state must be identical whether applied alone
    or alongside other tables."""
    import hashlib

    from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=True).cache()

    solo = LakeTable.create(
        spark, str(tmp_path / "solo"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    apply_batch(events, solo, CdcConfig(), stream_id="s", batch_id=0)

    main = LakeTable.create(
        spark, str(tmp_path / "multi"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    audit = LakeTable.create(
        spark, str(tmp_path / "audit2"), AUDIT_SCHEMA, ["audit_id"], n_buckets=2
    )
    apply_batch_multi(
        events,
        {
            (MAIN_DATABASE, MAIN_TABLE): (main, MERGE_KEYS),
            (MAIN_DATABASE, AUDIT_TABLE): (audit, ["audit_id"]),
        },
        stream_id="m",
        batch_id=0,
    )

    def h(t):
        return {
            (r["repo"], r["path"]): hashlib.sha256(
                (r["content"] or "").encode()
            ).hexdigest()
            for r in t.read().select("repo", "path", "content").collect()
        }

    assert h(solo) == h(main)
    events.unpersist()


def test_multi_server_lineage_tracked_per_server(spark, tmp_path):
    """Sharded upstream (two server_ids, disjoint key ranges) through ONE
    apply: lineage must record each server's own max position, and
    resuming each server independently via events_after must keep only
    its yet-unseen suffix (the per-partition lineage of the north rule)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
    from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
    from mariadb_cdc_spark.sources.checkpoint import events_after
    from mariadb_cdc_spark.sources.lake import LakeTable

    repo = repo_table(spark, "/root/testdata/sf0.001")
    shard = F.pmod(F.xxhash64("repo", "path"), F.lit(2))
    ev1 = generate_events(repo.where(shard == 0), server_id=1)
    ev2 = generate_events(repo.where(shard == 1), server_id=2)
    ev = ev1.unionByName(ev2)

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, MERGE_KEYS, n_buckets=4
    )
    apply_batch(ev, table, CdcConfig(), stream_id="ms", batch_id=0)

    lin = table.lineage()
    assert set(lin) == {"1", "2"}
    for sid, src in (("1", ev1), ("2", ev2)):
        mx = src.agg(
            F.max(F.struct("binlog_file", "binlog_pos")).alias("m")
        ).collect()[0]["m"]
        assert (lin[sid]["file"], lin[sid]["pos"]) == (mx[0], mx[1])
    # per-server resume: every position-advancing (data) event is filtered
    # out; events_after deliberately keeps metadata events (FD/TABLE_MAP)
    # because a rows event is only decodable through its preceding map
    from mariadb_cdc_spark.operators.filters import position_advancing

    kept = events_after(ev, lin)
    assert position_advancing(kept).count() == 0
    assert kept.count() > 0  # the metadata prefix is preserved
    # a new event past server 1's position survives the filter alone
    tail = ev1.where(F.col("event_type") == "WRITE_ROWS").limit(1).withColumn(
        "binlog_pos", F.col("binlog_pos") + F.lit(10_000_000)
    ).withColumn("binlog_file", F.lit("bin.999999"))
    assert position_advancing(
        events_after(ev.unionByName(tail), lin)
    ).count() == 1


def test_auto_provisioning_matches_explicit_multi(spark, sf_dir, tmp_path):
    """apply_batch_auto discovers tables from TABLE_MAPs, creates lake
    tables on first sight, and lands the same state as the explicitly
    configured multi-table apply; exclusions skip provisioning."""
    import os

    from mariadb_cdc_spark.pipeline import apply_batch_auto

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=True).cache()

    # explicit reference result
    main = LakeTable.create(
        spark, str(tmp_path / "ref_main"), REPO_SCHEMA, MERGE_KEYS, n_buckets=4
    )
    audit = LakeTable.create(
        spark, str(tmp_path / "ref_audit"), AUDIT_SCHEMA, ["audit_id"],
        n_buckets=2,
    )
    apply_batch_multi(
        events,
        {
            (MAIN_DATABASE, MAIN_TABLE): (main, MERGE_KEYS),
            (MAIN_DATABASE, AUDIT_TABLE): (audit, ["audit_id"]),
        },
        stream_id="m", batch_id=0,
    )

    root = str(tmp_path / "auto")
    res = apply_batch_auto(
        events, root, stream_id="m", batch_id=0,
        keys_for=lambda db, t, cols: MERGE_KEYS if t == MAIN_TABLE else cols[:1],
    )
    assert set(res) == {
        (MAIN_DATABASE, MAIN_TABLE), (MAIN_DATABASE, AUDIT_TABLE)
    }
    auto_main = LakeTable(spark, os.path.join(root, f"{MAIN_DATABASE}.{MAIN_TABLE}"))
    auto_audit = LakeTable(spark, os.path.join(root, f"{MAIN_DATABASE}.{AUDIT_TABLE}"))

    def rows(t, cols):
        return sorted(map(tuple, t.read().select(*cols).collect()))

    main_cols = ["repo", "path", "commit", "lang", "content"]
    assert rows(auto_main, main_cols) == rows(main, main_cols)
    assert rows(auto_audit, AUDIT_SCHEMA.fieldNames()) == rows(
        audit, AUDIT_SCHEMA.fieldNames()
    )
    # keys_for default (first column) was applied to the audit table
    assert auto_audit.metadata()["keys"] == ["audit_id"]

    # excluded tables are neither provisioned nor applied
    root2 = str(tmp_path / "auto2")
    res2 = apply_batch_auto(
        events, root2, stream_id="m", batch_id=0,
        keys_for=lambda db, t, cols: MERGE_KEYS if t == MAIN_TABLE else cols[:1],
        excluded_tables=[f"{MAIN_DATABASE}.{AUDIT_TABLE}"],
    )
    assert set(res2) == {(MAIN_DATABASE, MAIN_TABLE)}
    assert not os.path.exists(
        os.path.join(root2, f"{MAIN_DATABASE}.{AUDIT_TABLE}")
    )
    events.unpersist()
