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
