"""DDL mid-stream -> lake schema evolution (reference
MariadbCdc_103_SchemaChange_Test.java:35-74: a column added by ALTER must be
visible in post-ALTER inserts), plus epoch-split ordering inside one batch."""

from pyspark.sql import types as T

from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.schema import EVENT_SCHEMA
from mariadb_cdc_spark.sources.lake import LakeTable

BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _events(spark, rows):
    full = []
    for r in rows:
        d = {f.name: None for f in EVENT_SCHEMA.fields}
        d.update(r)
        full.append(tuple(d[f.name] for f in EVENT_SCHEMA.fields))
    return spark.createDataFrame(full, EVENT_SCHEMA)


def _base(pos, etype, **kw):
    return {
        "server_id": 1,
        "binlog_file": "bin.000001",
        "binlog_pos": pos,
        "event_type": etype,
        **kw,
    }


def test_ddl_epoch_split_add_column(spark, tmp_table_path):
    """INSERT -> ALTER ADD COLUMN stars INT -> INSERT (with stars).
    Pre-DDL rows null-fill; post-DDL rows carry the value, typed."""
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
        _base(30, "QUERY",
              sql="alter table codehub.repo_files add column stars int"),
        # post-DDL TABLE_MAP reflects the new column
        _base(40, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15, 3],
              column_names=["repo", "path", "content", "stars"]),
        _base(50, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "b", "content": "two",
                           "stars": "42"}]),
    ]
    ev = _events(spark, rows)
    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    res = apply_batch(ev, table, CdcConfig(), stream_id="s", batch_id=0)
    assert res["epochs"] == 2  # split at the DDL

    assert [n for n, _ in table.metadata()["schema"]] == [
        "repo", "path", "content", "stars",
    ]
    assert dict(table.metadata()["schema"])["stars"] == "int"

    out = {r["path"]: r for r in table.read().collect()}
    assert out["a"]["stars"] is None  # pre-DDL row null-fills
    assert out["b"]["stars"] == 42  # typed int, not string


def test_rename_and_widen(spark, tmp_table_path):
    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
    ]
    apply_batch(_events(spark, rows), table, CdcConfig(), stream_id="s",
                batch_id=0)

    table.add_column("n", "int")
    table.rename_column("content", "body")
    table.widen_column("n", "bigint")

    names = [n for n, _ in table.metadata()["schema"]]
    assert names == ["repo", "path", "body", "n"]
    assert dict(table.metadata()["schema"])["n"] == "bigint"
    row = table.read().collect()[0]
    assert row["body"] == "one" and row["n"] is None


def test_ddl_for_other_table_ignored(spark, tmp_table_path):
    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(30, "QUERY", sql="alter table otherdb.other add column x int"),
        _base(40, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
    ]
    res = apply_batch(_events(spark, rows), table, CdcConfig(),
                      stream_id="s", batch_id=0)
    assert res["epochs"] == 1  # no split for unrelated DDL
    assert [n for n, _ in table.metadata()["schema"]] == [
        "repo", "path", "content",
    ]


def test_drop_column_metadata_only(spark, tmp_table_path):
    import pytest

    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
    ]
    apply_batch(_events(spark, rows), table, CdcConfig(), stream_id="s",
                batch_id=0)
    v_before = table.metadata()["version"]

    table.drop_column("content")
    assert [n for n, _ in table.metadata()["schema"]] == ["repo", "path"]
    assert "content" not in table.read().columns
    # metadata-only: no new data dir was written for the drop
    import os
    assert not os.path.isdir(
        os.path.join(tmp_table_path, "data", f"v{v_before + 1}")
    )
    # merge keys are protected; dropping a missing column is a no-op
    with pytest.raises(ValueError):
        table.drop_column("repo")
    table.drop_column("content")  # idempotent
    # changes() across the drop uses the to-version schema (no content col)
    ch = table.changes(v_before)
    assert "content" not in ch.columns


def test_truncate_epoch_clears_table_and_floors_replays(spark, tmp_table_path):
    """TRUNCATE in the stream (data-reset epoch, functions.ddl.
    decide_data_reset): pre-truncate rows merged then cleared, post-
    truncate rows survive, and a replayed pre-truncate event in a LATER
    batch is dropped by the position floor instead of resurrecting."""
    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
        _base(30, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "b", "content": "two"}]),
        _base(40, "QUERY", sql="truncate table codehub.repo_files"),
        _base(50, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(60, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "c", "content": "three"}]),
    ]
    res = apply_batch(_events(spark, rows), table, CdcConfig(),
                      stream_id="s", batch_id=0)
    assert res["epochs"] == 2
    assert {r["path"]: r["content"] for r in table.read().collect()} \
        == {"c": "three"}
    # time travel: the pre-truncate state is still readable
    pre = table.read(version=1)
    assert {r["path"] for r in pre.collect()} == {"a", "b"}

    # a later batch replaying a PRE-truncate event must not resurrect it
    replay = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
        _base(70, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "d", "content": "four"}]),
    ]
    apply_batch(_events(spark, replay), table, CdcConfig(),
                stream_id="s", batch_id=1)
    assert {r["path"] for r in table.read().collect()} == {"c", "d"}


def test_truncate_other_table_ignored(spark, tmp_table_path):
    table = LakeTable.create(
        spark, tmp_table_path, BASE_SCHEMA, ["repo", "path"], n_buckets=2
    )
    rows = [
        _base(10, "TABLE_MAP", table_id=7, database="codehub",
              table="repo_files", column_types=[15, 15, 15],
              column_names=["repo", "path", "content"]),
        _base(20, "WRITE_ROWS", table_id=7,
              rows_after=[{"repo": "r", "path": "a", "content": "one"}]),
        _base(30, "QUERY", sql="truncate table otherdb.other"),
    ]
    res = apply_batch(_events(spark, rows), table, CdcConfig(),
                      stream_id="s", batch_id=0)
    assert res["epochs"] == 1
    assert table.read().count() == 1
