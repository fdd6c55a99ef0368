"""Column-name side channel (J2): port of
MariadbCdc_NoColumnNames_Test.java:39-81 plus the cache/invalidation
semantics of ColumnNameCache.java:22-44."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.operators.names import (
    ColumnNameCache,
    enrich_column_names,
    static_names_getter,
)
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch, decoded_changes
from mariadb_cdc_spark.sources.lake import LakeTable
from tests.test_processor_semantics import _events, tmap, write


def nameless_tmap(pos, table_id, db, tbl, n_cols, file="bin.000001"):
    """TABLE_MAP without names — the pre-10.5 shape."""
    m = tmap(pos, table_id, db, tbl, [], types=[15] * n_cols, file=file)
    m["column_names"] = None
    return m


def test_cache_memoizes_and_invalidates():
    calls = []

    def getter(db, tbl):
        calls.append((db, tbl))
        return ["id", "name"]

    cache = ColumnNameCache(getter)
    assert cache.get("test", "member") == ["id", "name"]
    assert cache.get("test", "member") == ["id", "name"]
    assert len(calls) == 1  # memoized
    cache.invalidate("test", "member")
    cache.get("test", "member")
    assert len(calls) == 2
    # bare table name invalidates across databases (reference :31-42)
    cache.get("other", "member")
    cache.invalidate(None, "member")
    cache.get("test", "member")
    cache.get("other", "member")
    assert len(calls) == 5


def test_side_channel_names_with_stale_count_guard(spark):
    """Event written under the OLD 2-column schema while the catalog already
    answers with 3 names: stale count => stays positional; the 3-column
    event adopts the names (reference test's hasTableColumnNames
    false -> true)."""
    ev = _events(
        spark,
        [
            nameless_tmap(10, 5, "test", "member", 2),
            write(20, 5, [{"a": "1", "b": "name1"}]),  # old 2-col schema
            nameless_tmap(30, 5, "test", "member", 3),
            write(40, 5, [{"a": "2", "b": "name2", "c": "email2"}]),
        ],
    )
    cache = ColumnNameCache(
        static_names_getter({("test", "member"): ["id", "name", "email"]})
    )
    changes = decoded_changes(
        ev, CdcConfig(included_tables=["test.member"])
    )
    out = {
        r["binlog_pos"]: r
        for r in enrich_column_names(changes, cache).collect()
    }
    assert out[20]["has_column_names"] is False  # stale: 3 names, 2 cols
    assert set(out[20]["after"].keys()) == {"col0", "col1"}
    assert out[40]["has_column_names"] is True
    assert out[40]["after"] == {"id": "2", "name": "name2", "email": "email2"}
    assert out[40]["column_names"] == ["id", "name", "email"]


def test_ddl_invalidation_recovers_names_end_to_end(spark, tmp_path):
    """apply_batch: epoch 0 resolves via the pre-DDL catalog answer; the
    ALTER invalidates; epoch 1 re-fetches and adopts the post-DDL names.
    Without invalidation the cached 2-name list would mismatch epoch 1's
    3-column events and the final table would have positional columns."""
    catalog = {("test", "member"): ["id", "name"]}

    def getter(db, tbl):
        return catalog.get((db, tbl))

    ddl = {
        "server_id": 1,
        "binlog_file": "bin.000001",
        "binlog_pos": 25,
        "event_type": "QUERY",
        "sql": "ALTER TABLE member ADD COLUMN email varchar(255)",
    }
    ev = _events(
        spark,
        [
            nameless_tmap(10, 5, "test", "member", 2),
            write(20, 5, [{"a": "1", "b": "name1"}]),
            ddl,
            nameless_tmap(30, 5, "test", "member", 3),
            write(40, 5, [{"a": "1", "b": "name1b", "c": "email1"}]),
        ],
    )
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in ["id", "name"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "member"), schema, ["id"], n_buckets=2
    )
    cfg = CdcConfig(
        database="test", table="member", keys=["id"],
        column_names_getter=getter,
    )

    # the catalog answer changes when the DDL lands (as INFORMATION_SCHEMA
    # would); the epoch-0 fetch must have used the OLD answer
    class MutatingCache(ColumnNameCache):
        def invalidate(self, database, table):
            super().invalidate(database, table)
            catalog[("test", "member")] = ["id", "name", "email"]

    cfg.column_names_getter = MutatingCache(getter)
    apply_batch(ev, table, cfg, stream_id="names", batch_id=0)

    rows = {r["id"]: r.asDict() for r in table.read().collect()}
    assert rows == {
        "1": {"id": "1", "name": "name1b", "email": "email1"}
    }
