"""Merge-on-read delta path (VERDICT r1 #7): small batches append delta
files (bytes ~ batch), readers resolve per-key latest, compaction folds
deltas back into the base."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.sources.lake import LakeTable, _dir_bytes

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


def _folded(spark, rows):
    """rows: (id, final_op, image_dict, pos)"""
    return spark.createDataFrame(
        [
            (rid, op, img, "bin.000001", pos, 0, 1)
            for rid, op, img, pos in rows
        ],
        "id string, final_op string, image map<string,string>,"
        " last_file string, last_pos long, last_row_idx int, n_changes long",
    )


def _init(spark, path, n=500, n_buckets=8):
    table = LakeTable.create(spark, path, SCHEMA, ["id"], n_buckets=n_buckets)
    initial = _folded(
        spark, [(f"k{i}", "UPSERT", {"id": f"k{i}", "val": f"v{i}"}, 100 + i)
                for i in range(n)]
    )
    table.merge(initial, stream_id="init", batch_id=0)
    return table


def test_small_batch_takes_delta_path_and_reads_back(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t"))
    base_bytes = _dir_bytes(str(tmp_path / "t" / "data"))

    upd = _folded(
        spark,
        [("k3", "UPSERT", {"val": "v3b"}, 10_000),
         ("k7", "DELETE", {}, 10_001)],
    )
    res = table.merge(upd, stream_id="init", batch_id=1)
    assert res["mode"] == "delta"

    meta = table.metadata()
    assert any(meta["deltas"].values())
    delta_bytes = sum(meta["delta_bytes"].values())
    # 2-row delta must be a small fraction of the 500-row base
    assert delta_bytes < base_bytes * 0.25

    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k3"] == "v3b"
    assert "k7" not in rows
    assert len(rows) == 499
    assert rows["k42"] == "v42"  # untouched keys intact


def test_stale_delta_update_loses_position_gate(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t2"), n=50)
    stale = _folded(spark, [("k3", "UPSERT", {"val": "OLD"}, 1)])  # pos 1 < 103
    res = table.merge(stale, stream_id="init", batch_id=1)
    assert res["mode"] == "delta"
    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k3"] == "v3"  # stale write filtered at delta-write time


def test_compaction_folds_deltas_into_base(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t3"), n=100, n_buckets=2)
    # drive one bucket past MAX_DELTA_FILES
    for i in range(LakeTable.MAX_DELTA_FILES + 1):
        upd = _folded(
            spark, [("k1", "UPSERT", {"val": f"rev{i}"}, 20_000 + i)]
        )
        table.merge(upd, stream_id="init", batch_id=2 + i)
    meta = table.metadata()
    # the compaction threshold fired at some point: bucket of k1 was COW'd
    # and its delta list reset (possibly re-populated after)
    assert all(
        len(rels) <= LakeTable.MAX_DELTA_FILES
        for rels in meta["deltas"].values()
    )
    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k1"] == f"rev{LakeTable.MAX_DELTA_FILES}"
    assert len(rows) == 100


def test_exactly_once_replay_of_delta_batch(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t4"), n=20)
    upd = _folded(spark, [("k5", "UPSERT", {"val": "new"}, 9_999)])
    table.merge(upd, stream_id="init", batch_id=1)
    v = table.metadata()["version"]
    res = table.merge(upd, stream_id="init", batch_id=1)  # replayed epoch
    assert res["skipped"] is True
    assert table.metadata()["version"] == v


def test_schema_evolution_through_delta(spark, tmp_path):
    """A delta batch introducing a new image column evolves the schema;
    base rows null-fill on read."""
    table = _init(spark, str(tmp_path / "t5"), n=10)
    upd = _folded(
        spark, [("k2", "UPSERT", {"val": "x", "extra": "e"}, 9_000)]
    )
    res = table.merge(upd, stream_id="init", batch_id=1)
    assert res["mode"] == "delta"
    rows = {r["id"]: r.asDict() for r in table.read().collect()}
    assert rows["k2"]["extra"] == "e"
    assert rows["k1"]["extra"] is None


def test_read_keys_matches_filtered_full_scan(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t"))
    # one delta on top so the lookup exercises the merge-on-read path too
    table.merge(
        _folded(spark, [("k3", "UPSERT", {"val": "v3b"}, 10_000),
                        ("k7", "DELETE", {}, 10_001)]),
        stream_id="init", batch_id=1,
    )
    want = [{"id": "k3"}, {"id": "k7"}, {"id": "k42"}, {"id": "missing"}]
    got = sorted(
        tuple(r) for r in table.read_keys(want).collect()
    )
    full = sorted(
        tuple(r)
        for r in table.read()
        .where(F.col("id").isin("k3", "k7", "k42", "missing"))
        .collect()
    )
    assert got == full
    assert ("k3", "v3b") in got            # delta resolved
    assert all(r[0] != "k7" for r in got)  # tombstone filtered


def test_read_keys_prunes_buckets(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t"), n_buckets=8)
    pruned = set(table.read_keys({"id": "k3"}).inputFiles())
    full = set(table.read().inputFiles())
    assert pruned and pruned < full
    # one key -> exactly one bucket's files
    assert len(pruned) <= len(full) / 4


def test_read_keys_validates_input(spark, tmp_path):
    table = _init(spark, str(tmp_path / "t"), n=10)
    import pytest

    with pytest.raises(ValueError, match="at least one key"):
        table.read_keys([])
    with pytest.raises(ValueError, match="missing key columns"):
        table.read_keys({"val": "x"})
    with pytest.raises(ValueError, match="missing key columns"):
        table.read_keys(spark.range(3).select(F.col("id").alias("val")))


def test_read_keys_dataframe_wantlist_distributed(spark, tmp_path):
    """The scale path: a DataFrame want-list semi-joins without ever
    collecting the keys driver-side; results, bucket pruning and MOR/
    tombstone semantics match the list-of-dicts path."""
    table = _init(spark, str(tmp_path / "t"), n_buckets=8)
    table.merge(
        _folded(spark, [("k3", "UPSERT", {"val": "v3b"}, 10_000),
                        ("k7", "DELETE", {}, 10_001)]),
        stream_id="init", batch_id=1,
    )
    want_df = spark.createDataFrame(
        [("k3",), ("k7",), ("k42",), ("missing",), ("k3",)], "id string"
    )
    df = table.read_keys(want_df)
    got = sorted(tuple(r) for r in df.collect())
    via_list = sorted(
        tuple(r)
        for r in table.read_keys(
            [{"id": k} for k in ["k3", "k7", "k42", "missing"]]
        ).collect()
    )
    assert got == via_list
    assert ("k3", "v3b") in got
    assert all(r[0] != "k7" for r in got)
    # still bucket-pruned: the scan reads a strict subset of the table
    assert set(df.inputFiles()) < set(table.read().inputFiles())
    # and the plan is a semi-join, not a collected IN-list filter
    assert "LeftSemi" in df._jdf.queryExecution().executedPlan().toString()


def test_explicit_compact_folds_all_deltas(spark, tmp_path):
    table = _init(spark, str(tmp_path / "tc"), n=100, n_buckets=4)
    table.merge(_folded(spark, [("k1", "UPSERT", {"val": "x"}, 9_000),
                                ("k2", "DELETE", {}, 9_001)]),
                stream_id="init", batch_id=1)
    assert any(table.metadata()["deltas"].values())
    res = table.compact()
    assert res["deltas_folded"] >= 1
    meta = table.metadata()
    assert not any(meta.get("deltas", {}).values())
    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k1"] == "x" and "k2" not in rows and len(rows) == 99
    # the delete's position gate SURVIVES compaction: a stale pre-delete
    # replay must not resurrect k2
    table.merge(_folded(spark, [("k2", "UPSERT", {"id": "k2", "val": "old"},
                                 5)]),
                stream_id="init", batch_id=2)
    assert "k2" not in {r["id"] for r in table.read().collect()}


def test_snapshot_isolation_reader_pinned_across_commit(spark, tmp_path):
    # a reader that planned against v1 still collects v1's state after a
    # later commit rewrote the table (COW never mutates old files)
    table = _init(spark, str(tmp_path / "ts"), n=50)
    pinned = table.read()  # lazy plan against current (v1) files
    table.merge(
        _folded(spark,
                [(f"k{i}", "UPSERT", {"val": "NEW"}, 20_000 + i)
                 for i in range(50)]),
        stream_id="init", batch_id=1)
    assert {r["val"] for r in table.read().collect()} == {"NEW"}
    vals = {r["val"] for r in pinned.collect()}
    assert "NEW" not in vals and len(vals) == 50


def test_compact_retires_tombstones_behind_replay_horizon(spark, tmp_path):
    table = _init(spark, str(tmp_path / "tr"), n=20)
    table.merge(_folded(spark, [("k2", "DELETE", {}, 9_001),
                                ("k3", "DELETE", {}, 12_000)]),
                stream_id="init", batch_id=1)
    table.compact(retire_tombstones_before=("bin.000001", 10_000))
    # live state unchanged
    ids = {r["id"] for r in table.read().collect()}
    assert "k2" not in ids and "k3" not in ids and len(ids) == 18
    # k2's tombstone (pos 9001 < horizon) is physically gone; k3's
    # (pos 12000 >= horizon) survives and still gates stale replays
    from mariadb_cdc_spark.sources.lake import CDC_DELETED
    meta = table.metadata()
    tombs = {
        r["id"]
        for r in table._read_state(
            meta, sorted(int(b) for b in meta["buckets"])
        ).where(CDC_DELETED).collect()
    }
    assert tombs == {"k3"}
    table.merge(_folded(spark, [("k3", "UPSERT", {"id": "k3", "val": "old"},
                                 11_999)]),
                stream_id="init", batch_id=2)
    assert "k3" not in {r["id"] for r in table.read().collect()}


def test_empty_merge_is_metadata_only(spark, tmp_path):
    import os

    table = _init(spark, str(tmp_path / "te"), n=10)
    v1 = table.metadata()["version"]
    empty = _folded(spark, []).limit(0)
    res = table.merge(
        empty, stream_id="init", batch_id=1,
        lineage={"1": {"file": "bin.000009", "pos": 42}},
    )
    assert res["buckets"] == 0 and res["version"] == v1 + 1
    # exactly-once marker + lineage advanced, but NO new data dir
    meta = table.metadata()
    assert meta["committed"]["init"] == 1
    assert meta["lineage"]["1"]["pos"] == 42
    assert not os.path.isdir(
        os.path.join(str(tmp_path / "te"), "data", f"v{v1 + 1}")
    )
    assert table.read().count() == 10


def test_rebucket_evolves_layout_preserving_state(spark, tmp_path):
    """Bucket-count evolution: same logical state in a new hash layout;
    pinned readers keep the old layout; merges and pruned point reads
    work against the new one."""
    table = _init(spark, str(tmp_path / "t"), n=60, n_buckets=4)
    # a delta + a tombstone so the rewrite folds both
    table.merge(
        _folded(spark, [("k3", "UPSERT", {"val": "v3b"}, 10_000),
                        ("k7", "DELETE", {}, 10_001)]),
        stream_id="s", batch_id=1,
    )
    before = {r["id"]: r["val"] for r in table.read().collect()}
    v_before = table.metadata()["version"]

    out = table.rebucket(16)
    assert out["n_buckets"] == 16 and out["previous_n_buckets"] == 4
    assert table.metadata()["n_buckets"] == 16

    after = {r["id"]: r["val"] for r in table.read().collect()}
    assert after == before and "k7" not in after

    # pinned reader: old version still reads the OLD layout correctly
    old = {r["id"]: r["val"] for r in table.read(version=v_before).collect()}
    assert old == before

    # point read prunes against the NEW layout
    got = table.read_keys({"id": "k3"}).collect()
    assert [r["val"] for r in got] == ["v3b"]

    # post-rebucket merge lands and the stale pre-delete replay still loses
    table.merge(
        _folded(spark, [("k9", "UPSERT", {"val": "v9b"}, 20_000),
                        ("k7", "UPSERT", {"val": "zombie"}, 9_000)]),
        stream_id="s", batch_id=2,
    )
    now = {r["id"]: r["val"] for r in table.read().collect()}
    assert now["k9"] == "v9b" and "k7" not in now

    # changelog across the rebucket boundary: no spurious logical changes
    assert table.changes(v_before, v_before + 1).count() == 0

    assert table.rebucket(16)["n_buckets"] == 16  # no-op keeps version


def _bucket_of(spark, table, key):
    from mariadb_cdc_spark.sources.lake import _bucket_col

    meta = table.metadata()
    return (
        spark.createDataFrame([(key,)], "id string")
        .select(_bucket_col(meta["keys"], meta["n_buckets"]).alias("b"))
        .first()["b"]
    )


def test_hybrid_merge_compacts_only_debt_buckets(spark, tmp_path):
    """Partial compaction: when ONE bucket's delta debt crosses the
    threshold, a batch touching it AND clean buckets must COW-rewrite only
    the debt bucket (clearing its deltas) while the clean buckets keep the
    O(batch) delta append — mode == 'hybrid', one commit, correct state."""
    table = _init(spark, str(tmp_path / "th"), n=100, n_buckets=4)
    hot_b = _bucket_of(spark, table, "k1")
    # pick a key in a DIFFERENT bucket to ride along in the hybrid batch
    other = next(
        f"k{i}" for i in range(2, 100)
        if _bucket_of(spark, table, f"k{i}") != hot_b
    )
    other_b = _bucket_of(spark, table, other)

    # load delta debt onto k1's bucket only (small deltas may trip the
    # byte-ratio compaction mid-loop on a tiny base — that's fine, keep
    # loading until debt exists going into the tripping batch)
    for i in range(LakeTable.MAX_DELTA_FILES - 1):
        table.merge(
            _folded(spark, [("k1", "UPSERT", {"val": f"rev{i}"}, 20_000 + i)]),
            stream_id="init", batch_id=2 + i,
        )
    meta = table.metadata()
    assert str(other_b) not in meta.get("deltas", {})

    # the tripping batch touches the debt bucket AND a clean bucket
    res = table.merge(
        _folded(
            spark,
            [("k1", "UPSERT", {"val": "final"}, 30_000),
             (other, "UPSERT", {"val": "ride"}, 30_001)],
        ),
        stream_id="init",
        batch_id=50,
    )
    if res.get("mode") == "hybrid":  # debt may instead trip via byte ratio
        assert res["compacted_buckets"] == 1
        meta = table.metadata()
        # debt bucket: fresh base, deltas cleared by the rewrite
        assert str(hot_b) not in meta.get("deltas", {})
        # clean bucket: exactly one delta appended, base untouched
        assert len(meta["deltas"].get(str(other_b), [])) == 1
    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k1"] == "final" and rows[other] == "ride"
    assert len(rows) == 100


def test_hybrid_merge_trips_on_byte_ratio_and_preserves_state(spark, tmp_path):
    """Force the hybrid path deterministically by loading byte debt over
    COMPACT_BYTES_FRACTION on one bucket, then verify full-state equality
    against per-key expectations, replay idempotence, and that the commit
    is atomic (version advanced exactly once)."""
    table = _init(spark, str(tmp_path / "tb"), n=60, n_buckets=4)
    hot_b = _bucket_of(spark, table, "k1")
    other = next(
        f"k{i}" for i in range(2, 60)
        if _bucket_of(spark, table, f"k{i}") != hot_b
    )
    # one FAT delta on k1's bucket (bytes >> 25% of that bucket's base)
    fat = "x" * 200_000
    res = table.merge(
        _folded(spark, [("k1", "UPSERT", {"val": fat}, 40_000)]),
        stream_id="init", batch_id=90,
    )
    assert res["mode"] == "delta"
    v_before = table.metadata()["version"]
    res = table.merge(
        _folded(
            spark,
            [("k1", "UPSERT", {"val": "slim"}, 41_000),
             (other, "DELETE", {}, 41_001)],
        ),
        stream_id="init",
        batch_id=91,
    )
    assert res["mode"] == "hybrid" and res["compacted_buckets"] == 1
    assert table.metadata()["version"] == v_before + 1  # one atomic commit
    meta = table.metadata()
    assert str(hot_b) not in meta.get("deltas", {})
    rows = {r["id"]: r["val"] for r in table.read().collect()}
    assert rows["k1"] == "slim" and other not in rows
    assert len(rows) == 59
    # replay of the hybrid batch is an exactly-once no-op
    res2 = table.merge(
        _folded(spark, [("k1", "UPSERT", {"val": "STALE"}, 41_000)]),
        stream_id="init", batch_id=91,
    )
    assert res2.get("skipped") is True
    assert {r["id"]: r["val"] for r in table.read().collect()}["k1"] == "slim"
