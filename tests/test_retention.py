"""Snapshot retention GC (LakeTable.expire_snapshots): reference-counted
data-dir deletion + time-travel history trimming."""

import glob
import os

import pytest
from pyspark.sql import types as T

from mariadb_cdc_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("val", T.StringType()),
    ]
)


def _folded(spark, rows):
    return spark.createDataFrame(
        [
            (rid, op, img, "bin.000001", pos, 0, 1)
            for rid, op, img, pos in rows
        ],
        "id string, final_op string, image map<string,string>,"
        " last_file string, last_pos long, last_row_idx int, n_changes long",
    )


def _init(spark, path, n=60):
    t = LakeTable.create(spark, path, SCHEMA, ["id"], n_buckets=4)
    t.merge(
        _folded(
            spark,
            [(f"k{i}", "UPSERT", {"id": f"k{i}", "val": f"v{i}"}, 100 + i)
             for i in range(n)],
        ),
        stream_id="s",
        batch_id=0,
    )
    return t


def test_expire_keeps_mor_chain_bases(spark, tmp_path):
    # delta merges still reference the old base: refcounting must keep it
    t = _init(spark, str(tmp_path / "t"))
    t.merge(_folded(spark, [("k1", "UPSERT", {"val": "x"}, 9_000)]),
            stream_id="s", batch_id=1)
    t.merge(_folded(spark, [("k2", "UPSERT", {"val": "y"}, 9_001)]),
            stream_id="s", batch_id=2)
    before = {r["id"]: r["val"] for r in t.read().collect()}
    res = t.expire_snapshots(keep_last=1)
    assert res["expired"] == [0, 1, 2]
    assert res["removed_dirs"] == []  # base v1 + deltas all still referenced
    after = {r["id"]: r["val"] for r in t.read().collect()}
    assert after == before
    with pytest.raises(ValueError):
        t.read(version=1)


def test_expire_removes_superseded_cow_bases(spark, tmp_path):
    t = _init(spark, str(tmp_path / "t2"))
    # full-table COW rewrite supersedes every v1 bucket
    t.merge(
        _folded(
            spark,
            [(f"k{i}", "UPSERT", {"val": f"w{i}"}, 20_000 + i)
             for i in range(60)],
        ),
        stream_id="s",
        batch_id=1,
    )
    # commit dirs carry a per-attempt uniqueness suffix (data/v1-<token>)
    v1_dirs = glob.glob(str(tmp_path / "t2" / "data" / "v1-*"))
    assert len(v1_dirs) == 1
    res = t.expire_snapshots(keep_last=1)
    assert any(d.startswith("data/v1-") for d in res["removed_dirs"])
    assert not os.path.isdir(v1_dirs[0])
    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows["k5"] == "w5" and len(rows) == 60


def test_expire_retains_time_travel_within_window(spark, tmp_path):
    t = _init(spark, str(tmp_path / "t3"))
    v1 = t.metadata()["version"]
    t.merge(_folded(spark, [("k1", "UPSERT", {"val": "z"}, 9_000)]),
            stream_id="s", batch_id=1)
    t.expire_snapshots(keep_last=2)  # keeps v1 and v2
    assert {r["val"] for r in t.read(version=v1).where("id='k1'").collect()} \
        == {"v1"}
    assert t.changes(v1).count() == 2  # update_before + update_after
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_expire_collects_orphans_from_crashed_commits(spark, tmp_path):
    t = _init(spark, str(tmp_path / "t4"), n=20)
    # simulate a commit that died after writing data, before the metadata
    # swap: its dir is referenced by no version. Backdate it past the
    # orphan grace window — a FRESH never-referenced dir is
    # indistinguishable from a concurrent in-flight commit and must
    # survive (test below).
    orphan = tmp_path / "t4" / "data" / "v99"
    os.makedirs(orphan)
    (orphan / "part-crashed.parquet").write_text("x")
    old = __import__("time").time() - 3600
    os.utime(orphan, (old, old))
    res = t.expire_snapshots(keep_last=10)  # nothing expires, orphan still GC'd
    assert "data/v99" in res["removed_dirs"]
    assert not orphan.exists()
    assert t.read().count() == 20


def test_expire_spares_inflight_concurrent_commit_dirs(spark, tmp_path):
    """A just-written, not-yet-committed data dir (a concurrent merge
    writes parquet BEFORE its CAS swap) must survive expire — deleting it
    would leave the subsequently-winning commit pointing at missing files.
    Dirs referenced only by EXPIRED versions are provably superseded and
    are deleted immediately regardless of age."""
    t = _init(spark, str(tmp_path / "t5"), n=20)
    inflight = tmp_path / "t5" / "data" / "v7-deadbeef"
    os.makedirs(inflight)
    (inflight / "part-inflight.parquet").write_text("x")
    res = t.expire_snapshots(keep_last=10)
    assert "data/v7-deadbeef" in res["skipped_young"]
    assert inflight.exists()
    # superseded-by-rewrite dirs delete immediately even though fresh
    t.merge(
        _folded(
            spark,
            [(f"k{i}", "UPSERT", {"val": f"w{i}"}, 30_000 + i)
             for i in range(20)],
        ),
        stream_id="s",
        batch_id=1,
    )
    res2 = t.expire_snapshots(keep_last=1)
    assert any(d.startswith("data/v1-") for d in res2["removed_dirs"])
    assert inflight.exists()  # still spared


def test_history_lists_retained_versions(spark, tmp_path):
    t = _init(spark, str(tmp_path / "th"), n=20)
    t.merge(_folded(spark, [("k1", "UPSERT", {"val": "x"}, 9_000)]),
            stream_id="s", batch_id=1)
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[0]["n_rows"] == 0 and h[1]["n_rows"] == 20
    assert h[2]["committed"] == {"s": 1}
    assert h[2]["servers"] == []  # no lineage passed in these merges
    assert h[0]["ts"] <= h[1]["ts"] <= h[2]["ts"]
    t.expire_snapshots(keep_last=1)
    assert [e["version"] for e in t.history()] == [2]


def test_apply_batch_inline_retention(spark, tmp_path):
    """CdcConfig(retain_versions=N): maintenance wired into the ingest
    loop — after each committed batch only the newest snapshots survive,
    and the stream keeps applying correctly."""
    from pyspark.sql import types as T

    from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
    from mariadb_cdc_spark.schema import EVENT_SCHEMA

    def _events(rows):
        full = []
        for r in rows:
            d = {f.name: None for f in EVENT_SCHEMA.fields}
            d.update(r)
            full.append(tuple(d[f.name] for f in EVENT_SCHEMA.fields))
        return spark.createDataFrame(full, EVENT_SCHEMA)

    def _base(pos, etype, **kw):
        return {"server_id": 1, "binlog_file": "bin.000001",
                "binlog_pos": pos, "event_type": etype, **kw}

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in ["repo", "path", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "tir"), schema, ["repo", "path"], n_buckets=2
    )
    cfg = CdcConfig(retain_versions=2)
    for b in range(3):
        rows = [
            _base(10 + 100 * b, "TABLE_MAP", table_id=7, database="codehub",
                  table="repo_files", column_types=[15, 15, 15],
                  column_names=["repo", "path", "content"]),
            _base(20 + 100 * b, "WRITE_ROWS", table_id=7,
                  rows_after=[{"repo": "r", "path": f"p{b}",
                               "content": f"c{b}"}]),
        ]
        apply_batch(_events(rows), table, cfg, stream_id="ir", batch_id=b)
        assert len(table.history()) <= 2
    assert table.read().count() == 3
    # replaying the last committed epoch is still an exactly-once no-op
    res = apply_batch(
        _events(rows), table, cfg, stream_id="ir", batch_id=2
    )
    assert res.get("skipped") or res.get("epochs") == 0
    assert table.read().count() == 3


def test_tags_pin_snapshots_through_retention(spark, tmp_path):
    """Iceberg-tag semantics: a tagged version (and the files it
    references) survives expire_snapshots however old it gets; deleting
    the tag releases the pin."""
    import pytest as _pytest

    table = _init(spark, str(tmp_path / "t"))
    for b in range(1, 4):  # versions accumulate (full-rewrite batches)
        table.merge(
            _folded(
                spark,
                [(f"k{i}", "UPSERT", {"val": f"v{i}b{b}"}, 1000 * b + i)
                 for i in range(60)],
            ),
            stream_id="s",
            batch_id=b,
        )

    v_tagged = table.metadata()["version"] - 2
    tagged_state = {
        r["id"]: r["val"] for r in table.read(version=v_tagged).collect()
    }
    table.tag("release-1", version=v_tagged)
    assert table.tags() == {"release-1": v_tagged}
    with _pytest.raises(ValueError):
        table.tag("release-1")  # no silent overwrite
    table.tag("release-1", replace=True)  # re-point to latest is explicit
    table.tag("frozen", version=v_tagged)

    res = table.expire_snapshots(keep_last=1)
    assert v_tagged in res["kept"]
    got = {r["id"]: r["val"] for r in table.read(tag="frozen").collect()}
    assert got == tagged_state

    # releasing the pin lets the next expire collect it
    table.delete_tag("frozen")
    table.tag("release-1", version=table.metadata()["version"], replace=True)
    res2 = table.expire_snapshots(keep_last=1)
    assert v_tagged in res2["expired"]
    with _pytest.raises(ValueError):
        table.read(version=v_tagged)


def test_rollback_restores_state_and_replays_converge(spark, tmp_path):
    """rollback commits a NEW version copying the target snapshot's
    metadata: state restored, history linear, and the rolled-back
    exactly-once marker lets the stream re-apply the undone range."""
    table = _init(spark, str(tmp_path / "t"))
    v_good = table.metadata()["version"]
    good = {r["id"]: r["val"] for r in table.read().collect()}
    table.tag("pre-deploy", version=v_good)

    bad = _folded(
        spark,
        [(f"k{i}", "UPSERT", {"val": "CORRUPT"}, 5000 + i) for i in range(60)],
    )
    table.merge(bad, stream_id="s", batch_id=1)
    assert {r["val"] for r in table.read().collect()} == {"CORRUPT"}

    v_new = table.rollback(tag="pre-deploy")
    assert v_new > v_good  # linear history, no erased versions
    assert {r["id"]: r["val"] for r in table.read().collect()} == good
    assert table.committed_batch("s") == 0  # marker rolled back too

    # the replayed/corrected batch applies again and wins (higher pos)
    fixed = _folded(
        spark,
        [(f"k{i}", "UPSERT", {"val": f"fixed{i}"}, 6000 + i) for i in range(60)],
    )
    table.merge(fixed, stream_id="s", batch_id=1)
    assert {r["val"] for r in table.read().collect()} == {
        f"fixed{i}" for i in range(60)
    }
