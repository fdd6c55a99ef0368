"""LakeTable.changes(): Iceberg-changelog-style incremental snapshot diff
(net changes between two versions, touched-buckets-only scan)."""

import pytest
from pyspark.sql import functions as F
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


def _table(spark, path, n=60, n_buckets=4):
    t = LakeTable.create(spark, path, SCHEMA, ["id"], n_buckets=n_buckets)
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


def _brute_diff(t, v0, v1):
    """Independent expected changelog from two full snapshot reads."""
    old = {r["id"]: r["val"] for r in t.read(version=v0).collect()}
    new = {r["id"]: r["val"] for r in t.read(version=v1).collect()}
    exp = set()
    for k in new.keys() - old.keys():
        exp.add(("insert", k, new[k]))
    for k in old.keys() - new.keys():
        exp.add(("delete", k, old[k]))
    for k in old.keys() & new.keys():
        if old[k] != new[k]:
            exp.add(("update_before", k, old[k]))
            exp.add(("update_after", k, new[k]))
    return exp


def test_changes_matches_brute_force_snapshot_diff(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    v1 = t.metadata()["version"]
    t.merge(
        _folded(
            spark,
            [
                ("k3", "UPSERT", {"val": "v3b"}, 10_000),
                ("k7", "DELETE", {}, 10_001),
                ("k999", "UPSERT", {"id": "k999", "val": "fresh"}, 10_002),
            ],
        ),
        stream_id="s",
        batch_id=1,
    )
    v2 = t.metadata()["version"]
    got = {
        (r["change_type"], r["id"], r["val"])
        for r in t.changes(v1, v2).collect()
    }
    assert got == _brute_diff(t, v1, v2)
    assert got == {
        ("update_before", "k3", "v3"),
        ("update_after", "k3", "v3b"),
        ("delete", "k7", "v7"),
        ("insert", "k999", "fresh"),
    }


def test_changes_from_empty_version_is_all_inserts(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t0"), n=10)
    v1 = t.metadata()["version"]
    got = t.changes(0, v1)
    assert got.where(F.col("change_type") != "insert").count() == 0
    assert got.count() == 10


def test_changes_defaults_to_latest_and_rejects_backwards(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t1"), n=10)
    v1 = t.metadata()["version"]
    t.merge(
        _folded(spark, [("k1", "UPSERT", {"val": "x"}, 9_999)]),
        stream_id="s",
        batch_id=1,
    )
    assert {
        (r["change_type"], r["id"])
        for r in t.changes(v1).collect()
    } == {("update_before", "k1"), ("update_after", "k1")}
    with pytest.raises(ValueError):
        t.changes(t.metadata()["version"], v1)


def test_changes_net_semantics_absorb_within_window(spark, tmp_path):
    # a key inserted AND deleted between the endpoints never appears;
    # a delete+reinsert shows as a net update
    t = _table(spark, str(tmp_path / "t2"), n=10)
    v1 = t.metadata()["version"]
    t.merge(
        _folded(
            spark,
            [("knew", "UPSERT", {"id": "knew", "val": "a"}, 10_000),
             ("k2", "DELETE", {}, 10_001)],
        ),
        stream_id="s",
        batch_id=1,
    )
    t.merge(
        _folded(
            spark,
            [("knew", "DELETE", {}, 20_000),
             ("k2", "UPSERT", {"id": "k2", "val": "back"}, 20_001)],
        ),
        stream_id="s",
        batch_id=2,
    )
    got = {
        (r["change_type"], r["id"], r["val"])
        for r in t.changes(v1).collect()
    }
    assert got == {
        ("update_before", "k2", "v2"),
        ("update_after", "k2", "back"),
    }


def test_changes_reads_only_touched_buckets(spark, tmp_path):
    # one-key update at 8 buckets: the diff plan must not scan the other
    # buckets' files on either side
    t = _table(spark, str(tmp_path / "t3"), n=80, n_buckets=8)
    v1 = t.metadata()["version"]
    t.merge(
        _folded(spark, [("k5", "UPSERT", {"val": "v5b"}, 10_000)]),
        stream_id="s",
        batch_id=1,
    )
    ch = t.changes(v1)
    files = set(ch.inputFiles())
    m1 = t.metadata()
    deltas = m1.get("deltas", {})
    touched = {b for b in deltas if deltas[b]}
    assert touched  # the update took the delta path
    untouched = [b for b in m1["buckets"] if b not in touched]
    assert untouched
    for f in files:
        for b in untouched:
            assert f"_bucket={b}/" not in f and not f.endswith(f"_bucket={b}")
    got = {(r["change_type"], r["id"]) for r in ch.collect()}
    assert got == {("update_before", "k5"), ("update_after", "k5")}


def test_changes_sees_schema_evolution_as_null_before(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t4"), n=10)
    v1 = t.metadata()["version"]
    # image introduces a brand-new column -> metadata-only add
    t.merge(
        _folded(spark, [("k1", "UPSERT", {"val": "x", "extra": "E"}, 9_999)]),
        stream_id="s",
        batch_id=1,
    )
    rows = {
        (r["change_type"]): r for r in t.changes(v1).collect()
    }
    assert rows["update_before"]["extra"] is None
    assert rows["update_after"]["extra"] == "E"


def test_changes_matches_brute_diff_on_random_sequences(spark, tmp_path):
    """Property: for EVERY version pair (i <= j) of a randomized merge
    history (upserts, patches, deletes, delete-on-absent no-ops), the
    incremental changelog equals the brute-force snapshot diff.
    Deterministic seed, same style as test_fold_property."""
    import random

    rng = random.Random(7)
    t = LakeTable.create(
        spark, str(tmp_path / "tp"), SCHEMA, ["id"], n_buckets=4
    )
    keys = [f"k{i}" for i in range(40)]
    versions = [t.metadata()["version"]]
    pos = 100
    for b in range(3):
        rows = []
        for key in rng.sample(keys, rng.randint(5, 25)):
            op = rng.choice(["UPSERT", "UPSERT", "DELETE"])
            pos += 1
            img = (
                {}
                if op == "DELETE"
                else {"id": key, "val": f"v{b}-{rng.randint(0, 5)}"}
            )
            rows.append((key, op, img, pos))
        t.merge(_folded(spark, rows), stream_id="s", batch_id=b)
        versions.append(t.metadata()["version"])
    for i in range(len(versions)):
        for j in range(i, len(versions)):
            got = {
                (r["change_type"], r["id"], r["val"])
                for r in t.changes(versions[i], versions[j]).collect()
            }
            assert got == _brute_diff(t, versions[i], versions[j]), (
                versions[i],
                versions[j],
            )
