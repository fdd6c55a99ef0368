"""Unit tests for the ordered LWW fold — the set-wise equivalent of the
reference's sequential apply (semantics spec: BinaryLogEventProcessorTest)."""

import pytest
from pyspark.sql import types as T

from mariadb_cdc_spark.operators.fold import extract_keys, fold_changes

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_pos", T.LongType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _fold(spark, rows, two_phase):
    df = extract_keys(_mk(spark, rows), ["repo", "path"])
    out = fold_changes(df, ["repo", "path"], two_phase=two_phase)
    return {
        (r["repo"], r["path"]): (r["final_op"], dict(r["image"] or {}))
        for r in out.collect()
    }


K = {"repo": "r1", "path": "a.txt"}


def ev(op, pos, after=None, before=None, file="bin.000001", idx=0):
    return (op, file, pos, idx, before, after)


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_insert_then_update_patch(spark, two_phase):
    rows = [
        ev("INSERT", 100, after={**K, "content": "v1", "lang": "py"}),
        ev("UPDATE", 200, before=K, after={"content": "v2"}),  # minimal image
    ]
    res = _fold(spark, rows, two_phase)
    op, img = res[("r1", "a.txt")]
    assert op == "UPSERT"
    assert img["content"] == "v2" and img["lang"] == "py"


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_delete_wins_when_last(spark, two_phase):
    rows = [
        ev("INSERT", 100, after={**K, "content": "v1"}),
        ev("UPDATE", 200, before=K, after={"content": "v2"}),
        ev("DELETE", 300, before=K),
    ]
    res = _fold(spark, rows, two_phase)
    assert res[("r1", "a.txt")][0] == "DELETE"


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_delete_then_reinsert(spark, two_phase):
    rows = [
        ev("INSERT", 100, after={**K, "content": "v1"}),
        ev("DELETE", 200, before=K),
        ev("INSERT", 300, after={**K, "content": "v3"}),
    ]
    res = _fold(spark, rows, two_phase)
    op, img = res[("r1", "a.txt")]
    assert op == "UPSERT" and img["content"] == "v3"


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_update_after_delete_recreates(spark, two_phase):
    rows = [
        ev("INSERT", 100, after={**K, "content": "v1", "lang": "py"}),
        ev("DELETE", 200, before=K),
        ev("UPDATE", 300, before=K, after={"content": "v3"}),
    ]
    res = _fold(spark, rows, two_phase)
    op, img = res[("r1", "a.txt")]
    assert op == "UPSERT"
    assert img.get("content") == "v3"
    assert "lang" not in img  # pre-delete state must not leak through


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_order_across_files_and_rows(spark, two_phase):
    # later file wins over earlier file regardless of pos magnitude
    rows = [
        ev("INSERT", 900, after={**K, "content": "old"}, file="bin.000001"),
        ev("UPDATE", 5, before=K, after={"content": "new"}, file="bin.000002"),
    ]
    res = _fold(spark, rows, two_phase)
    assert res[("r1", "a.txt")][1]["content"] == "new"


@pytest.mark.parametrize("two_phase", [False, True, "auto"])
def test_row_idx_breaks_ties(spark, two_phase):
    # two rows in one multi-row event touching the same key: higher idx wins
    rows = [
        ev("INSERT", 100, after={**K, "content": "a"}, idx=0),
        ev("UPDATE", 100, before=K, after={"content": "b"}, idx=1),
    ]
    res = _fold(spark, rows, two_phase)
    assert res[("r1", "a.txt")][1]["content"] == "b"


def test_two_phase_equals_single_phase_many_keys(spark):
    rows = []
    for i in range(50):
        k = {"repo": f"r{i % 7}", "path": f"p{i}.txt"}
        rows.append(ev("INSERT", 100 + i, after={**k, "content": f"v{i}"}))
        if i % 3 == 0:
            rows.append(ev("UPDATE", 1000 + i, before=k, after={"content": f"u{i}"}))
        if i % 11 == 0:
            rows.append(ev("DELETE", 5000 + i, before=k))
    a = _fold(spark, rows, two_phase=False)
    b = _fold(spark, rows, two_phase=True)
    assert a == b


def test_patch_only_key_upserts(spark):
    # UPDATE for a key with no INSERT in the batch: patch applied at merge time
    rows = [ev("UPDATE", 100, before=K, after={"content": "patched"})]
    res = _fold(spark, rows, two_phase=True)
    op, img = res[("r1", "a.txt")]
    assert op == "UPSERT" and img == {"content": "patched"}


def test_multi_master_lww_fold(spark):
    """Active-active policy: wall-clock LWW with server_id tiebreak —
    per-server positions are incomparable across masters, so an EARLIER-ts
    write must lose even if its own server position is higher."""
    import datetime as dt

    from mariadb_cdc_spark.operators.fold import fold_multi_master

    t = lambda sec: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # key k1: server 2 writes LAST by wall clock despite lower pos
        ("k1", 1, "bin.000009", 900, 0, t(10), "INSERT", None, {"v": "s1@10"}),
        ("k1", 2, "bin.000001", 5, 0, t(20), "INSERT", None, {"v": "s2@20"}),
        # key k2: same-ts tie -> higher server_id wins deterministically
        ("k2", 1, "bin.000001", 50, 0, t(30), "INSERT", None, {"v": "s1@30"}),
        ("k2", 2, "bin.000001", 60, 0, t(30), "INSERT", None, {"v": "s2@30"}),
        # key k3: later DELETE beats earlier INSERT across servers
        ("k3", 2, "bin.000001", 70, 0, t(40), "INSERT", None, {"v": "x"}),
        ("k3", 1, "bin.000002", 10, 0, t(50), "DELETE", {"v": "x"}, None),
        # key k4: within one server, ts ties fall back to position order
        ("k4", 1, "bin.000001", 80, 0, t(60), "INSERT", None, {"v": "old"}),
        ("k4", 1, "bin.000001", 90, 0, t(60), "UPDATE", None, {"v": "new"}),
    ]
    df = spark.createDataFrame(
        rows,
        "k string, server_id long, binlog_file string, binlog_pos long,"
        " row_idx int, ts timestamp, op string,"
        " before map<string,string>, after map<string,string>",
    )
    out = {r["k"]: r for r in fold_multi_master(df, ["k"]).collect()}
    assert out["k1"]["image"]["v"] == "s2@20"
    assert out["k1"]["last_pos"] == 5  # the true winner's position
    assert out["k2"]["image"]["v"] == "s2@30"
    assert out["k3"]["final_op"] == "DELETE"
    assert out["k4"]["image"]["v"] == "new"
    assert out["k4"]["n_changes"] == 2
