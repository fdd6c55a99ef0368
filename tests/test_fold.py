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
