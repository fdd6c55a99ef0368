"""Skew: one zipfian-hot key with thousands of changes (FIXTURES.md §4.12).
The two-phase fold must (a) stay correct and (b) actually split the hot key
across position-contiguous segments before the per-key combine — the
"salting before the merge-apply shuffle" of the north rule."""

from pyspark.sql import functions as F
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


def _hot_key_changes(spark, n=5000, n_files=10):
    """INSERT then n-1 partial UPDATEs, spread over n_files binlog files."""
    per_file = n // n_files
    df = spark.range(n).select(
        F.when(F.col("id") == 0, F.lit("INSERT")).otherwise(F.lit("UPDATE")).alias("op"),
        F.concat(
            F.lit("bin."),
            F.lpad((F.col("id") / per_file + 1).cast("int").cast("string"), 6, "0"),
        ).alias("binlog_file"),
        (F.pmod(F.col("id"), F.lit(per_file)) * 4 + 4).cast("long").alias("binlog_pos"),
        F.lit(0).alias("row_idx"),
        F.create_map(F.lit("repo"), F.lit("hot"), F.lit("path"), F.lit("p")).alias(
            "before"
        ),
        F.when(
            F.col("id") == 0,
            F.create_map(
                F.lit("repo"), F.lit("hot"), F.lit("path"), F.lit("p"),
                F.lit("content"), F.lit("v0"), F.lit("lang"), F.lit("py"),
            ),
        )
        .otherwise(
            F.create_map(
                F.lit("content"), F.concat(F.lit("v"), F.col("id").cast("string"))
            )
        )
        .alias("after"),
    )
    return spark.createDataFrame(df.collect(), CHANGE_SCHEMA)


def test_hot_key_folds_correctly_and_in_parallel(spark):
    n, n_files = 5000, 10
    changes = extract_keys(_hot_key_changes(spark, n, n_files), ["repo", "path"])

    out = fold_changes(changes, ["repo", "path"], two_phase=True).collect()
    assert len(out) == 1
    r = out[0]
    assert r["final_op"] == "UPSERT"
    # last writer = highest (file, pos): id = n-1
    assert r["image"]["content"] == f"v{n - 1}"
    assert r["image"]["lang"] == "py"  # patched fold keeps INSERT columns
    assert r["n_changes"] == n

    # the partial fold really is segmented: count distinct segments exercised
    seg = changes.select(
        F.countDistinct(
            F.struct("binlog_file", F.shiftright("binlog_pos", 20))
        ).alias("n_seg")
    ).collect()[0]["n_seg"]
    assert seg == n_files  # hot key folds in n_files parallel partials


def test_hot_key_two_phase_equals_single_phase(spark):
    changes = extract_keys(_hot_key_changes(spark, 1000, 5), ["repo", "path"])
    a = fold_changes(changes, ["repo", "path"], two_phase=False).collect()[0]
    b = fold_changes(changes, ["repo", "path"], two_phase=True).collect()[0]
    assert a["final_op"] == b["final_op"]
    assert dict(a["image"]) == dict(b["image"])


def test_auto_hot_split_equals_two_phase(spark):
    """two_phase='auto' + explicit hot set: hot key routes through the
    segmented fold, cold keys through single-phase; results identical."""
    hot = _hot_key_changes(spark, 1000, 5)
    cold = spark.createDataFrame(
        [
            ("INSERT", "bin.000001", 2, 0, None,
             {"repo": "cold", "path": "q", "content": "c0"}),
            ("UPDATE", "bin.000002", 2, 0, {"repo": "cold", "path": "q"},
             {"content": "c1"}),
        ],
        hot.schema,
    )
    changes = extract_keys(hot.unionByName(cold), ["repo", "path"])
    auto = fold_changes(
        changes, ["repo", "path"], two_phase="auto", hot_keys=[("hot", "p")]
    )
    ref = fold_changes(changes, ["repo", "path"], two_phase=True)
    a = {(r["repo"], r["path"]): r for r in auto.collect()}
    b = {(r["repo"], r["path"]): r for r in ref.collect()}
    assert set(a) == set(b) == {("hot", "p"), ("cold", "q")}
    for k in a:
        assert a[k]["final_op"] == b[k]["final_op"]
        assert dict(a[k]["image"]) == dict(b[k]["image"])
        assert a[k]["last_pos"] == b[k]["last_pos"]


def test_merge_learns_hot_keys_and_feeds_next_fold(spark, tmp_path):
    """LakeTable.merge records keys over HOT_KEY_CHANGES; apply_batch picks
    them up for the next batch's fold."""
    from pyspark.sql import types as T

    from mariadb_cdc_spark.sources.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["repo", "path"], n_buckets=4
    )
    old_th, LakeTable.HOT_KEY_CHANGES = LakeTable.HOT_KEY_CHANGES, 100
    try:
        changes = extract_keys(_hot_key_changes(spark, 500, 5), ["repo", "path"])
        folded = fold_changes(changes, ["repo", "path"], two_phase=False)
        table.merge(folded)
        assert table.metadata()["hot_keys"] == [["hot", "p"]]
    finally:
        LakeTable.HOT_KEY_CHANGES = old_th
    assert table.read().collect()[0]["content"] == "v499"
