"""Hierarchical drift audit (operators.audit): digest invariance, the
no-drift fast path (no join), drift-class exactness, and null handling."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.audit import (
    drift_report,
    drift_slices,
    slice_digests,
)

KEYS = ["k1", "k2"]
VALS = ["v1", "v2"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k1 string, k2 string, v1 string, v2 string"
    )


def _base(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("a"), (F.col("id") % 7)).alias("k1"),
        F.col("id").cast("string").alias("k2"),
        F.concat(F.lit("v"), F.col("id")).alias("v1"),
        F.when(F.col("id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("w"), F.col("id")))
        .alias("v2"),
    )


def test_digest_is_order_and_partition_invariant(spark):
    a = _base(spark)
    b = _base(spark).repartition(13).sortWithinPartitions("v1")
    da = {r["slice_id"]: r for r in slice_digests(a, KEYS, VALS, 32).collect()}
    db = {r["slice_id"]: r for r in slice_digests(b, KEYS, VALS, 32).collect()}
    assert set(da) == set(db)
    for s in da:
        assert (da[s]["n_rows"], da[s]["x1"], da[s]["x2"]) == (
            db[s]["n_rows"], db[s]["x1"], db[s]["x2"]
        )
    # digests cover MANY slices (hash spread), each bounded output
    assert len(da) == 32


def test_no_drift_means_no_slices_and_empty_report(spark):
    a, b = _base(spark), _base(spark)
    assert drift_slices(a, b, KEYS, VALS, 32) == []
    rep = drift_report(a, b, KEYS, VALS, 32)
    assert rep.columns == ["k1", "k2", "drift_class"]
    assert rep.count() == 0


def test_drift_classes_exact(spark):
    lake = _base(spark, 300)
    doc = F.col("k2").cast("long")
    phantom = _df(spark, [("px", "1", "a", "b"), ("px", "2", "a", None)])
    source = (
        lake.where(doc % 53 != 0)  # lake-only -> extra
        .withColumn(
            "v1",
            F.when(doc % 41 == 0, F.concat(F.col("v1"), F.lit("!"))).otherwise(
                F.col("v1")
            ),
        )
        .unionByName(phantom)  # source-only -> missing
    )
    got = {
        (r["k1"], r["k2"]): r["drift_class"]
        for r in drift_report(source, lake, KEYS, VALS, 16).collect()
    }
    want = {}
    for i in range(300):
        if i % 53 == 0:
            want[(f"a{i % 7}", str(i))] = "extra"
        elif i % 41 == 0:
            want[(f"a{i % 7}", str(i))] = "modified"
    want[("px", "1")] = "missing"
    want[("px", "2")] = "missing"
    assert got == want


def test_null_vs_value_and_null_position_drift_detected(spark):
    a = _df(spark, [("k", "1", None, "x"), ("k", "2", "", "y")])
    b = _df(spark, [("k", "1", "x", None), ("k", "2", None, "y")])
    got = {
        (r["k1"], r["k2"]): r["drift_class"]
        for r in drift_report(a, b, KEYS, VALS, 8).collect()
    }
    # (None,'x') vs ('x',None) and '' vs None both register as modified
    assert got == {("k", "1"): "modified", ("k", "2"): "modified"}
