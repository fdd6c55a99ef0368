"""Z-order clustering (sources/zorder.py + compact(zorder_by=...)): files
cut from the Morton-sorted order stay range-compact in EVERY participating
column, so stats pruning (read_where) skips files for predicates on ANY of
them — where a single-column sort only serves its own column."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.sources import zorder
from mariadb_cdc_spark.sources.lake import LakeTable
from mariadb_cdc_spark.sources.stats import residual_filter

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)

N = 4096


def _folded(spark):
    # x and y are deterministic but INDEPENDENT (Knuth-hash scramble):
    # sorting by one leaves the other uniform across every file
    rows = [
        (
            f"k{i:05d}",
            "UPSERT",
            {
                "id": f"k{i:05d}",
                "x": str(i),
                "y": str((i * 2654435761) % N),
            },
            100 + i,
        )
        for i in range(N)
    ]
    return spark.createDataFrame(
        [(r, op, img, "bin.000001", pos, 0, 1) for r, op, img, pos in rows],
        "id string, final_op string, image map<string,string>,"
        " last_file string, last_pos long, last_row_idx int, n_changes long",
    )


def _table(spark, path, **compact_kw):
    t = LakeTable.create(spark, path, SCHEMA, ["id"], n_buckets=2)
    t.merge(_folded(spark), stream_id="s", batch_id=0)
    t.compact(files_per_bucket=8, **compact_kw)
    return t


def _scan_frac(t, filters):
    plan = t.pruning_plan(filters)
    assert plan["files_live"] >= 14
    return plan["files_scanned"] / plan["files_live"]


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    zt = _table(spark, str(tmp_path / "z"), zorder_by=["x", "y"])
    st = _table(spark, str(tmp_path / "s"), sort_by=["x"])

    fx = [("x", "between", (1000, 1255))]   # 1/16th of the x range
    fy = [("y", "between", (1000, 1255))]

    # plain sort: perfect on its own column, useless on the other
    assert _scan_frac(st, fx) <= 0.25
    assert _scan_frac(st, fy) == 1.0
    # z-order: substantially prunes BOTH dimensions
    assert _scan_frac(zt, fx) <= 0.6
    assert _scan_frac(zt, fy) <= 0.6

    # correctness: identical to the exact filter, both layouts
    for t in (zt, st):
        for filters in (fx, fy, fx + fy):
            got = sorted(map(tuple, t.read_where(filters).collect()))
            want = sorted(
                map(tuple, residual_filter(t.read(), filters).collect())
            )
            assert got == want


def test_zorder_key_interleaves_bits():
    bounds = {"a": list(range(1, 256)), "b": list(range(1, 256))}
    key = zorder.zorder_key(bounds)
    # rank(a)=3 (0b11), rank(b)=1 (0b01) -> key bits: a at even*2, b at odd
    # positions: (1<<0) + (1<<1) + (1<<2)*0 + (1<<3)*... compute via Spark
    from mariadb_cdc_spark.session import get_spark

    spark = get_spark(master="local[1]", shuffle_partitions=1)
    row = (
        spark.createDataFrame([(3, 1)], "a int, b int")
        .select(key.alias("k"))
        .first()
    )
    # a=3 -> bits 0,1 at positions 0*2+0=0 and 1*2+0=2 ; b=1 -> bit 0 at
    # position 0*2+1=1  => key = 1 + 2 + 4 = 7
    assert row["k"] == 0b111


def test_boundaries_monotone_and_bounded(spark):
    df = spark.range(5000).select(
        F.col("id").alias("n"),
        F.concat(F.lit("v"), F.lpad(F.col("id").cast("string"), 6, "0"))
        .alias("s"),
    )
    b = zorder.compute_boundaries(df, ["n", "s"], row_estimate=5000)
    for c in ("n", "s"):
        assert 1 <= len(b[c]) <= 255
        assert b[c] == sorted(b[c])


def test_zorder_rejects_bad_args(spark):
    try:
        zorder.zorder_key({})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        zorder.zorder_key({f"c{i}": [] for i in range(9)})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
