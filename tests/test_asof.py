"""General as-of join (operators/asof.py) — semantics pinned by hand cases
plus a brute-force equivalence sweep over the synthetic events table."""

import pytest
from pyspark.sql import functions as F

from mariadb_cdc_spark.operators.asof import asof_join

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, 1),
            ("a", 20, 2),
            ("a", 5, 3),
            ("b", 10, 4),  # key with no right rows at/below 10
            ("c", 7, 5),  # key absent from right entirely
        ],
        "k string, ts long, lid int",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 100, "x"),
            ("a", 10, 101, "y"),  # tie on right_ts: greatest rid wins
            ("a", 15, 102, "z"),
            ("b", 11, 103, "w"),
        ],
        "k string, rts long, rid int, payload string",
    )
    return left, right


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backward_inclusive_with_tiebreak(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_order=["rid"],
    )
    assert _rows(out.select("k", "ts", "lid", "rts", "rid", "payload")) == {
        ("a", 10, 1, 10, 101, "y"),  # inclusive at ts==rts; rid 101 beats 100
        ("a", 20, 2, 15, 102, "z"),
        ("a", 5, 3, None, None, None),
        ("b", 10, 4, None, None, None),
        ("c", 7, 5, None, None, None),
    }


def test_backward_exclusive(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_order=["rid"], inclusive=False,
    )
    got = {(r.k, r.ts, r.rid) for r in out.collect()}
    assert ("a", 10, None) in got  # rts==10 no longer matches ts==10
    assert ("a", 20, 102) in got


def test_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_order=["rid"], direction="forward",
    )
    got = {(r.k, r.ts, r.rid) for r in out.collect()}
    assert got == {
        ("a", 10, 101),  # inclusive: rts==10, greatest rid
        ("a", 20, None),  # nothing at/after 20
        ("a", 5, 101),  # nearest following is rts=10
        ("b", 10, 103),
        ("c", 7, None),
    }


def test_tolerance(frames):
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_order=["rid"],
        tolerance=lambda l, r: (l - r) <= F.lit(3),
    )
    got = {(r.k, r.ts, r.rid) for r in out.collect()}
    assert ("a", 20, None) in got  # 20-15=5 > 3 nulled out
    assert ("a", 10, 101) in got  # 0 <= 3 kept


def test_collision_requires_suffix(frames):
    left, right = frames
    with pytest.raises(ValueError, match="suffix"):
        asof_join(
            left.withColumnRenamed("lid", "payload"),
            right, on=["k"], left_ts="ts", right_ts="rts",
        )


def test_left_row_count_preserved(spark):
    """As-of is left-outer by construction: exactly one output row per
    left row, whatever the right side holds."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    left = ev.where(F.col("event_type") == "click")
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("rid")
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="rts",
        right_order=["rid"],
    )
    assert out.count() == left.count()


def test_equivalence_vs_brute_force(spark):
    """Window formulation == the naive range-join + max_by formulation on
    real data (sf0.001 events, clicks enriched with last purchase)."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    left = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("rid")
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="rts",
        right_order=["rid"],
    )
    brute = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.rts") <= F.col("l.ts")),
            "left",
        )
        .groupBy("l.user_id", "l.event_id", "l.ts")
        .agg(
            F.max(F.struct("r.rts", "r.rid")).alias("m"),
        )
        .select(
            "user_id", "event_id", "ts",
            F.col("m.rts").alias("rts"), F.col("m.rid").alias("rid"),
        )
    )
    assert _rows(out) == _rows(brute)


def test_plan_is_single_shuffle(spark, frames):
    """The operator's plan carries exactly one exchange (the key shuffle
    feeding the window) — no range-join row explosion."""
    left, right = frames
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_order=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
