"""ANNOTATE_ROWS statement attachment (operators/annotate.py)."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.gen import generate_events, repo_table
from mariadb_cdc_spark.operators.annotate import attach_statements
from mariadb_cdc_spark.schema import (
    EVENT_SCHEMA,
    EVT_ANNOTATE,
    EVT_WRITE_ROWS,
    EVT_XID,
    ROWS_EVENT_TYPES,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _mini_events(spark, rows):
    """(server, file, pos, type, sql) -> full envelope."""
    base = spark.createDataFrame(
        rows,
        "server_id long, binlog_file string, binlog_pos long, "
        "event_type string, sql string",
    )
    for f in EVENT_SCHEMA.fields:
        if f.name not in base.columns:
            base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
    return base.select(*[f.name for f in EVENT_SCHEMA.fields])


def test_attach_hand_case_with_chunk_carry(spark):
    """Statements attach to following rows events until the next annotate,
    across file and chunk boundaries; events before the first annotate get
    null; the annotate row is its own statement. chunk_bytes=100 forces
    positions 10/50 and 150/250 and 1000 into different chunks, so both the
    within-chunk window and the cross-chunk carry paths are exercised."""
    ev = _mini_events(
        spark,
        [
            (1, "f1", 10, EVT_WRITE_ROWS, None),  # before any annotate
            (1, "f1", 50, EVT_ANNOTATE, "stmt A"),
            (1, "f1", 150, EVT_WRITE_ROWS, None),  # next chunk: carry A
            (1, "f1", 250, EVT_ANNOTATE, "stmt B"),
            (1, "f1", 260, EVT_XID, None),  # non-rows events attach too
            (1, "f1", 1000, EVT_WRITE_ROWS, None),  # far chunk: carry B
            (1, "f2", 20, EVT_WRITE_ROWS, None),  # next FILE: still carry B
            (2, "f1", 500, EVT_WRITE_ROWS, None),  # other server: isolated
        ],
    )
    out = attach_statements(ev, chunk_bytes=100)
    got = {
        (r.server_id, r.binlog_file, r.binlog_pos): r.statement
        for r in out.collect()
    }
    assert got == {
        (1, "f1", 10): None,
        (1, "f1", 50): "stmt A",
        (1, "f1", 150): "stmt A",
        (1, "f1", 250): "stmt B",
        (1, "f1", 260): "stmt B",
        (1, "f1", 1000): "stmt B",
        (1, "f2", 20): "stmt B",
        (2, "f1", 500): None,
    }


def test_attach_chunk_size_invariance(spark):
    """The attach result is identical at any chunk granularity (the chunk
    split is an execution detail, not a semantic one)."""
    events = generate_events(
        repo_table(spark, SF_SMOKE), include_audit=False,
        include_annotate=True,
    )
    outs = []
    for cb in (1 << 8, 1 << 20):
        att = attach_statements(events, chunk_bytes=cb)
        outs.append(
            sorted(
                (r.binlog_file, r.binlog_pos, r.statement)
                for r in att.where(
                    F.col("event_type").isin(*ROWS_EVENT_TYPES)
                ).select("binlog_file", "binlog_pos", "statement").collect()
            )
        )
    assert outs[0] == outs[1]


def test_generated_rows_events_all_annotated(spark):
    """With include_annotate every main-table rows event attaches to a
    statement whose op matches the event's own type."""
    events = generate_events(
        repo_table(spark, SF_SMOKE), include_audit=False,
        include_annotate=True,
    )
    att = attach_statements(events).where(
        F.col("event_type").isin(*ROWS_EVENT_TYPES)
    )
    assert att.where(F.col("statement").isNull()).count() == 0
    mismatched = att.where(
        ~F.col("statement").startswith(
            F.when(F.col("event_type") == EVT_WRITE_ROWS, "INSERT").otherwise(
                F.split(F.col("event_type"), "_")[0]
            )
        )
    )
    assert mismatched.count() == 0
