"""Custom stateful streaming operator: applyInPandasWithState sessionization.

Proves the state survives micro-batch boundaries: a session whose events
span two micro-batches is emitted ONCE with the combined count."""

import time

from pyspark.sql import functions as F

from mariadb_cdc_spark.streaming.sessions import sessionize_stream

SCHEMA = "user_id long, ts timestamp"


def test_sessions_carry_state_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")

    def ts(sec):
        import datetime

        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)

    chunk1 = [(1, ts(0)), (1, ts(10)), (1, ts(2000)), (2, ts(5))]
    chunk2 = [(1, ts(2010)), (1, ts(4000)), (2, ts(1500))]
    spark.createDataFrame(chunk1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)  # file source orders batches by modification time
    spark.createDataFrame(chunk2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=1000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from closed_sessions").collect()
    }
    base = int(
        spark.createDataFrame([(1, ts(0))], SCHEMA)
        .select(F.col("ts").cast("long"))
        .collect()[0][0]
    )
    # session (2000..2010) spans the two micro-batches -> one row, n=2
    assert got == {
        (1, base + 0, base + 10, 2),
        (1, base + 2000, base + 2010, 2),
        (2, base + 5, base + 5, 1),
    }


def test_late_event_dropped_not_corrupting(spark, tmp_path):
    """ADVICE r1: an out-of-order event arriving in a LATER micro-batch,
    behind the open session's tail, must be dropped — not regress `last`
    (which would let an already-proven gap un-prove)."""
    import datetime
    import time

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")

    def ts(sec):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)

    chunk1 = [(1, ts(1000)), (1, ts(2000))]
    # 1500 is LATE (behind state.last=2000); 10000 proves the gap
    chunk2 = [(1, ts(1500)), (1, ts(10000))]
    spark.createDataFrame(chunk1, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(chunk2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=3600)
    q = (
        sessions.writeStream.format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    base = int(ts(0).timestamp())
    rows = [
        (r["session_start"] - base, r["session_end"] - base, r["n_events"])
        for r in spark.sql("select * from late_sessions").collect()
    ]
    # one closed session [1000, 2000] with 2 events: the 1500 straggler was
    # dropped; 10000 opened the (still-unclosed) tail session
    assert rows == [(1000, 2000, 2)]
