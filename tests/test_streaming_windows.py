"""Watermarked tumbling-window change rates (streaming/windows.py).

Late-data contract: an out-of-order event within the watermark still lands
in its window before the window finalizes; an event arriving later than the
watermark bound is dropped. Append-mode output emits each window exactly
once. Micro-batch order is forced with maxFilesPerTrigger=1 over file
chunks written in sequence.
"""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.streaming.windows import windowed_change_rates

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("op", T.StringType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    # spec: (minute_offset_float, op)
    return [
        (T0 + datetime.timedelta(minutes=m), "db", "t", op) for m, op in specs
    ]


def test_batch_and_streaming_agree_and_late_rows_obey_watermark(
    spark, tmp_path
):
    # chunk 0: minutes 0..2 (windows 0 and 1; max event time 2.5)
    # chunk 1: minute 5 advances the watermark to 3 -> windows 0,1 finalize;
    #          plus a LATE row at minute 2.2 (within watermark at arrival:
    #          watermark after chunk 0 is 2.5-2=0.5 < 2.2) -> must count
    # chunk 2: minute 9 advances watermark to 7; plus a TOO-LATE row at
    #          minute 1.5 (watermark is 5-2=3 > 1.5) -> must be dropped
    chunks = [
        _rows((0.2, "INSERT"), (1.3, "UPDATE"), (2.5, "INSERT")),
        _rows((5.0, "INSERT"), (2.2, "DELETE")),
        _rows((9.0, "INSERT"), (1.5, "INSERT")),
    ]
    src = tmp_path / "src"
    src.mkdir()

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = windowed_change_rates(
        stream,
        window_duration="1 minute",
        watermark_delay="2 minutes",
        aggs={"n_inserts": F.sum((F.col("op") == "INSERT").cast("long")).alias("n_inserts")},
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_rates")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        # feed chunks strictly one micro-batch at a time: each chunk is
        # written only after the previous one is fully processed, so the
        # watermark progression is deterministic
        for rows in chunks:
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
                str(src), mode="append"
            )
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start"].minute: (r["n_changes"], r["n_inserts"])
        for r in spark.sql("select * from win_rates").collect()
    }
    # window 2 holds the on-time minute-2.5 row AND the late-but-in-watermark
    # minute-2.2 row; the too-late minute-1.5 row is NOT in window 1.
    assert got[0] == (1, 1)
    assert got[1] == (1, 0)
    assert got[2] == (2, 1)
    # append mode: only watermark-finalized windows are emitted (minute 9's
    # window is still open at stream end; minute 5's closed when wm hit 7)
    assert 9 not in got
    assert got[5] == (1, 1)

    # batch semantics: same operator, no watermark -> every row counts
    batch = windowed_change_rates(
        spark.createDataFrame(sum(chunks, []), SCHEMA),
        window_duration="1 minute",
        watermark_delay="2 minutes",
    )
    n = {r["window_start"].minute: r["n_changes"] for r in batch.collect()}
    assert n == {0: 1, 1: 2, 2: 2, 5: 1, 9: 1}
