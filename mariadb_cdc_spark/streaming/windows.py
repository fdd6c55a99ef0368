"""Event-time windowed change-rate aggregation with late-data tolerance.

The reference has no event-time windowing — its single reader delivers in
log order, so "late data" cannot exist (SURVEY §2.6; heartbeat cadence is
its only time-based signal, binlog/reader/BinLogReaderHeartbeatTest.java:
56-63). A distributed engine reading the same stream from many partitions
DOES see out-of-order event times, so the Spark-native form of the
reference's rate/liveness surface is a watermarked tumbling-window
aggregation: per-window change counts that tolerate arrival disorder up to
a bound, finalize deterministically once the watermark passes, and drop
anything later (the set-wise analog of "the log has moved on").

Pure DataFrame ops: `withWatermark` + `groupBy(window(...))` keep the whole
operator in Tungsten state store land — partial (map-side) aggregation per
micro-batch, state keyed by (window, keys), no Python. At 100 TB the state
size is O(open windows x key cardinality), independent of event volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_change_rates(
    changes: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("database", "table"),
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Tumbling-window change rates per key with bounded-lateness semantics.

    Works on both batch and streaming frames; on a streaming frame the
    watermark makes append-mode output emit each window exactly once, after
    it can no longer change — rows arriving later than `watermark_delay`
    behind the observed max event time are dropped by the state store.

    Default aggregates: n_changes. Pass `aggs` to add domain aggregates
    (each Column must be an aggregate expression, already aliased).
    """
    out = changes
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark_delay)
    agg_cols = [F.count(F.lit(1)).alias("n_changes")]
    if aggs:
        agg_cols.extend(aggs.values())
    win = F.window(ts_col, window_duration)
    return (
        out.groupBy(win.alias("win"), *keys)
        .agg(*agg_cols)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_changes",
            *(aggs.keys() if aggs else ()),
        )
    )
