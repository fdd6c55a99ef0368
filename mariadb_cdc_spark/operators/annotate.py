"""ANNOTATE_ROWS statement attachment — a distributed prefix scan.

MariaDB with `binlog_annotate_row_events=ON` writes an ANNOTATE_ROWS event
carrying the originating SQL statement text immediately before the rows
events that statement produced (reference recognizes the type,
binlog/reader/packet/binlog/BinlogEventType.java:20, but never decodes it —
this operator is the engine-side materialization of those semantics). The
attach rule: every rows event gets the statement of the NEAREST PRECEDING
annotate event in log order, per server; events before the first annotate
get null.

"Last non-null preceding value over a total order" is a prefix scan — the
naive Spark formulation is a window over partitionBy(server_id), i.e. ONE
task per server sorting the whole stream. This implementation is the
standard two-level scan that stays parallel at 10^10 events:

  1. chunk the log: chunk = (binlog_file, floor(binlog_pos / chunk_bytes));
  2. per-chunk reduce (map-side combinable): the last annotate inside each
     chunk, via max_by on position — one small aggregate, O(chunks) rows;
  3. carry: for every chunk, the last annotate of any STRICTLY EARLIER
     chunk — a running last(ignorenulls) over the O(chunks) chunk list
     (driver-scale window: 10^10 events / 1 MiB chunks of ~256 B events is
     ~2.4 M chunk rows, a single-task window over kilobyte rows — if even
     that grows too large, raise chunk_bytes);
  4. join the carry back on chunk id (equi-join, AQE-managed) and run the
     within-chunk window — partitioned by CHUNK, so parallelism is
     O(chunks), not O(servers); statement = coalesce(within-chunk running
     last, chunk carry).

The same scan shape serves any "attach last preceding control event"
enrichment (GTID attach, transaction grouping by BEGIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schema import EVT_ANNOTATE

_CHUNK = "__ann_chunk"
_STMT = "__ann_stmt"


def attach_statements(
    events: DataFrame,
    *,
    chunk_bytes: int = 1 << 20,
    out_col: str = "statement",
) -> DataFrame:
    """Return `events` plus `out_col`: the nearest preceding ANNOTATE_ROWS
    statement text (per server, (binlog_file, binlog_pos) order); null for
    events before the first annotate. The annotate rows themselves carry
    their own statement (they are their own nearest-preceding)."""
    ev = events.withColumn(
        _CHUNK, F.floor(F.col("binlog_pos") / F.lit(int(chunk_bytes)))
    ).withColumn(
        _STMT,
        F.when(F.col("event_type") == EVT_ANNOTATE, F.col("sql")),
    )

    # 2. last annotate per chunk (map-side combinable max_by).
    per_chunk = (
        ev.where(F.col(_STMT).isNotNull())
        .groupBy("server_id", "binlog_file", _CHUNK)
        .agg(F.max_by(_STMT, "binlog_pos").alias("chunk_last"))
    )
    # 3. carry = running last over the chunk list, shifted one back. The
    # chunk list covers every chunk holding ANY event (else a chunk with no
    # annotate would lose its carry).
    chunks = ev.select("server_id", "binlog_file", _CHUNK).distinct()
    cw = (
        Window.partitionBy("server_id")
        .orderBy("binlog_file", _CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        chunks.join(per_chunk, ["server_id", "binlog_file", _CHUNK], "left")
        .withColumn("carry", F.last("chunk_last", ignorenulls=True).over(cw))
        .select("server_id", "binlog_file", _CHUNK, "carry")
    )

    # 4. within-chunk running last + carry fallback.
    iw = (
        Window.partitionBy("server_id", "binlog_file", _CHUNK)
        .orderBy("binlog_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.join(carry, ["server_id", "binlog_file", _CHUNK], "left")
        .withColumn(
            out_col,
            F.coalesce(
                F.last(_STMT, ignorenulls=True).over(iw), F.col("carry")
            ),
        )
        .drop(_CHUNK, _STMT, "carry")
    )
