"""Change-record export envelopes for downstream message buses.

The reference hands RowChangedData objects to arbitrary listener code
(MariadbCdcListener.java:9-26); the ecosystem-standard wire shape for that
hand-off is the Debezium change envelope (key = primary-key JSON, value =
{before, after, source, op, ts_ms}). This module renders the engine's
decoded change records into that shape as (key, value) JSON string columns
— the frame a Kafka/queue writer sends verbatim.

Pure Catalyst (`to_json` over structs/maps, whole-stage codegen): at
100 TB the export is a projection on the decode output, no shuffle, no
Python. Pairs with pipeline.apply_batch(changes_sink=...) for the
per-epoch hand-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Debezium op codes (Debezium's public envelope contract):
#   c = create/insert, u = update, d = delete
_OP_CODE = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}


def debezium_envelope(
    changes: DataFrame,
    keys: list[str],
    connector: str = "mariadb-cdc-spark",
) -> DataFrame:
    """Render decoded change records as Debezium-shaped (key, value) JSON.

    key   = JSON object of the merge-key columns (taken from after, falling
            back to before for DELETEs — same rule as fold.extract_keys).
    value = {"before": ..., "after": ..., "source": {connector, server_id,
            db, table, file, pos, row}, "op": c|u|d, "ts_ms": ...}
            with null before/after omitted (to_json drops null fields),
            matching Debezium's insert (before absent) / delete (after
            absent) rendering.

    Timestamps export as epoch millis (ts_ms) — Debezium's convention and
    engine-portable (no timestamp-format coupling).
    """
    op_code = F.lit(None).cast("string")
    for op, code in _OP_CODE.items():
        op_code = F.when(F.col("op") == op, F.lit(code)).otherwise(op_code)

    key_struct = F.struct(
        *[
            F.coalesce(
                F.col("after").getItem(k), F.col("before").getItem(k)
            ).alias(k)
            for k in keys
        ]
    )
    source = F.struct(
        F.lit(connector).alias("connector"),
        F.col("server_id").alias("server_id"),
        F.col("database").alias("db"),
        F.col("table").alias("table"),
        F.col("binlog_file").alias("file"),
        F.col("binlog_pos").alias("pos"),
        F.col("row_idx").alias("row"),
    )
    value_struct = F.struct(
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        source.alias("source"),
        op_code.alias("op"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    return changes.select(
        F.to_json(key_struct).alias("key"),
        F.to_json(value_struct).alias("value"),
    )
