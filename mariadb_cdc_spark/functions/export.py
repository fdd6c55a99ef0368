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


# from_json schema of the envelope above (images stay generic string maps —
# the same late-typed convention the engine's own decode produces).
_VALUE_SCHEMA = (
    "before map<string,string>, after map<string,string>, "
    "source struct<connector: string, server_id: bigint, db: string, "
    "table: string, file: string, pos: bigint, row: int>, "
    "op string, ts_ms bigint"
)


def parse_debezium(frames: DataFrame, value_col: str = "value") -> DataFrame:
    """Inverse connector: parse Debezium-shaped change envelopes (e.g. an
    existing Kafka topic another connector populates) back into this
    engine's change-record shape, so the fold/merge/SCD2/IVM pipeline can
    consume a bus-sourced stream exactly like a binlog-sourced one.

    Pure `from_json` projection (no shuffle/Python). Rows whose value is
    not a parseable envelope (op missing) are dropped — bus topics carry
    tombstone/heartbeat messages a consumer must skip.
    """
    v = F.from_json(F.col(value_col), _VALUE_SCHEMA)
    op = (
        F.when(v["op"] == "c", F.lit("INSERT"))
        .when(v["op"] == "u", F.lit("UPDATE"))
        .when(v["op"] == "d", F.lit("DELETE"))
    )
    return frames.select(
        op.alias("op"),
        v["source"]["db"].alias("database"),
        v["source"]["table"].alias("table"),
        F.timestamp_millis(v["ts_ms"]).alias("ts"),
        v["before"].alias("before"),
        v["after"].alias("after"),
        v["source"]["server_id"].alias("server_id"),
        v["source"]["file"].alias("binlog_file"),
        v["source"]["pos"].alias("binlog_pos"),
        v["source"]["row"].alias("row_idx"),
    ).where(F.col("op").isNotNull())
