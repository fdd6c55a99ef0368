"""Schemas for the binlog-shaped change-event envelope and decoded records.

Mirrors the reference event model:
  - header: /root/reference/src/main/java/mariadbcdc/binlog/reader/packet/binlog/BinLogHeader.java:3-75
  - event types: .../binlog/BinlogEventType.java:6-27
  - rows payloads: .../binlog/data/WriteRowsEvent.java, data/RowsPair.java (update before/after)
  - TABLE_MAP: .../binlog/data/TableMapEvent.java:10-88
  - decoded record: /root/reference/src/main/java/mariadbcdc/RowChangedData.java:3-60
"""

from __future__ import annotations

from pyspark.sql import types as T

# Event types, reference BinlogEventType.java:6-27 (subset the processor handles,
# shyikobinlog/BinaryLogEventProcessor.java:43-114).
EVT_FORMAT_DESCRIPTION = "FORMAT_DESCRIPTION"
EVT_ROTATE = "ROTATE"
EVT_TABLE_MAP = "TABLE_MAP"
EVT_WRITE_ROWS = "WRITE_ROWS"
EVT_UPDATE_ROWS = "UPDATE_ROWS"
EVT_DELETE_ROWS = "DELETE_ROWS"
EVT_QUERY = "QUERY"
EVT_XID = "XID"
EVT_HEARTBEAT = "HEARTBEAT"
EVT_STOP = "STOP"
# ANNOTATE_ROWS (BinlogEventType.java:20, MariaDB binlog_annotate_row_events):
# carries the SQL statement text that produced the FOLLOWING rows events,
# until the next annotate. Payload rides the `sql` envelope column.
EVT_ANNOTATE = "ANNOTATE_ROWS"

ROWS_EVENT_TYPES = (EVT_WRITE_ROWS, EVT_UPDATE_ROWS, EVT_DELETE_ROWS)

# Events that must NOT advance the position checkpoint
# (shyikobinlog/BinaryLogEventProcessor.java:128-132).
NO_POSITION_SAVE_TYPES = (EVT_FORMAT_DESCRIPTION, EVT_TABLE_MAP)

# Change types, reference ChangeType.java:3-5.
OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"

_IMG = T.ArrayType(T.MapType(T.StringType(), T.StringType()))

# One row per binlog event. Rows-events carry an array of row images that the
# decode stage explodes (reference delivers one List<RowChangedData> per event,
# shyikobinlog/BinaryLogEventProcessor.java:162-172).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("server_id", T.LongType(), False),
        T.StructField("binlog_file", T.StringType(), False),
        T.StructField("binlog_pos", T.LongType(), False),  # event NEXT-position
        T.StructField("event_type", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("table_id", T.LongType(), True),
        T.StructField("database", T.StringType(), True),  # TABLE_MAP only
        T.StructField("table", T.StringType(), True),  # TABLE_MAP only
        T.StructField("column_types", T.ArrayType(T.IntegerType()), True),
        T.StructField("column_names", T.ArrayType(T.StringType()), True),
        # per-column wire metadata (TableMapEvent.getMetadata(): decimal
        # precision|scale<<8, temporal fsp, BIT length, string length) and
        # the FullMeta ENUM/SET label lists
        # (TableMapEventBinLogDataDeserializer.java:52-75)
        T.StructField("column_metadata", T.ArrayType(T.IntegerType()), True),
        T.StructField(
            "column_enum_values",
            T.ArrayType(T.ArrayType(T.StringType())),
            True,
        ),
        # per-column character-set NAME for string-typed columns (reference
        # carries charset through TABLE_MAP FullMeta DEFAULT_CHARSET/
        # COLUMN_CHARSET and decodes payloads with it,
        # BaseRowsEventBinLogDataDeserializer.java:181-216); null entry or
        # null array = utf-8 (functions.typedec.CHARSET_CODECS)
        T.StructField("column_charsets", T.ArrayType(T.StringType()), True),
        T.StructField("columns_used", T.ArrayType(T.BooleanType()), True),
        T.StructField("update_columns_used", T.ArrayType(T.BooleanType()), True),
        T.StructField("rows_before", _IMG, True),  # UPDATE/DELETE images
        T.StructField("rows_after", _IMG, True),  # WRITE/UPDATE images
        T.StructField("sql", T.StringType(), True),  # QUERY only
        T.StructField("xid", T.LongType(), True),  # XID only
        T.StructField("rotate_file", T.StringType(), True),
        T.StructField("rotate_pos", T.LongType(), True),
    ]
)

# Decoded row-level change record (RowChangedData.java:3-60): envelope plus
# before/after images; `row_idx` disambiguates rows within one multi-row event
# so (server_id, binlog_file, binlog_pos, row_idx) is a replay-dedup key.
CHANGE_COLUMNS = [
    "op",
    "database",
    "table",
    "ts",
    "server_id",
    "binlog_file",
    "binlog_pos",
    "row_idx",
    "before",
    "after",
    "has_column_names",
]

# MySQL/MariaDB wire type codes (FieldType.java:6-38) — the subset used by the
# synthetic generator plus the type-matrix decode tests.
FIELD_TYPE = {
    "DECIMAL": 0,
    "TINY": 1,
    "SHORT": 2,
    "LONG": 3,
    "FLOAT": 4,
    "DOUBLE": 5,
    "NULL": 6,
    "TIMESTAMP": 7,
    "LONGLONG": 8,
    "INT24": 9,
    "DATE": 10,
    "TIME": 11,
    "DATETIME": 12,
    "YEAR": 13,
    "NEWDATE": 14,
    "VARCHAR": 15,
    "BIT": 16,
    "JSON": 245,
    "NEWDECIMAL": 246,
    "ENUM": 247,
    "SET": 248,
    "TINY_BLOB": 249,
    "MEDIUM_BLOB": 250,
    "LONG_BLOB": 251,
    "BLOB": 252,
    "VAR_STRING": 253,
    "STRING": 254,
    "GEOMETRY": 255,
}
