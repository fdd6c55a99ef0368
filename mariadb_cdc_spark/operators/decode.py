"""Decode stage: binlog events -> row-level change records.

Reference semantics re-expressed set-wise:
  - one rows-event carries N row images, delivered as one batch
    (shyikobinlog/BinaryLogEventProcessor.java:162-210) -> posexplode
  - UPDATE carries (before, after) pairs (RowsPair) -> zipped explode
  - event_type -> ChangeType INSERT/UPDATE/DELETE (ChangeType.java:3-5)
  - binlog_pos is the event NEXT-position (BinaryLogEventProcessor.java:58-64)

Everything is native Catalyst expressions (no Python UDF in this hot path):
posexplode + arrays_zip keep the stage inside whole-stage codegen.
"""

from __future__ import annotations

import struct

import pandas as pd  # noqa: F401 (pandas_udf type-hint resolution)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import (
    EVT_DELETE_ROWS,
    EVT_UPDATE_ROWS,
    EVT_WRITE_ROWS,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ROWS_EVENT_TYPES,
)

_OP_OF_EVENT = {
    EVT_WRITE_ROWS: OP_INSERT,
    EVT_UPDATE_ROWS: OP_UPDATE,
    EVT_DELETE_ROWS: OP_DELETE,
}


def decode_rows_events(events: DataFrame) -> DataFrame:
    """Explode rows-events into one record per changed row.

    Output columns: op, ts, server_id, binlog_file, binlog_pos, row_idx,
    table_id, before, after, gtid.

    UPDATE pairs before[i] with after[i] (reference UpdateRowsEvent pairs,
    binlog/reader/packet/binlog/data/RowsPair.java); WRITE has after only,
    DELETE before only (WriteRowsEvent.java / DeleteRowsEvent.java).
    """
    rows = events.where(F.col("event_type").isin(*ROWS_EVENT_TYPES))

    op = (
        F.when(F.col("event_type") == EVT_WRITE_ROWS, F.lit(OP_INSERT))
        .when(F.col("event_type") == EVT_UPDATE_ROWS, F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_DELETE))
    )

    # Unify WRITE/UPDATE/DELETE into one array of (before, after) structs so a
    # single posexplode handles all three shapes.
    n = F.greatest(
        F.coalesce(F.size("rows_before"), F.lit(0)),
        F.coalesce(F.size("rows_after"), F.lit(0)),
    )
    pairs = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            F.when(F.col("rows_before").isNotNull(), F.col("rows_before")[i]).alias(
                "before"
            ),
            F.when(F.col("rows_after").isNotNull(), F.col("rows_after")[i]).alias(
                "after"
            ),
        ),
    )

    # Per-image bitmaps (reference BinaryLogEventProcessor.java:212-225):
    # the before-image is governed by columns_used for every op; the
    # after-image by update_columns_used for UPDATE (dual-bitmap,
    # UpdateRowsEventBinLogDataDeserializer.java:18-47) else columns_used.
    # ALL-TRUE bitmaps normalize to NULL here, ONCE per event before the
    # row explode — binlog_row_image=full (the common case) then carries no
    # array through the explode and apply_column_bitmaps short-circuits on
    # the null instead of re-testing per image.
    def sparse_only(col):
        return F.when(F.exists(col, lambda x: ~x), col)

    after_used = F.when(
        F.col("event_type") == EVT_UPDATE_ROWS,
        sparse_only(
            F.coalesce(F.col("update_columns_used"), F.col("columns_used"))
        ),
    ).otherwise(sparse_only(F.col("columns_used")))
    before_used = sparse_only(F.col("columns_used"))

    return (
        rows.withColumn("op", op)
        .select(
            "op",
            "ts",
            "server_id",
            "binlog_file",
            "binlog_pos",
            "table_id",
            "gtid",
            before_used.alias("before_used"),
            after_used.alias("after_used"),
            F.posexplode(pairs).alias("row_idx", "pair"),
        )
        .select(
            "op",
            "ts",
            "server_id",
            "binlog_file",
            "binlog_pos",
            F.col("row_idx").cast("int").alias("row_idx"),
            "table_id",
            "gtid",
            "before_used",
            "after_used",
            F.col("pair.before").alias("before"),
            F.col("pair.after").alias("after"),
        )
    )


def apply_column_bitmaps(resolved: DataFrame) -> DataFrame:
    """Mask each row image down to its bitmap's used columns.

    The wire's row image contains ONLY the columns whose bit is set
    (reference deserializers read bitmap-gated fields,
    BaseRowsEventBinLogDataDeserializer.java:52-66); this envelope may carry
    a superset (the generator emits full images), so the bitmap is
    authoritative: entry (k, v) survives iff the bit at k's position in the
    table's column order is set. A NULL bitmap, or a key not found in
    column_names (post-DDL drift), conservatively KEEPS the entry.

    Runs after resolve_table_metadata / positional_fallback: positional
    images are keyed col0..colN, so position = int(substr(k, 4)); named
    images use array_position over column_names. Pure Catalyst
    (map_filter + get — 0-based, null-safe out-of-bounds), no Python.
    """
    def mask(img_col: str, used_col: str):
        def keep(k, _v):
            pos0 = F.when(
                F.col("has_column_names"),
                F.array_position(F.col("column_names"), k) - 1,
            ).otherwise(F.substring(k, 4, 10).cast("int"))
            return F.coalesce(F.get(F.col(used_col), pos0.cast("int")), F.lit(True))

        # all-true bitmap (binlog_row_image=full, the dominant case) short-
        # circuits: the per-entry array_position scan only runs for rows
        # that actually carry a sparse bitmap.
        return F.when(
            F.col(used_col).isNull()
            | F.col(img_col).isNull()
            | ~F.exists(F.col(used_col), lambda x: ~x),
            F.col(img_col),
        ).otherwise(F.map_filter(F.col(img_col), keep))

    return resolved.withColumn("before", mask("before", "before_used")).withColumn(
        "after", mask("after", "after_used")
    )


def decode_wire_images(resolved: DataFrame, with_errors: bool = False) -> DataFrame:
    """Decode hex-encoded wire-byte map values to canonical strings.

    Envelope convention for binary-image sources: a column whose registry
    type code is a WIRE type (typedec.WIRE_TYPES — NEWDECIMAL, DATETIME2,
    TIME2, TIMESTAMP2, DATE, BIT, ENUM, SET, FLOAT/DOUBLE, integer
    families, length-prefixed VARCHAR/STRING, BLOB/JSON/GEOMETRY) carries
    hex(wire bytes) as its map value; tables that publish no
    column_metadata (plain string-map sources) never reach the gate.
    Decoding needs the TABLE_MAP's per-column metadata (precision/scale,
    fsp, bit length, lengths/prefix widths) and FullMeta ENUM/SET labels,
    so this runs AFTER resolve_table_metadata.

    Arrow-batched pandas UDF — this is the genuinely-Python stage (bit-level
    wire formats are not Catalyst-expressible); rows whose table published
    no column_metadata (string-image tables) skip the Python path entirely
    via the WHEN gate, so the main repo_files stream never pays for it.

    Reference: BaseRowsEventBinLogDataDeserializer.java:52-319 (decode
    matrix), TableMapEventBinLogDataDeserializer.java:52-75 (FullMeta).

    with_errors=True additionally emits a `decode_errors: array<string>`
    column naming every contained-failure value as `<image>.<column>` —
    the dead-letter observability surface (quarantine_stats aggregates
    it). Default off: the extra column would ride through the fold and
    the hot path never pays for plumbing it only ops queries read.
    """
    from pyspark.sql.functions import pandas_udf

    from ..functions import typedec as td

    @pandas_udf("struct<img: map<string,string>, errs: array<string>>")
    def _dec(
        img: pd.Series,
        names: pd.Series,
        types: pd.Series,
        metas: pd.Series,
        enums: pd.Series,
        charsets: pd.Series,
    ) -> pd.DataFrame:
        def one(im, nm, ty, me, en, cs):
            if im is None or nm is None or ty is None:
                return im, []
            idx = {n: i for i, n in enumerate(nm)}
            out = {}
            errs = []
            for k, v in im.items():
                i = idx.get(k)
                code = ty[i] if i is not None and i < len(ty) else None
                if v is None or code is None or code not in td.WIRE_TYPES:
                    out[k] = v
                    continue
                meta = me[i] if me is not None and i < len(me) else 0
                labels = (
                    list(en[i])
                    if en is not None and i < len(en) and en[i] is not None
                    else None
                )
                charset = cs[i] if cs is not None and i < len(cs) else None
                try:
                    out[k] = td.decode_wire_value(
                        int(code),
                        int(meta or 0),
                        bytes.fromhex(v),
                        labels,
                        charset,
                    )
                except (
                    ValueError,      # non-hex, out-of-range temporal fields
                    IndexError,      # short buffer for the declared layout
                    OverflowError,   # timestamp past the epoch range
                    OSError,         # platform fromtimestamp limits
                    struct.error,    # FLOAT/DOUBLE buffer width mismatch
                ):
                    # poison-pill containment: a corrupt value must not
                    # kill the batch (which would crash-loop the stream) —
                    # keep the raw hex so the row lands inspectable and
                    # the rest of the stream proceeds
                    out[k] = v
                    errs.append(k)
            return out, errs

        pairs = [
            one(*args)
            for args in zip(img, names, types, metas, enums, charsets)
        ]
        return pd.DataFrame(
            {"img": [p[0] for p in pairs], "errs": [p[1] for p in pairs]}
        )

    gate = F.col("column_metadata").isNotNull()
    # charset column is optional on direct-caller frames (null = utf-8)
    cs_col = (
        F.col("column_charsets")
        if "column_charsets" in resolved.columns
        else F.lit(None).cast("array<string>")
    )

    def maybe(col):
        return F.when(
            gate & F.col(col).isNotNull(),
            _dec(
                F.col(col),
                F.col("column_names"),
                F.col("column_types"),
                F.col("column_metadata"),
                F.col("column_enum_values"),
                cs_col,
            ),
        )

    out = resolved.withColumn("_dec_b", maybe("before")).withColumn(
        "_dec_a", maybe("after")
    )
    out = out.withColumn(
        "before", F.coalesce(F.col("_dec_b.img"), F.col("before"))
    ).withColumn("after", F.coalesce(F.col("_dec_a.img"), F.col("after")))
    if with_errors:
        tag = lambda side, errs: F.transform(  # noqa: E731
            F.coalesce(errs, F.expr("array()")),
            lambda e: F.concat(F.lit(side + "."), e),
        )
        out = out.withColumn(
            "decode_errors",
            F.concat(
                tag("before", F.col("_dec_b.errs")),
                tag("after", F.col("_dec_a.errs")),
            ),
        )
    return out.drop("_dec_b", "_dec_a")


def quarantine_stats(decoded: DataFrame) -> DataFrame:
    """Dead-letter observability over decode_wire_images(with_errors=True):
    contained decode failures per (database, table, image, column) with the
    first affected binlog position for triage. One map-side-combinable agg
    over the (rare) error rows — the companion metric to the containment
    contract (a value that degrades to raw hex must be COUNTABLE, or
    corruption silently accumulates in the lake)."""
    e = decoded.where(F.size("decode_errors") > 0).select(
        "database",
        "table",
        "binlog_file",
        "binlog_pos",
        F.explode("decode_errors").alias("err"),
    )
    part = F.split(F.col("err"), r"\.", 2)
    return (
        e.select(
            "database",
            "table",
            part.getItem(0).alias("image"),
            part.getItem(1).alias("column"),
            "binlog_file",
            "binlog_pos",
        )
        .groupBy("database", "table", "image", "column")
        .agg(
            F.count(F.lit(1)).alias("n_failures"),
            F.min(F.struct("binlog_file", "binlog_pos")).alias("first_at"),
        )
        .select(
            "database",
            "table",
            "image",
            "column",
            "n_failures",
            F.col("first_at.binlog_file").alias("first_file"),
            F.col("first_at.binlog_pos").alias("first_pos"),
        )
    )


def dedup_replays(changes: DataFrame) -> DataFrame:
    """Absorb at-least-once duplicates.

    The reference saves the next-position *after* delivery, so a crash between
    delivery and save replays a suffix on restart (at-least-once,
    BinaryLogEventProcessor.java:106-113 + §3.4 of SURVEY.md). A replayed
    change is byte-identical including its envelope, so
    (server_id, binlog_file, binlog_pos, row_idx) is a complete dedup key.
    """
    return changes.dropDuplicates(
        ["server_id", "binlog_file", "binlog_pos", "row_idx"]
    )
