"""TABLE_MAP registry: as-of join of rows-events to table metadata.

Reference: every rows-event references a numeric table_id resolved against the
most recent preceding TABLE_MAP event for that id (mutable Map<Long,TableInfo>,
shyikobinlog/TableInfos.java:6-24, lookup BinaryLogEventProcessor.java:84-100).
Rows events with no preceding TABLE_MAP are DROPPED
(BinaryLogEventProcessorTest.java:202-214).

Spark re-expression: the "most recent preceding map" is an as-of join. We
implement it without mutable state as a union + ordered window carry-forward:
union TABLE_MAP rows with change rows, sort per table_id by (binlog_file,
binlog_pos), and propagate the last non-null metadata downward with
last(..., ignorenulls=True). Inner-drop of unmapped rows matches the
reference. The number of distinct table_ids is small (it's a table count, not
a row count), so the per-table_id window parallelizes across tables; at
cluster scale this stage shuffles once on table_id and is dwarfed by the
merge shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import EVT_TABLE_MAP


# TABLE_MAP metadata payload carried through the registry (the reference's
# TableMapEvent fields incl. the FullMeta labels).
META_COLS = [
    "database",
    "table",
    "column_types",
    "column_names",
    "column_metadata",
    "column_enum_values",
    "column_charsets",
]


def table_map_registry(events: DataFrame) -> DataFrame:
    """All TABLE_MAP occurrences with their position (for as-of resolution)."""
    return (
        events.where(F.col("event_type") == EVT_TABLE_MAP)
        .select(
            "server_id",
            "binlog_file",
            "binlog_pos",
            "table_id",
            *META_COLS,
        )
        # at-least-once replay can duplicate maps; identical (pos, id) maps
        # would create zero-width intervals — harmless but noisy
        .dropDuplicates(["server_id", "binlog_file", "binlog_pos", "table_id"])
    )


def coalesce_table_maps(table_maps: DataFrame) -> DataFrame:
    """Collapse adjacent identical-payload TABLE_MAP occurrences into one row
    per island (run-length encoding of schema versions per table).

    A REAL binlog repeats TABLE_MAP before every transaction
    (shyikobinlog/BinaryLogEventProcessor.java:84-100 resolves each rows
    event against the current map), so raw occurrences are O(transactions).
    Any driver collect or broadcast of that set is a scale-killer; after
    coalescing it is O(tables x schema-versions) — the same cardinality the
    reference holds in its in-memory TableInfos map (TableInfos.java:6-24).

    Two-level RLE keeps the windows parallel at 10^10 events: level 1 runs
    per (server_id, table_id, binlog_file) — parallelism O(tables x files),
    each task bounded by one file's maps (a binlog file is size-capped) —
    and level 2 merges the surviving per-file runs across files, a window
    over O(tables x files x versions) tiny rows. RLE is associative over
    adjacent chunks, so re-encoding the concatenated per-file runs yields
    the exact global island set.
    """
    lvl1 = _rle_islands(table_maps, extra_part=["binlog_file"])
    return _rle_islands(lvl1, extra_part=[])


def _rle_islands(table_maps: DataFrame, extra_part: list[str]) -> DataFrame:
    w = Window.partitionBy("server_id", "table_id", *extra_part).orderBy(
        "binlog_file", "binlog_pos"
    )
    payload = F.struct(*META_COLS)
    return (
        table_maps.withColumn(
            "_chg",
            F.when(payload.eqNullSafe(F.lag(payload).over(w)), F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("_island", F.sum("_chg").over(w))
        .groupBy("server_id", "table_id", *extra_part, "_island")
        .agg(
            F.min(F.struct("binlog_file", "binlog_pos")).alias("_from"),
            *[F.first(c).alias(c) for c in META_COLS],
        )
        .select(
            "server_id",
            F.col("_from.binlog_file").alias("binlog_file"),
            F.col("_from.binlog_pos").alias("binlog_pos"),
            "table_id",
            *META_COLS,
        )
    )


def resolve_table_metadata(
    changes: DataFrame, table_maps: DataFrame
) -> DataFrame:
    """As-of join: each change gets the latest TABLE_MAP for its table_id at
    (binlog_file, binlog_pos) <= the change's position; unmapped changes drop.

    Implementation is an INTERVAL BROADCAST join, not a window: TABLE_MAPs
    are control-plane rows (O(tables), thousands at most — the reference
    holds them all in one in-memory Map, TableInfos.java:6-24), so we turn
    each map into a validity interval [its position, next map's position for
    the same (server_id, table_id)) with a tiny window over the MAPS ONLY,
    then broadcast-join changes on table_id + range predicate. The change
    stream keeps full scan parallelism — no repartition-by-table_id, which
    would serialize 10^10 events through O(tables) partitions.

    Interval COALESCING: a real binlog repeats TABLE_MAP before every rows
    event, so raw intervals number O(events), all keyed by the same
    (server_id, table_id) — a broadcast hash join would linearly scan every
    interval per change row (O(rows x maps) comparisons). Adjacent intervals
    whose metadata payload is identical resolve every position inside them to
    the same answer, so they merge losslessly into one island
    (gaps-and-islands over the tiny maps side). The broadcast side collapses
    to O(tables x schema-versions) — per-row candidate scan becomes O(1).

    Adds: database, table, column_types, column_names, has_column_names.
    """
    islands = coalesce_table_maps(table_maps).withColumn(
        "valid_from", F.struct("binlog_file", "binlog_pos")
    )
    wi = Window.partitionBy("server_id", "table_id").orderBy("valid_from")
    intervals = islands.select(
        "server_id",
        "table_id",
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        *META_COLS,
    )

    m = intervals.alias("m")
    c = changes.alias("c")
    pos = F.struct(
        F.col("c.binlog_file").alias("binlog_file"),
        F.col("c.binlog_pos").alias("binlog_pos"),
    )
    cond = (
        (F.col("c.server_id") == F.col("m.server_id"))
        & (F.col("c.table_id") == F.col("m.table_id"))
        & (pos >= F.col("m.valid_from"))
        & (F.col("m.valid_to").isNull() | (pos < F.col("m.valid_to")))
    )
    out = c.join(F.broadcast(m), cond, "inner").select(  # inner ⇒ drop unmapped
        *[F.col(f"c.{x}") for x in changes.columns],
        *[F.col(f"m.{x}").alias(x) for x in META_COLS],
        (
            # Mismatch guard (BinaryLogEventProcessor.java:89-91,227-236):
            # name count != type count => positional col0..N fallback.
            F.col("m.column_names").isNotNull()
            & (F.size("m.column_names") == F.size("m.column_types"))
        ).alias("has_column_names"),
    )
    return out


def positional_fallback(resolved: DataFrame) -> DataFrame:
    """Rewrite image keys to col<i> when names are unknown/mismatched.

    Mirrors BinaryLogEventProcessor.java:227-236 (synthesized names). The
    positional index comes from the image's BITMAP, exactly as the wire
    decoder assigns values (readColumnValues,
    BaseRowsEventBinLogDataDeserializer.java:20-41): the i-th map entry is
    the i-th SET BIT of columns_used / update_columns_used. A sparse
    minimal-image map {v} with bitmap [F,T] therefore re-keys to col1, not
    col0 — entry order alone would mis-address every sparse image. With no
    bitmap (null = all columns), set-bit order degenerates to 0..N.
    """
    def rekey(col, used_col):
        positions = F.filter(
            F.sequence(F.lit(0), F.size(F.col(used_col)) - 1),
            lambda i: F.get(F.col(used_col), i.cast("int")),
        )
        # Set-bit addressing requires the wire invariant |entries| == |set
        # bits|; envelope images carrying a superset (bitmap authoritative,
        # see apply_column_bitmaps) keep plain entry order.
        use_bits = F.col(used_col).isNotNull() & (
            F.size(positions) == F.size(F.map_keys(F.col(col)))
        )
        return F.when(
            F.col("has_column_names") | F.col(col).isNull(), F.col(col)
        ).otherwise(
            F.map_from_arrays(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.map_keys(F.col(col))) - 1),
                    lambda i: F.concat(
                        F.lit("col"),
                        F.coalesce(
                            F.when(use_bits, F.get(positions, i.cast("int"))),
                            i,
                        ).cast("string"),
                    ),
                ),
                F.map_values(F.col(col)),
            )
        )

    has_bitmaps = (
        "before_used" in resolved.columns and "after_used" in resolved.columns
    )
    if not has_bitmaps:
        resolved = resolved.withColumn(
            "before_used", F.lit(None).cast("array<boolean>")
        ).withColumn("after_used", F.lit(None).cast("array<boolean>"))
    out = resolved.withColumn(
        "before", rekey("before", "before_used")
    ).withColumn("after", rekey("after", "after_used"))
    if not has_bitmaps:
        out = out.drop("before_used", "after_used")
    return out
