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


def table_map_registry(events: DataFrame) -> DataFrame:
    """All TABLE_MAP occurrences with their position (for as-of resolution)."""
    return events.where(F.col("event_type") == EVT_TABLE_MAP).select(
        "server_id",
        "binlog_file",
        "binlog_pos",
        "table_id",
        "database",
        "table",
        "column_types",
        "column_names",
    )


def resolve_table_metadata(
    changes: DataFrame, table_maps: DataFrame
) -> DataFrame:
    """As-of join: each change gets the latest TABLE_MAP for its table_id at
    (binlog_file, binlog_pos) <= the change's position; unmapped changes drop.

    Adds: database, table, column_types, column_names, has_column_names.
    """
    maps = table_maps.select(
        "server_id",
        "table_id",
        F.col("binlog_file").alias("m_file"),
        F.col("binlog_pos").alias("m_pos"),
        F.struct("database", "table", "column_types", "column_names").alias("meta"),
        F.lit(None).cast("long").alias("_change_tag"),
    )
    chg = changes.withColumn("m_file", F.col("binlog_file")).withColumn(
        "m_pos", F.col("binlog_pos")
    ).withColumn("meta", F.lit(None).cast(maps.schema["meta"].dataType)).withColumn(
        "_change_tag", F.lit(1).cast("long")
    )

    chg_cols = chg.columns
    maps_padded = maps
    for c in chg_cols:
        if c not in maps.columns:
            maps_padded = maps_padded.withColumn(
                c, F.lit(None).cast(dict(zip(chg.schema.names, chg.schema.fields))[c].dataType)
            )
    unioned = maps_padded.select(*chg_cols).unionByName(chg)

    # TABLE_MAP sorts before a change at the same (file,pos): _change_tag null
    # first. In the generator TABLE_MAP positions are strictly smaller anyway.
    w = (
        Window.partitionBy("server_id", "table_id")
        .orderBy("m_file", "m_pos", F.col("_change_tag").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = unioned.withColumn(
        "meta", F.last("meta", ignorenulls=True).over(w)
    )

    out = (
        resolved.where(F.col("_change_tag") == 1)
        .where(F.col("meta").isNotNull())  # drop unmapped (reference inner semantics)
        .withColumn("database", F.col("meta.database"))
        .withColumn("table", F.col("meta.table"))
        .withColumn("column_types", F.col("meta.column_types"))
        .withColumn("column_names", F.col("meta.column_names"))
        .withColumn(
            # Mismatch guard (BinaryLogEventProcessor.java:89-91,227-236):
            # name count != type count => positional col0..N fallback.
            "has_column_names",
            F.col("meta.column_names").isNotNull()
            & (F.size("meta.column_names") == F.size("meta.column_types")),
        )
        .drop("meta", "m_file", "m_pos", "_change_tag")
    )
    return out


def positional_fallback(resolved: DataFrame) -> DataFrame:
    """Rewrite image keys to col0..colN when names are unknown/mismatched.

    Mirrors BinaryLogEventProcessor.java:227-236 (synthesized names). The
    generator emits images keyed by real column names; when
    has_column_names=false the engine must not trust them, so keys become
    positional. Images are maps, so we re-key by the position of each key in
    column_names if present else by insertion order.
    """
    def rekey(col):
        return F.when(
            F.col("has_column_names") | F.col(col).isNull(), F.col(col)
        ).otherwise(
            F.map_from_arrays(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.map_keys(F.col(col))) - 1),
                    lambda i: F.concat(F.lit("col"), i.cast("string")),
                ),
                F.map_values(F.col(col)),
            )
        )

    return resolved.withColumn("before", rekey("before")).withColumn(
        "after", rekey("after")
    )
