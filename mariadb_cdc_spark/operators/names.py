"""Column-name side channel: catalog lookup + cache + stale-count guard.

Pre-10.5 binlogs (no binlog_row_metadata=full) carry NO column names in
TABLE_MAP; the reference fills them from INFORMATION_SCHEMA via a memoized
side channel and invalidates on DDL:

  - JdbcColumnNamesGetter.java:27-48 — catalog query per (database, table);
  - ColumnNameCache.java:22-44 — memoize, invalidate(db, table) (a bare
    table name invalidates every "<any-db>.table" entry);
  - BinaryLogEventProcessor.java:89-91 — STALE-COUNT GUARD: fetched names
    are adopted only when their count matches the event's column count;
    otherwise the row stays positional (col0..N) until the next fetch after
    DDL invalidation recovers (MariadbCdc_NoColumnNames_Test.java:39-81).

Spark mapping: the set of tables missing names is O(tables), so the fetch
is one driver-side collect + broadcast of a tiny names side-table; images
(already positional col0..N from positional_fallback) re-key by index. No
JDBC in this sandbox — deployments plug any callable
(database, table) -> list[str] (a spark.read.jdbc over
INFORMATION_SCHEMA.COLUMNS, a catalog REST call, a static dict for tests).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ColumnNamesGetter = Callable[[str, str], Optional[list]]


class ColumnNameCache:
    """Memoized side-channel lookups (ColumnNameCache.java:22-44)."""

    def __init__(self, getter: ColumnNamesGetter):
        self._getter = getter
        self._cache: dict[str, list[str] | None] = {}

    def get(self, database: str, table: str) -> list[str] | None:
        key = f"{database}.{table}"
        if key not in self._cache:
            self._cache[key] = self._getter(database, table)
        return self._cache[key]

    def invalidate(self, database: str | None, table: str) -> None:
        """DDL invalidation; a DDL without a database qualifier drops every
        cached entry for that table name (reference :31-42)."""
        if database:
            self._cache.pop(f"{database}.{table}", None)
        else:
            for key in [k for k in self._cache if k.endswith(f".{table}")]:
                self._cache.pop(key)


def static_names_getter(mapping: dict) -> ColumnNamesGetter:
    """Test/deployment helper: {(database, table): [names...]} -> getter."""
    return lambda database, table: mapping.get((database, table))


def enrich_column_names(
    changes: DataFrame, cache: ColumnNameCache
) -> DataFrame:
    """Fill missing column names from the side channel.

    Rows with has_column_names=false (their TABLE_MAP carried none, or a
    mismatched count) get names fetched per (database, table) — a
    driver-side O(tables) collect — and adopt them ONLY where the fetched
    count equals the event's column count (the stale-count guard); their
    positional col0..N image keys re-key to the real names. Rows failing
    the guard stay positional and recover on a later call after
    cache.invalidate (the DDL path in pipeline.apply_batch).
    """
    missing = (
        changes.where(~F.col("has_column_names"))
        .select("database", "table")
        .distinct()
        .collect()
    )
    fetched = [
        (r["database"], r["table"], names)
        for r in missing
        if (names := cache.get(r["database"], r["table"]))
    ]
    if not fetched:
        return changes
    side = F.broadcast(
        changes.sparkSession.createDataFrame(
            fetched, "database string, table string, _side_names array<string>"
        )
    )
    joined = changes.join(side, ["database", "table"], "left")

    adopt = (
        ~F.col("has_column_names")
        & F.col("_side_names").isNotNull()
        & (F.size("_side_names") == F.size("column_types"))
    )

    def rekey(col):
        # positional col0..N keys -> side_names[index]; order preserved
        return F.when(
            ~adopt | F.col(col).isNull(), F.col(col)
        ).otherwise(
            F.map_from_arrays(
                F.transform(
                    F.map_keys(F.col(col)),
                    lambda k: F.coalesce(
                        F.get(
                            F.col("_side_names"),
                            F.substring(k, 4, 10).cast("int"),
                        ),
                        k,
                    ),
                ),
                F.map_values(F.col(col)),
            )
        )

    return (
        joined.withColumn("before", rekey("before"))
        .withColumn("after", rekey("after"))
        .withColumn(
            "column_names",
            F.when(adopt, F.col("_side_names")).otherwise(F.col("column_names")),
        )
        .withColumn("has_column_names", F.col("has_column_names") | adopt)
        .drop("_side_names")
    )
