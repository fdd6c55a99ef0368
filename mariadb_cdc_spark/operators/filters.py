"""Table include/exclude filtering + position-save predicate.

Reference: exact-string `db.table` include/exclude maps, exclude wins, empty
include-set allows all (shyikobinlog/BinaryLogEventProcessor.java:144-149,
config MariadbCdcConfig.java:57-71, tests MariadbCdc_Filter_Test.java:42-90).

The filter is applied on envelope columns BEFORE any expensive work — Catalyst
cannot push a predicate through a Python UDF, so stage order in this package
is itself the optimization (reference applies the filter before DataRow
materialization for the same reason, BinaryLogEventProcessor.java:87 vs 92-98).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import NO_POSITION_SAVE_TYPES


def table_filter_predicate(
    included: list[str] | None, excluded: list[str] | None
) -> Column:
    """Predicate over columns `database`, `table`. Excluded wins; empty/None
    include list allows all — exact reference semantics."""
    dbtable = F.concat_ws(".", F.lower("database"), F.lower("table"))
    pred = F.lit(True)
    if excluded:
        pred = pred & ~dbtable.isin([x.lower() for x in excluded])
    if included:
        pred = pred & dbtable.isin([x.lower() for x in included])
    return pred


def filter_tables(
    changes: DataFrame,
    included: list[str] | None = None,
    excluded: list[str] | None = None,
) -> DataFrame:
    return changes.where(table_filter_predicate(included, excluded))


def position_advancing(events: DataFrame) -> DataFrame:
    """Events allowed to advance the checkpoint: everything except
    FORMAT_DESCRIPTION and TABLE_MAP (BinaryLogEventProcessor.java:128-132,
    asserted by BinaryLogEventProcessorTest.java:297-308)."""
    return events.where(~F.col("event_type").isin(*NO_POSITION_SAVE_TYPES))
