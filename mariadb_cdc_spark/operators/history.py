"""SCD2 history materialization: change stream -> validity-interval rows.

The reference's listener surface delivers every row change in log order
(MariadbCdcListener.java:9-26); the canonical audit/history consumer keeps
each key's full version history as slowly-changing-dimension type-2 rows:
one row per live state interval, bounded by the positions of the changes
that opened and closed it, with the open tail flagged `is_current`.

Semantics (matching the engine's LWW fold, operators.fold):
    INSERT  opens an interval with the insert image
    UPDATE  closes the current interval and opens one with the patched
            image (partial/minimal-row-image patches merge per column)
    DELETE  closes the current interval and opens none

Implementation is the same set-wise shape as the fold: per-key
collect_list + array_sort + one pass of F.aggregate threading the fold
state while emitting a version entry per change, then transform-with-index
pairs each entry with its successor's position (valid_to) and posexplode
flattens. Zero Python in the plan.

Scale: one shuffle on the merge keys — identical to the fold's single-phase
path. A zipfian-hot key's versions build in one task; history is an
audit-grade materialization (typically run on demand or per-batch over the
batch's keys), and an order-preserving segment split like fold._fold_impl's
applies if a hot key's change count demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fold import _EV_CMP, _ZERO, _apply_event

_ENTRY = (
    "cast(array() as array<struct<binlog_file:string, binlog_pos:bigint,"
    " row_idx:int, op:string, img:map<string,string>, live:boolean>>)"
)


def scd2_history(changes: DataFrame, keys: list[str]) -> DataFrame:
    """Materialize per-key SCD2 validity intervals from decoded changes.

    Input: change records with (op, after, binlog_file, binlog_pos, row_idx)
    and the key columns lifted (operators.fold.extract_keys).

    Output: keys..., image, valid_from_file/_pos/_row_idx,
    valid_to_file/_pos/_row_idx (null = open), is_current.
    """
    ev = F.struct(
        F.col("binlog_file"),
        F.col("binlog_pos"),
        F.col("row_idx"),
        F.col("op"),
        F.col("after"),
    )

    def step(acc, x):
        ns = _apply_event(acc["state"], x)
        entry = F.struct(
            x["binlog_file"].alias("binlog_file"),
            x["binlog_pos"].alias("binlog_pos"),
            x["row_idx"].alias("row_idx"),
            x["op"].alias("op"),
            ns["img"].alias("img"),
            (~ns["deleted"]).alias("live"),
        )
        return F.struct(
            ns.alias("state"),
            F.concat(acc["out"], F.array(entry)).alias("out"),
        )

    zero = F.expr(f"named_struct('state', {_ZERO}, 'out', {_ENTRY})")

    per_key = changes.groupBy(*keys).agg(
        F.aggregate(
            F.array_sort(F.collect_list(ev), _EV_CMP), zero, step
        )["out"].alias("_versions")
    )

    n = F.size("_versions")
    with_next = per_key.select(
        *keys,
        F.transform(
            F.col("_versions"),
            lambda v, i: F.struct(
                v.alias("v"),
                F.when(i + 1 < n, F.col("_versions")[i + 1]).alias("nxt"),
                (i == n - 1).alias("is_last"),
            ),
        ).alias("_paired"),
    )

    flat = with_next.select(
        *keys, F.explode("_paired").alias("e")
    ).where(F.col("e.v.live"))

    return flat.select(
        *keys,
        F.col("e.v.img").alias("image"),
        F.col("e.v.binlog_file").alias("valid_from_file"),
        F.col("e.v.binlog_pos").alias("valid_from_pos"),
        F.col("e.v.row_idx").alias("valid_from_row_idx"),
        F.col("e.nxt.binlog_file").alias("valid_to_file"),
        F.col("e.nxt.binlog_pos").alias("valid_to_pos"),
        F.col("e.nxt.row_idx").alias("valid_to_row_idx"),
        (F.col("e.is_last") & F.col("e.v.live")).alias("is_current"),
    )
