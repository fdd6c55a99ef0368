"""General as-of (temporal) join — an operator Spark lacks natively.

For each left row, attach the single most recent right row whose timestamp is
<= the left timestamp (backward direction; >= for forward), per equi-key.
This is pandas.merge_asof / DuckDB ASOF JOIN / kdb+ aj semantics, the
canonical enrichment join for event streams against slowly-changing state.

The engine already uses the same idea in two special forms — the TABLE_MAP
validity-interval registry join (operators/registry.py, reference
TableInfos.java:6-24 "most recent TABLE_MAP for the id wins",
shyikobinlog/BinaryLogEventProcessor.java:84-100) and SCD2 interval history
(operators/history.py). This is the user-facing general form.

Scale design — union + running last, ONE shuffle, no range explosion:
  1. union the two sides into one stream tagged by side, right payload as a
     struct column (null on left rows);
  2. per-key window ordered by (ts, side, tiebreak...) with a running
     last(right_struct, ignorenulls=True) — each left row sees exactly the
     latest right row at or before it;
  3. keep left rows, project the carried struct.
Compared to the naive range join (left x right filtered to rt <= lt, then
max_by) this never materializes the quadratic candidate set: cost is one
hash shuffle on the key + a per-key sort, both spill-safe, and AQE's skew
handling applies to the shuffle. Hot single keys (one key = one sort task)
are the documented caveat — same as any keyed window; salt upstream if one
key carries a material fraction of the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_TS = "__asof_ts"
_R = "__asof_right"
_M = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    right_cols: list[str] | None = None,
    right_order: list[str] | None = None,
    direction: str = "backward",
    inclusive: bool = True,
    tolerance: Column | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's columns.

    on          equi-join keys present on both sides.
    left_ts / right_ts
                ordering columns (any orderable type, e.g. timestamp or a
                (file,pos)-derived long).
    right_cols  right payload columns to attach (default: all non-key,
                non-ts columns). Attached nullable; no match => nulls.
    right_order extra right-side tiebreak columns — when several right rows
                share one right_ts, the row GREATEST under this ordering wins
                (deterministic; without it the result is only deterministic
                if (on, right_ts) is unique on the right).
    direction   'backward' (right_ts <= left_ts, most recent wins) or
                'forward' (right_ts >= left_ts, earliest wins).
    inclusive   whether right_ts == left_ts may match.
    tolerance   optional predicate bounding the match distance: a callable
                (left_ts_col, right_ts_col) -> boolean Column, e.g.
                lambda l, r: l.cast("long") - r.cast("long") <= 3600.
                Matches outside the tolerance become nulls.
    suffix      appended to attached right column names (collision guard).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    # the attached right-ts column f"{right_ts}{suffix}" is part of the
    # output too — include it in the clash check or the result frame would
    # carry ambiguous duplicate column names
    clash = [
        c for c in [*payload, right_ts] if (c + suffix) in left.columns
    ]
    if clash:
        raise ValueError(
            f"right columns {clash} collide with left; pass suffix="
        )

    # side tag: the right row must sort BEFORE an equal-ts left row for
    # inclusive semantics (so the running last() has already absorbed it),
    # AFTER it for exclusive — in both directions, since the scan order
    # flips together with the match inequality.
    r_side, l_side = (0, 1) if inclusive else (1, 0)

    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        F.struct(
            F.col(right_ts).alias(_TS), *[F.col(c) for c in payload]
        ).alias(_R),
        *[
            F.col(c).alias(f"__tb_{i}")
            for i, c in enumerate(right_order or [])
        ],
    )
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_R].dataType).alias(_R),
        *[
            F.lit(None).cast(r.schema[f"__tb_{i}"].dataType).alias(f"__tb_{i}")
            for i in range(len(right_order or []))
        ],
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"),
    )
    r = r.withColumn(
        "__asof_left", F.lit(None).cast(l.schema["__asof_left"].dataType)
    )

    asc = direction == "backward"
    order = [
        F.col(_TS).asc() if asc else F.col(_TS).desc(),
        F.col(_SIDE).asc(),
    ] + [
        # right-side tiebreak within one right_ts: ascending, so the
        # greatest-tiebreak row is scanned last and the running last()
        # picks it. Left rows carry nulls here and are already separated
        # by _SIDE, so ties never reorder across sides.
        F.col(f"__tb_{i}").asc()
        for i in range(len(right_order or []))
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn(_M, F.last(_R, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == l_side)
    )
    if tolerance is not None:
        dist_ok = tolerance
        matched = matched.withColumn(
            _M,
            F.when(
                F.col(_M).isNotNull()
                & dist_ok(F.col(_TS), F.col(_M)[_TS]),
                F.col(_M),
            ),
        )
    return matched.select(
        *[F.col(f"__asof_left.{c}").alias(c) for c in left.columns],
        F.col(_M)[_TS].alias(f"{right_ts}{suffix}"),
        *[F.col(_M)[c].alias(f"{c}{suffix}") for c in payload],
    )
