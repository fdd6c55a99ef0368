"""Mergeable sketch aggregates for 100 TB-scale distinct counting.

Exact countDistinct shuffles every distinct value; at web scale the
operational pattern is instead: build per-partition/per-day HLL sketches
once, persist them, and UNION sketches to any coarser grain (week, month,
all-time) without touching raw data again. Spark ships Apache DataSketches
HLL natively (hll_sketch_agg / hll_union_agg / hll_sketch_estimate —
JVM-side, map-side combinable), so the whole path stays in Catalyst.

No DuckDB oracle: the sketch binary is engine-specific (DataSketches), so
this is one of the declared non-SQL-expressible operators — correctness is
pinned by pytest instead: union-of-parts produces the IDENTICAL estimate
as a direct sketch over the whole (HLL register merge is lossless at equal
lg_k), and estimates sit within the published HLL error envelope of exact
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_rollup(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL distinct sketch + estimate.

    Returns dims..., n_distinct_est (long), sketch (binary — persist it;
    rollup_union coarsens it later without the raw data).
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
    return (
        df.groupBy(*dims)
        .agg(sk.alias("sketch"))
        .select(
            *dims,
            F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
            "sketch",
        )
    )


def rollup_union(
    sketches: DataFrame,
    dims: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union fine-grained sketches to a coarser grain (e.g. daily -> monthly,
    per-shard -> global). `dims` may be empty for a single all-up row.
    Register-level merge: no raw-data rescan, map-side combinable."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias("sketch")
    g = sketches.groupBy(*dims) if dims else sketches.groupBy()
    return g.agg(agg).select(
        *dims,
        F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
        "sketch",
    )
