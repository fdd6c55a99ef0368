"""Z-order (Morton) clustering for sorted compaction — multi-column data
skipping.

A single-column sort (compact(sort_by=...)) gives disjoint per-file ranges
on ONE column; predicates on any other column still touch every file.
Z-ordering interleaves the bits of several columns' RANKS so that files cut
from the sorted order stay range-compact in EVERY participating dimension —
the Delta OPTIMIZE ZORDER BY / Iceberg rewrite_data_files(strategy =>
'sort', sort_order => zorder(...)) technique, built here from Catalyst
primitives:

  1. per column, map values to a small integer rank via RANGE BOUNDARIES
     computed from a bounded driver-side sample (the same
     sample-into-range-ids move Spark's own RangePartitioner and Delta's
     z-order use; works for strings too, where approxQuantile cannot);
  2. interleave the rank bits into one Morton key with shiftleft/|/& —
     pure JVM expressions, no UDF;
  3. sortWithinPartitions by the key (no extra shuffle beyond the existing
     bucket repartition) and split into several files per bucket.

The key is sort-only (never written); stats.py's footer bounds then give
every file a tight [lo, hi] on EACH z-ordered column, so read_where prunes
on any of them. Everything degrades safely: values outside the sampled
boundary range rank into the end slots, NaN/null rank 0 — wrong ranks cost
clustering quality only, never correctness (the residual filter is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 bits/column: 256 rank slots each, z-keys up to 8 columns in a long
BITS = 8
SAMPLE_CAP = 10_000


def compute_boundaries(
    df: DataFrame,
    cols: list[str],
    n_ranks: int = 1 << BITS,
    row_estimate: int | None = None,
) -> dict[str, list]:
    """Per-column range boundaries from ONE sampled pass: collect a bounded
    sample (<= SAMPLE_CAP rows per column, one job for all columns), sort
    it, take n_ranks-1 evenly spaced cut points. Driver state is
    O(cols x n_ranks) — the RangePartitioner contract, independent of
    table size. `row_estimate` (e.g. the table's row-count metric) avoids
    a count() job — an off estimate only changes the sample SIZE, and the
    rank map degrades gracefully with smaller samples."""
    total = row_estimate if row_estimate is not None else df.count()
    if total <= 0:
        return {c: [] for c in cols}
    frac = min(1.0, SAMPLE_CAP / total)
    sample = df.select(*cols).sample(fraction=frac, seed=7).collect()
    out: dict[str, list] = {}
    for c in cols:
        vals = sorted(r[c] for r in sample if r[c] is not None)
        if not vals:
            out[c] = []
            continue
        step = max(len(vals) / n_ranks, 1e-9)
        bounds = []
        for i in range(1, n_ranks):
            idx = int(i * step)
            if idx >= len(vals):
                break
            v = vals[idx]
            if not bounds or v > bounds[-1]:
                bounds.append(v)
        out[c] = bounds
    return out


def _rank(col: Column, bounds: list) -> Column:
    """rank(value) = #boundaries <= value, evaluated as a vectorized
    aggregate over a broadcast literal array — O(n_ranks) comparisons per
    row, all inside codegen. Null ranks 0."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(col.isNotNull() & (col >= b), 1).otherwise(0),
    )


def zorder_key(boundaries: dict[str, list]) -> Column:
    """Morton key: bit i of column j's rank lands at position
    i * n_cols + j. With BITS=8 and up to 8 columns the key fits a long."""
    cols = list(boundaries)
    n = len(cols)
    if n == 0:
        raise ValueError("zorder needs at least one column")
    if n > 8:
        raise ValueError("zorder supports at most 8 columns")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        r = _rank(F.col(c), boundaries[c]).cast("long")
        for i in range(BITS):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key
