"""Initial-snapshot bootstrap: seed the lake table from a consistent source
snapshot, then tail the change stream from the position captured WITH the
snapshot.

Reference parity: when no checkpoint exists the reference starts tailing
from the CURRENT master position (`MariadbCdc.java:96-114` falls through to
`show master status`, `BinLogSession.java:76-91`) — the pre-existing table
contents are assumed loaded out-of-band. This operator ships that
out-of-band step as a first-class, replay-safe engine primitive (the
snapshot-then-stream bootstrap every production CDC deployment needs):

  1. capture a consistent snapshot of the source table together with the
     binlog position it reflects (on a real server: the
     `FLUSH TABLES WITH READ LOCK` + `SHOW MASTER STATUS` pair, or a
     `START TRANSACTION WITH CONSISTENT SNAPSHOT` read);
  2. write the snapshot as the lake table's initial state, every row
     STAMPED with that position;
  3. commit the position as the table's lineage, so the streaming tail
     resumes strictly after it.

Replay safety is layered, not coordinated:
  - `apply_batch(..., resume_from_lineage=True)` prunes pre-snapshot events
    at the SCAN (a pushdown-friendly predicate, `checkpoint.events_after`);
  - even events that slip past the filter lose the per-key position gate
    (`lake.LakeTable.merge` applies an update only when its position is
    strictly newer than the stored row's) because every snapshot row
    carries the snapshot position with row_idx = INT_MAX — an event at or
    before the snapshot position compares <= and is a no-op.

Scale: the snapshot lands through merge's empty-bucket fast path — no join
against existing state, one bucket-partitioned write; a 100 TB initial load
streams straight from the source scan to bucketed parquet with a single
shuffle (the bucket hash), and the per-row position stamp means bootstrap
and tail can even overlap (events concurrent with the snapshot window
resolve per key by the gate, the Debezium snapshot-mode guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Snapshot rows win ties against any event AT the snapshot position: the
# gate compares (file, pos, row_idx) lexicographically and real events
# carry small row indexes.
_SNAPSHOT_ROW_IDX = 2**31 - 1


def snapshot_position(lineage: dict) -> tuple[str, int]:
    """The single (file, pos) a snapshot is consistent as-of: the max across
    the per-server lineage (`checkpoint.batch_lineage` shape). A table is
    replicated from one server's binlog, so the max is normally the only
    entry."""
    if not lineage:
        raise ValueError("empty lineage: no position to bootstrap from")
    best = max(
        ((v["file"], int(v["pos"])) for v in lineage.values()),
    )
    return best


def bootstrap_snapshot(
    snapshot: DataFrame,
    table,
    lineage: dict,
    *,
    stream_id: str = "default",
    batch_id: int = 0,
) -> dict:
    """Seed `table` (a `sources.lake.LakeTable`) from `snapshot`.

    `snapshot` must carry the table's key columns plus any value columns;
    `lineage` is the per-server position dict captured atomically with the
    snapshot read (`checkpoint.batch_lineage` over the events consumed so
    far, or a hand-built ``{server: {"file": ..., "pos": ...}}``).

    The snapshot is written as one position-gated MERGE batch: committed
    exactly-once under (stream_id, batch_id), lineage recorded so
    `apply_batch(..., resume_from_lineage=True)` tails from the snapshot
    point. Raises if the table already holds data — bootstrapping into a
    populated table would silently mix two histories.
    """
    meta = table.metadata()
    if meta["buckets"] or meta.get("deltas"):
        raise ValueError(
            "bootstrap_snapshot requires an empty table; "
            "use apply_batch for incremental changes"
        )
    keys = meta["keys"]
    file, pos = snapshot_position(lineage)
    value_cols = [c for c in snapshot.columns if c not in keys]
    image_entries: list = []
    for c in value_cols:
        image_entries.append(F.lit(c))
        image_entries.append(F.col(c).cast("string"))
    folded = snapshot.select(
        *keys,
        F.lit("UPSERT").alias("final_op"),
        F.create_map(*image_entries).alias("image"),
        F.lit(file).alias("last_file"),
        F.lit(pos).cast("long").alias("last_pos"),
        F.lit(_SNAPSHOT_ROW_IDX).cast("int").alias("last_row_idx"),
        F.lit(1).cast("long").alias("n_changes"),
    )
    return table.merge(
        folded, stream_id=stream_id, batch_id=batch_id, lineage=lineage
    )
