"""Consistency / drift audit between a source snapshot and the lake table —
the pt-table-checksum pattern (Percona Toolkit), distributed.

Why it exists: the replay gate proves the ENGINE reconverges to an
identical state, but production also needs to prove the LAKE still matches
the LIVE SOURCE after months of streaming (operator error, retention bugs,
out-of-band writes). A naive full outer join of two 100 TB tables per audit
is unaffordable; pt-table-checksum's answer is hierarchical: cheap
order-independent digests over key-space slices first, then a key-level
diff ONLY inside the slices whose digests disagree. Steady state (no
drift) costs two digest scans and ZERO join; localized drift pays the join
only for its slices.

Digest design: per slice (hash(keys) % n_slices), aggregate
  n_rows, bit_xor(h1), bit_xor(h2)
where h1/h2 are two independently-salted 64-bit hashes of the row's
canonical JSON (to_json(struct(keys..., values...)) — null-safe and
column-order-fixed, unlike bare multi-column xxhash64 which folds nulls
into the seed). XOR is commutative/associative → the aggregate is
order-independent and map-side combinable; two salts + the row count make
accidental cancellation (two differing row sets with equal digest)
cryptographically unlikely without requiring a sorted checksum.

Reference parity: the reference has no audit surface (its tests assert
state equality by reading both sides whole, e.g. MariadbCdcListener
integration tests) — this is the scale-correct form of that assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_hash(keys: list[str], value_cols: list[str], salt: str):
    canon = F.to_json(F.struct(*[F.col(c) for c in keys + value_cols]))
    return F.xxhash64(F.lit(salt), canon)


def slice_digests(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    n_slices: int = 256,
) -> DataFrame:
    """Order-independent per-slice digest: (slice_id, n_rows, x1, x2).
    One shuffle keyed on slice_id, map-side combinable, O(n_slices) rows
    out regardless of input size."""
    sl = F.pmod(
        F.xxhash64(F.lit("audit_slice"), *[F.col(k) for k in keys]),
        F.lit(n_slices),
    ).alias("slice_id")
    return (
        df.select(
            sl,
            _row_hash(keys, value_cols, "a1").alias("h1"),
            _row_hash(keys, value_cols, "a2").alias("h2"),
        )
        .groupBy("slice_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h1)").alias("x1"),
            F.expr("bit_xor(h2)").alias("x2"),
        )
    )


def drift_slices(
    source: DataFrame,
    lake: DataFrame,
    keys: list[str],
    value_cols: list[str],
    n_slices: int = 256,
) -> list[int]:
    """Phase 1: the (bounded, O(n_slices)) list of key-space slices whose
    digests disagree — empty means the tables are identical on
    (keys + value_cols) with overwhelming probability, for the cost of two
    digest scans and no join."""
    s = slice_digests(source, keys, value_cols, n_slices)
    l = slice_digests(lake, keys, value_cols, n_slices)
    joined = s.alias("s").join(
        l.alias("l"), "slice_id", "full_outer"
    )
    diff = joined.where(
        ~(
            F.col("s.n_rows").eqNullSafe(F.col("l.n_rows"))
            & F.col("s.x1").eqNullSafe(F.col("l.x1"))
            & F.col("s.x2").eqNullSafe(F.col("l.x2"))
        )
    )
    return sorted(r["slice_id"] for r in diff.select("slice_id").collect())


def drift_report(
    source: DataFrame,
    lake: DataFrame,
    keys: list[str],
    value_cols: list[str],
    n_slices: int = 256,
) -> DataFrame:
    """Hierarchical drift audit: phase-1 slice digests, then a key-level
    full outer join RESTRICTED to the disagreeing slices. Returns one row
    per drifted key: keys..., drift_class in
      'missing'  — present in source, absent from the lake
      'extra'    — present in the lake, absent from source
      'modified' — present in both, value columns differ
    No drift → empty result with this schema and NO join executed."""
    spark = source.sparkSession
    bad = drift_slices(source, lake, keys, value_cols, n_slices)
    schema = ", ".join(
        [f"`{k}` {source.schema[k].dataType.simpleString()}" for k in keys]
        + ["drift_class string"]
    )
    if not bad:
        return spark.createDataFrame([], schema)

    sl = F.pmod(
        F.xxhash64(F.lit("audit_slice"), *[F.col(k) for k in keys]),
        F.lit(n_slices),
    )
    in_bad = sl.isin([int(b) for b in bad])
    s = source.where(in_bad).select(
        *keys, _row_hash(keys, value_cols, "a1").alias("sh")
    )
    t = lake.where(in_bad).select(
        *keys, _row_hash(keys, value_cols, "a1").alias("lh")
    )
    j = s.join(t, keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("lh").isNull(), F.lit("missing"))
        .when(F.col("sh").isNull(), F.lit("extra"))
        .otherwise(F.lit("modified"))
        .alias("drift_class"),
    ).where(
        F.col("sh").isNull()
        | F.col("lh").isNull()
        | (F.col("sh") != F.col("lh"))
    )


def repair_drift(
    source: DataFrame,
    table,
    value_cols: list[str] | None = None,
    n_slices: int = 256,
    stream_id: str = "repair",
) -> dict:
    """Close the audit loop (the pt-table-sync analog): make the lake match
    `source` by merging exactly the drifted keys — source values for
    'missing'/'modified', tombstones for 'extra'. Cost is the audit itself
    plus one merge of O(drifted keys); a clean table pays two digest scans
    and writes nothing.

    Position semantics: repaired rows are stamped at the table's committed
    LINEAGE position with the snapshot row_idx (bootstrap._SNAPSHOT_ROW_IDX)
    — the source read reflects everything the lake has applied, so the
    stamp must beat any already-applied (replayable) event yet LOSE to
    every future stream position; this is the same contract
    bootstrap_snapshot uses, so repair composes with a live tail exactly
    like a snapshot does. Raises if the table has no lineage (nothing to
    anchor the stamp to).

    Returns {"classes": {class: n}, "repaired": total, "version": v}.
    """
    from .bootstrap import _SNAPSHOT_ROW_IDX, snapshot_position

    meta = table.metadata()
    keys = meta["keys"]
    if value_cols is None:
        value_cols = [c for c in source.columns if c not in keys]
    lineage = table.lineage()
    if not lineage:
        raise ValueError(
            "repair_drift needs committed lineage to stamp repairs; "
            "apply at least one batch (or bootstrap) first"
        )
    file, pos = snapshot_position(lineage)

    lake = table.read().select(*keys, *value_cols)
    rep = drift_report(source, lake, keys, value_cols, n_slices).persist()
    classes = {
        r["drift_class"]: r["n"]
        for r in rep.groupBy("drift_class")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not classes:
        rep.unpersist()
        return {"classes": {}, "repaired": 0, "version": meta["version"]}

    image_entries: list = []
    for c in value_cols:
        image_entries.append(F.lit(c))
        image_entries.append(F.col(c).cast("string"))
    fix = rep.join(source, keys, "left").select(
        *keys,
        F.when(F.col("drift_class") == "extra", F.lit("DELETE"))
        .otherwise(F.lit("UPSERT"))
        .alias("final_op"),
        F.when(
            F.col("drift_class") == "extra",
            F.expr("map()").cast("map<string,string>"),
        )
        .otherwise(F.create_map(*image_entries))
        .alias("image"),
        F.lit(file).alias("last_file"),
        F.lit(int(pos)).cast("long").alias("last_pos"),
        F.lit(_SNAPSHOT_ROW_IDX).cast("int").alias("last_row_idx"),
        F.lit(1).cast("long").alias("n_changes"),
        (F.col("drift_class") != F.lit("extra")).alias("anchored"),
    )
    res = table.merge(fix, stream_id=stream_id)
    rep.unpersist()
    return {
        "classes": classes,
        "repaired": sum(classes.values()),
        "version": res.get("version"),
    }


def binlog_chain_audit(events: DataFrame, pattern: str = r"^.*\.(\d+)$") -> DataFrame:
    """Binlog file-chain completeness per server: an archive or relay
    that lost a whole file (rotation raced a prune, a relay crashed
    mid-ship) shows up as a numeric gap in the file sequence — invisible
    to position checkpoints, which only see the files that ARRIVED. The
    reference's reader follows ROTATE events forward and cannot notice a
    missing file either (BinLogReader tailing is push-based); this is
    the retrospective check an operator runs over an archive before
    trusting a replay.

    Per server: file count, first/last file number, missing-file mass
    (span arithmetic — no gap materialization) and the first missing
    number for targeted re-fetch. One tiny distinct + window over
    O(files) rows: the heavy stream collapses at the distinct, which is
    map-side combinable.
    """
    files = (
        events.select(
            "server_id",
            F.regexp_extract("binlog_file", pattern, 1)
            .cast("long")
            .alias("file_no"),
        )
        .where(F.col("file_no").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("server_id").orderBy("file_no")
    gaps = (
        files.withColumn("nxt", F.lead("file_no").over(w))
        .where(F.col("nxt") > F.col("file_no") + 1)
        .groupBy("server_id")
        .agg((F.min("file_no") + 1).alias("first_missing"))
    )
    base = files.groupBy("server_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.min("file_no").alias("first_file"),
        F.max("file_no").alias("last_file"),
    )
    return base.join(gaps, "server_id", "left").select(
        "server_id",
        "n_files",
        "first_file",
        "last_file",
        (F.col("last_file") - F.col("first_file") + 1 - F.col("n_files")).alias(
            "n_missing"
        ),
        "first_missing",
    )
