"""CDC-maintained derived index tables: keep a near-dup LSH index in
lockstep with its base lake table, incrementally.

The reference delivers row changes to a listener and stops there
(MariadbCdcListener.java:17-22); anything DERIVED from the table — an
index, a search structure — is the listener's problem, and the naive
answer (rebuild from the full table) is O(corpus) per batch. This module
closes the loop the lake-native way:

    base table merge  ->  LakeTable.changes(v0, v1)   (CDF changelog,
                          touched-buckets-only read, FINAL row images)
                      ->  lsh_index_delta             (signature ONLY the
                          changed docs; band rows as a folded change set)
                      ->  index_table.merge           (same MoR MERGE +
                          exactly-once (stream, batch) markers as any
                          CDC table)

so the index is itself a lake table: snapshot-versioned, concurrently
mergeable, replay-safe — and each batch costs O(changed docs), never
O(corpus). The changelog carries RESOLVED final images, so minimal-image
(binlog_row_image=minimal) update streams maintain the index correctly
even though their wire events never carried the text column.

The index rows are `functions.dedup.build_lsh_index` rows keyed
(base keys..., band): an UPSERT replaces all `bands` rows of a re-written
document (same keys, new bucket/signature), a DELETE removes them, which
is exactly MERGE semantics — no special-casing. `read_lsh_index` adapts
the table back to the (id, band, bucket, sig) shape
`functions.dedup.incremental_lsh_matches` probes against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import band_bucket_expr, minhash_signature

_SEP = "\x1f"


def lsh_index_schema(base_keys: list[str]) -> list[tuple[str, str]]:
    """Logical schema for the index lake table: base keys (string) +
    (band, bucket, sig). Create the table with keys = base_keys+['band']."""
    return [(k, "string") for k in base_keys] + [
        ("band", "int"),
        ("bucket", "string"),
        ("sig", "string"),
    ]


def lsh_index_delta(
    changelog: DataFrame,
    keys: list[str],
    text_col: str = "content",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    position: int = 0,
) -> DataFrame:
    """CDF changelog rows -> folded change set for the index table merge.

    insert/update_after rows are signatured (one MinHash pass over the
    CHANGED docs only) and become `bands` UPSERT rows each; delete rows
    become `bands` DELETE rows; update_before rows are dropped (the
    update_after of the same key replaces every band row). Output shape
    is the operators.fold contract (keys+band, final_op, image map,
    last_* ordering columns), directly mergeable by LakeTable.merge.
    """
    spark = changelog.sparkSession
    bands_df = spark.createDataFrame([(b,) for b in range(bands)], "band int")

    docs = changelog.where(
        F.col("change_type").isin("insert", "update_after")
    ).withColumn("_id", F.concat_ws(_SEP, *keys))
    sig = minhash_signature(
        docs.select("_id", text_col), text_col, n, num_hashes, id_col="_id"
    )
    # Band buckets + signature csv + key split-back all come from ONE
    # projection over the signature agg: a lsh_buckets-then-join shape would
    # recompute the shingle pipeline for each join branch (the signature is
    # the expensive side), and the keys are recoverable from the composite
    # _id, so no join back onto the changelog either. The bucket hash is the
    # SHARED band_bucket_expr, so this index stays probe-compatible with the
    # batch path by construction.
    def _bucket(b: int):
        return band_bucket_expr(b, num_hashes, bands)

    sig_csv = F.array_join(
        F.array(*[F.col(f"mh_{i}").cast("string") for i in range(num_hashes)]),
        ",",
    )
    exploded = sig.select(
        F.col("id").alias("_id"),
        sig_csv.alias("_sig_csv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    )
    key_parts = F.split(F.col("_id"), _SEP)
    ups = exploded.select(
        *[key_parts.getItem(i).alias(k) for i, k in enumerate(keys)],
        F.col("bb.band").alias("band"),
        F.lit("UPSERT").alias("final_op"),
        F.create_map(
            F.lit("bucket"), F.col("bb.bucket"), F.lit("sig"), F.col("_sig_csv")
        ).alias("image"),
    )
    dels = (
        changelog.where(F.col("change_type") == "delete")
        .select(*keys)
        .crossJoin(F.broadcast(bands_df))
        .select(
            *keys,
            "band",
            F.lit("DELETE").alias("final_op"),
            F.lit(None).cast("map<string,string>").alias("image"),
        )
    )
    out = ups.unionByName(dels)
    # Ordering columns for the merge contract. They must be MONOTONE
    # across maintenance hops: the index's MoR delta resolution picks the
    # latest row per key by (last_file, last_pos), so a later hop's
    # replacement of the same (keys, band) row must sort above the
    # earlier one — `position` (the base table's to_version) provides
    # that; within one hop the changelog is a net diff (one row per key),
    # so no finer ordering is needed.
    return (
        out.withColumn("last_file", F.lit("cdf"))
        .withColumn("last_pos", F.lit(int(position)).cast("long"))
        .withColumn("last_row_idx", F.lit(0).cast("long"))
        .withColumn("n_changes", F.lit(1).cast("long"))
    )


def maintain_lsh_index(
    index_table,
    base_table,
    from_version: int,
    to_version: int | None = None,
    text_col: str = "content",
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    stream_id: str = "lsh-index",
    batch_id: int | None = None,
) -> dict:
    """Advance the index across one base-table version hop. Exactly-once
    per (stream_id, batch_id) — a replayed maintenance call no-ops."""
    meta = base_table.metadata(to_version)
    keys = base_table.metadata()["keys"]
    delta = lsh_index_delta(
        base_table.changes(from_version, to_version),
        keys,
        text_col,
        n,
        num_hashes,
        bands,
        position=meta["version"],
    )
    return index_table.merge(delta, stream_id=stream_id, batch_id=batch_id)


def read_lsh_index(index_table, base_keys: list[str]) -> DataFrame:
    """Adapt the index table to the (id, band, bucket, sig array<long>)
    shape functions.dedup.incremental_lsh_matches probes against."""
    return index_table.read().select(
        F.concat_ws(_SEP, *base_keys).alias("id"),
        "band",
        "bucket",
        F.transform(F.split("sig", ","), lambda x: x.cast("long")).alias("sig"),
    )
