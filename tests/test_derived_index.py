"""CDC-maintained LSH index (operators.derived): the index lake table
tracks its base table across merge batches via the CDF changelog, at
O(changed docs) per batch, and always equals a from-scratch rebuild."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.functions.dedup import build_lsh_index
from mariadb_cdc_spark.gen import MERGE_KEYS, generate_events, repo_table
from mariadb_cdc_spark.operators.derived import (
    lsh_index_schema,
    maintain_lsh_index,
    read_lsh_index,
)
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.lake import LakeTable, _parse_type

REPO_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType())
        for c in ["repo", "path", "commit", "lang", "content"]
    ]
)


def _split_by_wave(events, repo_count, max_wave_b0, n_buckets=32):
    cap = repo_count + 2
    slot = F.split("gtid", "-").getItem(2).cast("long")
    wave = F.floor(slot / (n_buckets * cap))
    b0 = events.where(F.col("gtid").isNull() | (wave <= max_wave_b0))
    b1 = events.where(F.col("gtid").isNull() | (wave > max_wave_b0))
    return b0, b1


def _index_table(spark, path):
    schema = T.StructType(
        [T.StructField(n, _parse_type(s)) for n, s in lsh_index_schema(MERGE_KEYS)]
    )
    return LakeTable.create(
        spark, path, schema, MERGE_KEYS + ["band"], n_buckets=8
    )


def _as_set(df):
    return {
        (r.id, r.band, r.bucket, ",".join(str(x) for x in r.sig))
        for r in df.collect()
    }


def test_index_tracks_base_through_updates_and_deletes(spark, sf_dir, tmp_path):
    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    b0, b1 = _split_by_wave(events, repo.count(), max_wave_b0=0)

    base = LakeTable.create(
        spark, str(tmp_path / "docs"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    idx = _index_table(spark, str(tmp_path / "idx"))
    cfg = CdcConfig()

    v_created = base.metadata()["version"]
    v0 = apply_batch(b0, base, cfg, stream_id="d", batch_id=0)["version"]
    maintain_lsh_index(idx, base, v_created, v0, batch_id=0)

    # after batch 0 the index must equal a rebuild of the wave-0 state
    def rebuild():
        docs = base.read().select(
            F.concat_ws("\x1f", *MERGE_KEYS).alias("_id"), "content"
        )
        ix = build_lsh_index(docs, text_col="content", id_col="_id")
        return {
            (r.id, r.band, r.bucket, ",".join(str(x) for x in r.sig))
            for r in ix.collect()
        }

    assert _as_set(read_lsh_index(idx, MERGE_KEYS)) == rebuild()

    # batch 1: updates + deletes + resurrects flow through the changelog
    v1 = apply_batch(b1, base, cfg, stream_id="d", batch_id=1)["version"]
    maintain_lsh_index(idx, base, v0, v1, batch_id=1)
    final = rebuild()
    assert _as_set(read_lsh_index(idx, MERGE_KEYS)) == final
    # deletes really removed rows: index key-count == 4 * live docs
    assert len(final) == 4 * base.read().count()

    # replayed maintenance (same batch marker) is a no-op
    v_idx = idx.metadata()["version"]
    maintain_lsh_index(idx, base, v0, v1, batch_id=1)
    assert idx.metadata()["version"] == v_idx


def test_maintained_index_is_probeable(spark, sf_dir, tmp_path):
    """The maintained index feeds incremental_lsh_matches directly: new
    near-dup docs arriving later match against it."""
    from mariadb_cdc_spark.functions.dedup import incremental_lsh_matches

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False)
    base = LakeTable.create(
        spark, str(tmp_path / "docs"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    idx = _index_table(spark, str(tmp_path / "idx"))
    v_created = base.metadata()["version"]
    v0 = apply_batch(events, base, CdcConfig(), stream_id="d", batch_id=0)[
        "version"
    ]
    maintain_lsh_index(idx, base, v_created, v0, batch_id=0)

    # probe batch: exact copies of 5 existing docs under new ids
    probe = (
        base.read()
        .orderBy("repo", "path")
        .limit(5)
        .select(
            F.concat_ws("\x1f", F.lit("arrived"), "repo", "path").alias("doc_id"),
            F.col("content").alias("text"),
        )
    )
    got = incremental_lsh_matches(
        probe, read_lsh_index(idx, MERGE_KEYS), threshold=0.5
    )
    rows = got.collect()
    by_new = {}
    for r in rows:
        by_new.setdefault(r.new_id, set()).add(r.old_id)
    # every probe doc finds its source (est_jaccard 1.0 for a verbatim copy)
    srcs = {
        "arrived\x1f" + r.repo + "\x1f" + r.path: r.repo + "\x1f" + r.path
        for r in base.read().orderBy("repo", "path").limit(5).collect()
    }
    for new_id, src in srcs.items():
        assert src in by_new.get(new_id, set())
    assert all(r.est_jaccard >= 0.5 for r in rows)


def test_streaming_epochs_maintain_index(spark, sf_dir, tmp_path):
    """Real Structured Streaming loop: each applied epoch advances the
    index from that epoch's version hop via the lifecycle on_batch hook —
    the production wiring of maintain_lsh_index."""
    from mariadb_cdc_spark.streaming.stream import (
        CdcLifecycleListener,
        start_cdc_stream,
    )

    repo = repo_table(spark, sf_dir)
    events = generate_events(repo, include_audit=False).cache()
    b0, b1 = _split_by_wave(events, repo.count(), max_wave_b0=0)
    src = str(tmp_path / "src")
    b0.coalesce(1).write.parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    base = LakeTable.create(
        spark, str(tmp_path / "docs"), REPO_SCHEMA, MERGE_KEYS, n_buckets=8
    )
    idx = _index_table(spark, str(tmp_path / "idx"))

    class IndexMaintainer(CdcLifecycleListener):
        def __init__(self):
            self.prev_version = base.metadata()["version"]

        def on_batch(self, epoch, metrics):
            v = metrics.get("version")
            if v is None or v == self.prev_version:
                return
            maintain_lsh_index(
                idx, base, self.prev_version, v, batch_id=epoch
            )
            self.prev_version = v

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_cdc_stream(
        stream,
        base,
        CdcConfig(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lifecycle=IndexMaintainer(),
    )
    q.awaitTermination(180)

    docs = base.read().select(
        F.concat_ws("\x1f", *MERGE_KEYS).alias("_id"), "content"
    )
    want = {
        (r.id, r.band, r.bucket, ",".join(str(x) for x in r.sig))
        for r in build_lsh_index(docs, text_col="content", id_col="_id").collect()
    }
    assert _as_set(read_lsh_index(idx, MERGE_KEYS)) == want and want
