"""Frame archive: events persisted AS their wire format (CRC-sealed v4
frames in parquet) and re-consumed — batch and through a real Structured
Streaming query — with corruption contained to the affected events."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mariadb_cdc_spark.gen import (
    MAIN_DATABASE,
    TYPED_LAKE_SCHEMA,
    TYPED_TABLE,
    generate_typed_events,
)
from mariadb_cdc_spark.operators.wire import (
    FRAME_ARCHIVE_SCHEMA,
    frame_events,
    frame_quarantine,
    framed_to_events,
    write_frame_archive,
)
from mariadb_cdc_spark.pipeline import CdcConfig, apply_batch
from mariadb_cdc_spark.sources.lake import LakeTable, _parse_type

SF = "/root/testdata/sf0.001"


def _typed_table(spark, path):
    schema = T.StructType(
        [T.StructField(n, _parse_type(s)) for n, s in TYPED_LAKE_SCHEMA]
    )
    return LakeTable.create(spark, path, schema, ["id"], n_buckets=8)


def _cfg():
    return CdcConfig(database=MAIN_DATABASE, table=TYPED_TABLE, keys=["id"])


def test_archive_roundtrip_and_layout(spark, tmp_path):
    events = generate_typed_events(spark, SF)
    arch = str(tmp_path / "archive")
    write_frame_archive(events, arch)
    # file layout prunes per binlog file
    assert os.path.isdir(os.path.join(arch, "binlog_file=typ.000001"))
    back = framed_to_events(spark.read.parquet(arch))
    assert back.count() == events.count()
    key = lambda df: df.select(  # noqa: E731
        "binlog_file", "binlog_pos", "event_type",
        F.to_json(F.struct("rows_before", "rows_after")).alias("img"),
    )
    assert key(events).exceptAll(key(back)).count() == 0
    assert frame_quarantine(spark.read.parquet(arch)).count() == 0


def test_corrupt_archive_streams_with_bounded_blast_radius(spark, tmp_path):
    """Corrupt the UPDATE frames of doc_id%7==0 in the archive, then
    replay it through a REAL streaming query: those docs keep their
    INSERT image, every other doc updates normally, and the quarantine
    rollup counts exactly the damaged frames."""
    events = generate_typed_events(spark, SF)
    framed = frame_events(events)
    doc_id = ((F.col("binlog_pos") - 64) / 256).cast("long")
    bad = (F.col("event_type") == "UPDATE_ROWS") & (doc_id % 7 == 0)
    byte = F.conv(F.substring("frame_hex", 41, 2), 16, 10).cast("int")
    flipped = F.lpad(F.lower(F.hex(byte.bitwiseXOR(F.lit(255)))), 2, "0")
    framed = framed.withColumn(
        "frame_hex",
        F.when(
            bad,
            F.concat(
                F.substring("frame_hex", 1, 40),
                flipped,
                F.expr("substring(frame_hex, 43)"),
            ),
        ).otherwise(F.col("frame_hex")),
    )
    arch = str(tmp_path / "archive")
    framed.select(
        "binlog_file", "binlog_pos", F.unhex("frame_hex").alias("frame")
    ).write.partitionBy("binlog_file").parquet(arch)

    # quarantine accounting over the damaged archive
    q = {
        (r.binlog_file, r.frame_status): r.n_events
        for r in frame_quarantine(spark.read.parquet(arch)).collect()
    }
    n_docs = events.where(F.col("event_type") == "WRITE_ROWS").count()
    exp_bad = sum(1 for d in range(n_docs) if d % 5 < 2 and d % 7 == 0)
    assert q == {("typ.000002", "crc_mismatch"): exp_bad}

    # stream the archive into the lake
    from mariadb_cdc_spark.streaming.stream import start_cdc_stream

    table = _typed_table(spark, str(tmp_path / "lake"))
    stream = spark.readStream.schema(FRAME_ARCHIVE_SCHEMA).parquet(arch)
    query = start_cdc_stream(
        framed_to_events(stream, observe_gate=True),
        table,
        _cfg(),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    query.awaitTermination(120)

    # streaming-mode drop accounting: the frame_gate observation rides each
    # epoch's StreamingQueryProgress — its total must equal the batch
    # quarantine rollup (no second scan, no state)
    import json as _json

    n_quarantined = 0
    for p in query.recentProgress:
        d = p if isinstance(p, dict) else _json.loads(p.json)
        om = (d.get("observedMetrics") or {}).get("frame_gate")
        if om:  # Row (live progress) or dict (json-parsed) — [] works for both
            n_quarantined += int(om["n_quarantined"])
    assert n_quarantined == exp_bad

    got = {r.id: r.price for r in table.read().select("id", "price").collect()}
    assert len(got) == n_docs
    for d in range(n_docs):
        if d % 5 < 2 and d % 7 != 0:  # update survived
            exp = (d * 104729) % 10**8
        else:  # never updated, or update frame corrupted -> insert image
            exp = (d * 7919) % 10**8
        assert int(got[d] * 10**4) == exp, d


def test_archive_state_equals_direct_apply(spark, tmp_path):
    events = generate_typed_events(spark, SF)
    arch = str(tmp_path / "archive")
    write_frame_archive(events, arch)

    t_direct = _typed_table(spark, str(tmp_path / "direct"))
    apply_batch(events, t_direct, _cfg(), stream_id="d", batch_id=0)
    t_arch = _typed_table(spark, str(tmp_path / "via_archive"))
    apply_batch(
        framed_to_events(spark.read.parquet(arch)),
        t_arch,
        _cfg(),
        stream_id="a",
        batch_id=0,
    )
    a = t_direct.read().withColumn("price", F.col("price").cast("string"))
    b = t_arch.read().withColumn("price", F.col("price").cast("string"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
