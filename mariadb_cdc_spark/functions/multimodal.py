"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side architecture is real and tested — schema, partition-preserving
mapInPandas with Arrow batches, deterministic fake featurizers — while the
actual codec calls are STUBS (the image/audio libraries are not in this
container). Swap `_decode_image_stub` for PIL/torchvision etc. on a real
cluster; nothing else changes.

Design rules for 100 TB of binary payloads:
  - binary stays opaque in Spark (no per-row Python objects crossing the
    boundary except inside Arrow batches);
  - metadata (width/height/codec/duration) lives in typed sibling columns so
    filters prune on parquet statistics WITHOUT touching bytes;
  - featurize via mapInPandas (per-partition batch iterator) — one Python
    worker per partition, Arrow transfer, no shuffle introduced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("payload_sha", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents (payload = utf-8 text
    bytes) — exercises the binary-column path end to end."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.col("n_chars") % 640 + 1).cast("int")).alias(
            "width"
        ),
        F.when(kind == "image", (F.col("n_chars") % 480 + 1).cast("int")).alias(
            "height"
        ),
        F.when(kind != "image", (F.col("n_chars") * 10).cast("int")).alias(
            "duration_ms"
        ),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _decode_image_stub(payload: bytes) -> "object":
    """STUB: real impl would be PIL.Image.open(io.BytesIO(payload)).
    Raises to make accidental use in this container explicit."""
    raise NotImplementedError(
        "image codec not available in this container; "
        "replace with PIL/torchvision decode on a real cluster"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: sha256 bytes -> dim floats in
    [0, 1). Keeps the Arrow batch shape identical to a real embedder."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def featurize(media: DataFrame, dim: int = 8) -> DataFrame:
    """Batch featurization over the binary column via mapInPandas.

    Partition-preserving: no shuffle; each Arrow batch is processed
    vectorized in one Python call. The stub featurizer stands where a
    decode+model-forward would run.
    """

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int32"),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return media.mapInPandas(_fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to extract.

    The decode itself is stubbed; the plan (explode of timestamps, the shape
    a distributed frame extractor consumes) is real and declarative.
    """
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
