"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata structs.

The decode/resize/frame-sample kernels are STUBBED (the container has no
image/audio libraries) behind deterministic fakes — clearly marked — but
the Spark-side contract is real and tested: schema, Arrow batch shape,
mapInPandas signatures, partition sizing. Swapping a real decoder in
changes only the marked function bodies.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real implementation would be PIL/turbojpeg decode.
    Raises so callers can't silently rely on it."""
    raise NotImplementedError("image decode requires an image library not in this container")


def _fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake feature vector (crc-seeded), standing in for a
    real encoder. Marked fake: values carry no semantics, but determinism
    lets the distributed plumbing be tested end to end."""
    if payload is None:
        return [0.0] * dim
    crc = zlib.crc32(payload)
    return [((crc >> (i % 32)) & 0xFF) / 255.0 for i in range(dim)]


def extract_media_features(media: DataFrame, batch_limit_bytes: int = 64 << 20) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves
    the bytes in bounded batches; at scale, repartition by media_id so
    each task holds ~batch_limit_bytes of payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        zlib.crc32(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": [_fake_features(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: expands each video into frame
    timestamps (the decode itself is stubbed). The explode is JVM-side;
    a real decoder plugs into a downstream mapInPandas."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((seed * 7 + i * 13 + j) % 256 for j in range((i % 50) + 10))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                (i % 10 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
