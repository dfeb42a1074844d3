"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata structs.

The decode/resize/frame-sample kernels are STUBBED (the container has no
image/audio libraries) behind deterministic fakes — clearly marked — but
the Spark-side contract is real and tested: schema, Arrow batch shape,
mapInPandas signatures, partition sizing. Swapping a real decoder in
changes only the marked function bodies.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

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
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real PIXEL decode would be PIL/turbojpeg (not in this
    container). Raises so callers can't silently rely on it. Header-level
    dimension parsing is REAL — see parse_image_dimensions."""
    raise NotImplementedError("image decode requires an image library not in this container")


def parse_image_dimensions(payload: Optional[bytes]) -> Optional[tuple[int, int]]:
    """(width, height) from the container header — stdlib-only, real (not
    a stub): PNG IHDR, GIF87a/89a logical screen, JPEG SOFn segment scan.
    None for anything unrecognized, truncated, or non-image."""
    if not payload or len(payload) < 10:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return (w, h)
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn frame
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            # SOF0..SOF15 carry dimensions, except DHT/JPG/DAC (C4/C8/CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return (w, h)
            if marker == 0xDA:  # start of scan — dims must precede it
                return None
            i += 2 + seg_len
        return None
    return None


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A structurally complete deterministic RGB PNG (IHDR + zlib IDAT +
    IEND), stdlib-only — gives the synthetic media table REAL image
    payloads so the dimension parser is exercised end to end."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + y * 31 + x) % 256 for x in range(3 * width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


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
            dims = [parse_image_dimensions(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "checksum": [
                        zlib.crc32(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "width": pd.array(
                        [d[0] if d else None for d in dims], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] if d else None for d in dims], dtype="Int32"
                    ),
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


def synthetic_media_row(i: int, seed: int = 42):
    """One deterministic synthetic media row: (kind, payload, width,
    height). Image rows carry REAL PNG bytes (dimensions derived from i)
    so the header parser round-trips; audio/video stay opaque byte
    formulas (the parser must return None on them). Shared by the table
    generator and the driver oracle so both recompute the same bytes."""
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h = 16 + (i % 23), 16 + ((i * 3) % 17)
        return kind, make_png(w, h, seed=seed + i), w, h
    payload = bytes((seed * 7 + i * 13 + j) % 256 for j in range((i % 50) + 10))
    return kind, payload, None, None


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        kind, payload, w, h = synthetic_media_row(i, seed)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                w,
                h,
                (i % 10 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
