"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codec step is STUBBED (no
image/audio libraries in this container): ``decode_images`` raises
NotImplementedError unless a deterministic fake decoder is requested —
but the Spark-side plumbing (schema, batch shape, partitioning, UDF
signatures) is real and tested, so swapping in PIL/ffmpeg later is a
one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha16", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synth_media(spark, n: int = 64, feature_dim: int = 8) -> DataFrame:
    """Deterministic fake media table.

    The payload is the ASCII hex digest of sha256("media/<i>") repeated
    4× (256 bytes) — arbitrary enough to exercise the binary-column
    plumbing, but ASCII so an external SQL oracle (DuckDB sha256 is
    VARCHAR-only) can recompute the content hash independently.
    """
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media/{i}".encode()).hexdigest().encode() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 16 if kind == "image" else None,
                48 + i % 16 if kind == "image" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes → fixed-dim float
    feature via chunked byte means. Replace with PIL/torchvision/ffmpeg."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame, feature_dim: int = 8, decoder="fake"
) -> DataFrame:
    """Decode + featurize each payload in Arrow batches.

    ``decoder`` is the codec injection seam: pass a CALLABLE
    ``(payload: bytes, dim: int) -> sequence[float]`` to plug in a real
    codec (PIL/torchvision/ffmpeg) with zero operator changes — the
    callable ships to executors in the UDF closure, everything else
    (schema, Arrow batching, partitioning) is unchanged. The string
    forms: ``'fake'`` = the deterministic stand-in, ``'real'`` = the
    stubbed built-in integration point (no codec libraries in this
    container).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg) are not available in this container; "
            "use decoder='fake' or inject a callable (payload, dim) -> features"
        )
    decode = _fake_decode if decoder == "fake" else decoder
    if not callable(decode):
        raise ValueError(f"decoder must be 'fake', 'real' or a callable; got {decoder!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                list(map(float, decode(bytes(p), feature_dim)))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha16": pdf["payload"].map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()[:16]
                    ),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (native
    sequence/explode; the decode of each frame would live in
    extract_features)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: ``sha256(orig || "WxH")``-seeded
    bytes of length width*height//64."""
    n_out = max(width * height // 64, 16)
    seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    reps = (n_out + len(seed) - 1) // len(seed)
    return (seed * reps)[:n_out]


def resize_images(
    media: DataFrame, width: int, height: int, decoder="fake"
) -> DataFrame:
    """Resize every image payload to (width, height) — Arrow-batched
    ``mapInPandas``, one decode+resize+encode per payload inside the
    batch loop.

    ``decoder`` is the codec injection seam: pass a CALLABLE
    ``(payload: bytes, width: int, height: int) -> bytes`` to plug in a
    real PIL/opencv resize with zero operator changes (the callable
    rides the UDF closure). ``'fake'`` = the deterministic stand-in,
    ``'real'`` = the stubbed built-in integration point (no image
    libraries in this container); batch shape, schema and partition
    behavior are real and tested either way."""
    if decoder == "real":
        raise NotImplementedError(
            "real image resize (PIL) is not available in this container; "
            "use decoder='fake' or inject a callable (payload, w, h) -> bytes"
        )
    resize = _fake_resize if decoder == "fake" else decoder
    if not callable(resize):
        raise ValueError(f"decoder must be 'fake', 'real' or a callable; got {decoder!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(resize(bytes(p), width, height)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "payload": out,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=RESIZED_SCHEMA)
    )
