"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side machinery (schemas, partition-friendly layout, Arrow-batched
UDF signatures, deterministic batch shapes) is real and tested; the actual
media decode is STUBBED behind ``_decode_image_stub`` (the codec libraries
are not in this container) — swap one function to go live.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (seed-42 payload bytes) for tests."""
    rows = []
    rs = np.random.RandomState(42)
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rs.bytes(128 + (i % 5) * 64)
        rows.append(
            (i, kind, f"application/x-fake-{kind}", bytearray(payload),
             64 if kind == "image" else None,
             48 if kind == "image" else None,
             1000 * (i % 7) if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: stands in for a real image decode (PIL/libvips not in this
    container). Deterministic fake: bytes → uint8 array reshaped to a fixed
    8x8 'thumbnail'. Replace with a real decoder to go live; the Spark
    plumbing around it is unchanged."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Real parts: byte-level stats (size, entropy) computed vectorized; the
    'embedding' is the stub decode's mean-pooled rows (deterministic fake,
    correct shape array<float>). Demonstrates the exact batch shape a real
    CLIP/whisper stage would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                counts = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8), minlength=256
                )
                p = counts[counts > 0] / max(len(payload), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(payload) else 0.0
                thumb = _decode_image_stub(payload)
                feat = (thumb.mean(axis=1) / 255.0).astype(np.float32).tolist()
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_bytes": len(payload),
                        "byte_entropy": round(entropy, 6),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),
    ]
)


def resize_thumbnails(
    media: DataFrame, out_w: int = 4, out_h: int = 4, src: int = 8
) -> DataFrame:
    """Resize stage over stub-decoded thumbnails: nearest-neighbor
    downsample of the ``src×src`` decode to ``out_h×out_w`` via a single
    vectorized index gather per batch (``np.ix_`` over precomputed row/col
    maps — a real PIL/vips resize drops into the same slot). Output one
    flattened pixel row per image; deterministic, so the m2 oracle can
    recompute the exact gathered byte positions in SQL."""
    ys = (np.arange(out_h) * src) // out_h
    xs = (np.arange(out_w) * src) // out_w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, px = [], []
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                thumb = _decode_image_stub(payload)
                px.append(thumb[np.ix_(ys, xs)].ravel().astype(np.int32))
                ids.append(row.media_id)
            yield pd.DataFrame({"media_id": ids, "pixels": px})

    return media.select("media_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (pure built-ins — sequence + explode; the decode of each
    frame would plug into extract_features)."""
    vids = media.where(F.col("kind") == "video").where(F.col("duration_ms") > 0)
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
