"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
functions via ``mapInPandas``.

The container has no media libraries, so the *decode* step is stubbed
two ways (clearly marked): ``raise`` mode raises NotImplementedError;
``fake`` mode produces a deterministic feature vector from the raw
bytes (a 16-bin byte histogram), so the Spark-side plumbing — schema,
batch shape, partitioning — is fully real and testable. Swapping in a
real decoder (PIL/librosa/av) changes only ``_decode_real``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media column: (doc_id, media_type, payload binary).
    In a real pipeline `payload` is the raw image/audio bytes."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_real(payload: bytes, media_type: str) -> list[float]:
    # STUB: real implementation would decode via PIL/librosa/av and
    # resize/frame-sample/feature-extract. Media libs are not available
    # in this environment.
    raise NotImplementedError(
        f"media decode for {media_type} requires an image/audio library; "
        "use mode='fake' for the deterministic plumbing path"
    )


def _decode_fake(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake feature extractor: normalized 16-bin byte
    histogram. Stands in for decode→resize→embed."""
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    return [round(h / total, 6) for h in hist]


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps the batch shape explicit (pandas DataFrames of
    Arrow record batches) — the pattern a real decoder plugs into. The
    output schema is fixed (FEATURE_SCHEMA) regardless of decoder.
    """
    decode = _decode_fake if mode == "fake" else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "features": [
                        decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _resize_fake(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: resamples
    the byte stream to width*height bytes by nearest-neighbor index
    mapping (the real implementation swaps in PIL Image.resize). An
    empty payload yields a zero-filled frame — the output is ALWAYS
    width*height bytes (the fixed-shape contract downstream tensor
    consumers rely on)."""
    target = width * height
    if not payload:
        return bytes(target)
    n = len(payload)
    return bytes(payload[(i * n) // target] for i in range(target))


def resize_images(media: DataFrame, width: int, height: int, mode: str = "fake") -> DataFrame:
    """Resize the image payloads (pass-through for non-images), batch
    at a time over Arrow. Output keeps the binary column plus the new
    typed dimensions — the downstream contract a training pipeline
    reads (fixed-shape tensors)."""
    if mode != "fake":  # pragma: no cover - no media libs in container
        raise NotImplementedError("real resize requires PIL; use mode='fake'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"].str.startswith("image/")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [width if i else -1 for i in is_img],
                    "height": [height if i else -1 for i in is_img],
                    "payload": [
                        _resize_fake(p, width, height) if i else p
                        for p, i in zip(pdf["payload"], is_img)
                    ],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each video payload
    — one OUTPUT ROW PER FRAME (the exploding-cardinality shape real
    frame samplers have; mapInPandas lets one input row yield many).
    Fake decoder: frame i = the frame_bytes slice starting at the
    i-th equal division of the payload (real impl: av/ffmpeg keyframe
    extraction — not available in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if not str(mt).startswith("video/") or not payload:  # None or empty
                    continue
                n = len(payload)
                for i in range(n_frames):
                    start = (i * n) // n_frames
                    rows.append((doc_id, i, bytes(payload[start : start + frame_bytes])))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(run, FRAME_SCHEMA)
