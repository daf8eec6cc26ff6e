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
