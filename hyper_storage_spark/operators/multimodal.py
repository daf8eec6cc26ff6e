"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
functions via ``mapInPandas``.

The *decode* seam has three modes:

- ``real`` — stdlib codecs (:mod:`media_codecs`): PNG (zlib inflate +
  scanline unfilter) and WAV (PCM) decode to actual pixel/sample
  grids; video/mp4 demuxes the ISO BMFF sample tables and returns the
  actual stored samples (frame extraction is container-level work —
  bitstream decode of compressed codecs inside the samples is not
  attempted; swapping in av/ffmpeg changes only ``_intensities`` /
  ``sample_frames``).
- ``fake`` — deterministic byte-histogram stand-in (no decode at
  all), kept for plumbing tests and as the fallback.
- ``auto`` (default) — real where the payload is recognized (PNG
  signature, WAV type, BMFF ftyp), fake otherwise: the default
  documented path never raises.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import media_codecs

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("n_samples", T.LongType()),
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


# deterministic synthetic media: uniform intensity doc_id % 256 so an
# ANSI-SQL oracle can predict the decoded pixel/sample statistics
_IMG_W, _IMG_H = 12, 9
_WAV_SAMPLES = 120
_VID_W, _VID_H, _VID_FRAMES = 8, 6, 6


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:  # noqa: ARG001 — text_col kept for API stability; payloads derive from doc_id
    """Media column with REAL payloads: images are actual PNGs
    (12×9 grayscale, every pixel = doc_id % 256), audio is actual WAV
    (8-bit PCM, 120 samples = doc_id % 256), video is an actual ISO
    BMFF mp4 (6 raw 8×6 grayscale frames, every byte = doc_id % 256).
    Generated executor-side over Arrow batches — the driver never
    touches a payload."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) % 256
                if doc_id % 3 == 0:
                    types.append("image/png")
                    payloads.append(
                        media_codecs.png_encode(bytes([g]) * (_IMG_W * _IMG_H), _IMG_W, _IMG_H)
                    )
                elif doc_id % 3 == 1:
                    types.append("audio/wav")
                    payloads.append(media_codecs.wav_encode([g] * _WAV_SAMPLES))
                else:
                    types.append("video/mp4")
                    payloads.append(
                        media_codecs.mp4_encode(
                            [bytes([g]) * (_VID_W * _VID_H)] * _VID_FRAMES, _VID_W, _VID_H
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": types, "payload": payloads}
            )

    schema = "doc_id long, media_type string, payload binary"
    # only doc_id crosses Arrow: payloads derive from the id alone, and
    # shipping the full text column would be pure serialization waste
    return docs.select("doc_id").mapInPandas(gen, schema)


def _intensities(payload: bytes, media_type: str) -> list[int]:
    """REAL decode → 0-255 intensity samples (pixels for images, PCM
    samples for audio, raw-frame bytes for demuxed video). Raises
    NotImplementedError for media types with no codec at all."""
    if media_type == "image/png":
        _w, _h, _c, px = media_codecs.png_decode(bytes(payload))
        return list(px)
    if media_type == "audio/wav":
        _rate, width, samples = media_codecs.wav_decode(bytes(payload))
        if width == 1:
            return samples
        return [(s + 32768) >> 8 for s in samples]
    if media_type == "video/mp4":
        # container demux: real samples out of mdat; honest only for
        # uncompressed frames (what the synthetic pipeline stores) —
        # compressed-codec bitstreams need av/ffmpeg plugged in here
        _w, _h, frames = media_codecs.mp4_decode(bytes(payload))
        return [b for f in frames for b in f]
    raise NotImplementedError(
        f"no stdlib decoder for {media_type}; plug av/ffmpeg into _decode_real "
        "or use mode='fake'/'auto'"
    )


def _hist_features(vals) -> list[float]:
    """Normalized FEATURE_DIM-bin intensity histogram — the ONE
    definition of the real feature vector (review r12: _row_features
    previously inlined a copy that could drift from this one)."""
    hist = [0] * FEATURE_DIM
    for v in vals:
        hist[v // FEATURE_DIM] += 1
    total = max(len(vals), 1)
    return [round(h / total, 6) for h in hist]


def _decode_real(payload: bytes, media_type: str) -> list[float]:
    """Real feature extraction: decode to intensities, normalized
    16-bin intensity histogram (bin = value // 16)."""
    return _hist_features(_intensities(payload, media_type))


def _decode_fake(payload: bytes, media_type: str) -> list[float]:
    """Deterministic fake feature extractor: normalized 16-bin byte
    histogram over the RAW bytes (no decode). Stands in for
    decode→resize→embed where no codec exists."""
    hist = [0] * FEATURE_DIM
    for b in payload:
        hist[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    return [round(h / total, 6) for h in hist]


def _decodable(payload: bytes, media_type: str) -> bool:
    """Payload sniff for auto mode: real decode only where the bytes
    actually carry the container the type claims."""
    head = bytes(payload[:12])
    if media_type == "image/png":
        return head[:8] == b"\x89PNG\r\n\x1a\n"
    if media_type == "audio/wav":
        return head[:4] == b"RIFF" and head[8:12] == b"WAVE"
    if media_type == "video/mp4":
        return head[4:8] == b"ftyp"
    return False


def _row_features(payload, media_type: str, mode: str) -> tuple[int, int, list[float]]:
    """(byte_len, n_samples, features) for ONE row, decoding at most
    once. ``auto`` honors its documented never-raises contract: a NULL
    payload and a corrupt-but-correctly-signatured payload (truncated
    download with a valid PNG/RIFF/ftyp head — the sniff cannot see
    past the header) both fall back to the fake byte-histogram path;
    ``real`` mode propagates decoder errors (explicit opt-in)."""
    if payload is None:
        return 0, 0, _decode_fake(b"", media_type)
    p = bytes(payload)
    if mode == "real" or (mode == "auto" and _decodable(p, media_type)):
        try:
            vals = _intensities(p, media_type)
        except Exception:
            if mode == "real":
                raise
            vals = None
        if vals is not None:
            return len(p), len(vals), _hist_features(vals)
    return len(p), len(p), _decode_fake(p, media_type)


def extract_features(media: DataFrame, mode: str = "auto") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps the batch shape explicit (pandas DataFrames of
    Arrow record batches). The output schema is fixed (FEATURE_SCHEMA)
    regardless of decoder; ``n_samples`` is the decoded sample count
    (pixels/PCM samples) in real mode, raw byte count in fake mode.
    """
    if mode not in ("real", "fake", "auto"):
        raise ValueError(f"mode must be real|fake|auto, got {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _row_features(p, m, mode)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pd.Series([r[0] for r in rows], dtype="int64"),
                    "n_samples": [r[1] for r in rows],
                    "features": [r[2] for r in rows],
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


def _resize_real(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize: PNG decode → nearest-neighbor resample on
    the pixel grid → PNG re-encode (what PIL's NEAREST resize does,
    via the stdlib codec)."""
    w, h, c, px = media_codecs.png_decode(bytes(payload))
    out = media_codecs.resize_nearest(px, w, h, c, width, height)
    return media_codecs.png_encode(bytes(out), width, height, c)


def resize_images(media: DataFrame, width: int, height: int, mode: str = "auto") -> DataFrame:
    """Resize the image payloads (pass-through for non-images), batch
    at a time over Arrow. Output keeps the binary column plus the new
    typed dimensions — the downstream contract a training pipeline
    reads (fixed-shape tensors).

    ``real`` decodes/re-encodes actual PNGs; ``fake`` resamples the
    raw byte stream (no decode); ``auto`` (default) goes real for
    payloads with a PNG signature and fake otherwise, so the default
    path never raises on undecodable bytes."""
    if mode not in ("real", "fake", "auto"):
        raise ValueError(f"mode must be real|fake|auto, got {mode!r}")

    def one(payload, is_img: bool):
        if not is_img:
            return payload
        if payload is None:
            return _resize_fake(b"", width, height)  # fixed-shape contract holds
        if mode == "real" or (
            mode == "auto" and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n"
        ):
            try:
                return _resize_real(payload, width, height)
            except Exception:
                if mode == "real":
                    raise
                # auto: corrupt-but-signatured falls back, never raises
        return _resize_fake(payload, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # na=False: .str.startswith returns NaN for a NULL
            # media_type and NaN is truthy (review r12) — a typeless
            # row must take the documented non-image pass-through with
            # -1 sentinels, not be resized as an image
            is_img = pdf["media_type"].str.startswith("image/", na=False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [width if i else -1 for i in is_img],
                    "height": [height if i else -1 for i in is_img],
                    "payload": [one(p, i) for p, i in zip(pdf["payload"], is_img)],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("img_w", T.IntegerType()),
        T.StructField("img_h", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each image/png payload and report its REAL pixel-grid
    statistics (dims, pixel count, mean intensity); non-images get
    -1 sentinels. This is the round-trip proof for the real codec
    path: stats come from decoding the bytes, not from metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if str(mt) == "image/png":
                    w, h, c, px = media_codecs.png_decode(bytes(payload))
                    rows.append((doc_id, mt, w, h, len(px), sum(px) / max(len(px), 1)))
                else:
                    rows.append((doc_id, mt, -1, -1, -1, -1.0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "img_w", "img_h", "n_px", "mean_px"]
            )

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """DSP features from REAL WAV decode: RMS energy of the signal
    normalized to [-1, 1] (8-bit PCM is unsigned: (s - 128) / 128)
    and zero-crossing rate (sign changes / (n - 1), zeros counted as
    positive). Non-audio rows get -1 sentinels. Arrow-batched numpy
    per payload — the feature math is vectorized, never per-sample
    Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows = []
        for pdf in batches:
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if str(mt) != "audio/wav":
                    rows.append((doc_id, mt, -1, -1.0, -1.0))
                    continue
                _rate, width, samples = media_codecs.wav_decode(bytes(payload))
                x = np.asarray(samples, dtype=np.float64)
                if width == 1:
                    x = (x - 128.0) / 128.0
                else:
                    x = x / 32768.0
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                sign = np.where(x >= 0, 1, -1)
                zcr = (
                    float(np.count_nonzero(sign[1:] != sign[:-1]) / (len(x) - 1))
                    if len(x) > 1
                    else 0.0
                )
                rows.append((doc_id, mt, len(x), rms, zcr))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "n_samples", "rms", "zcr"]
            )
            rows = []

    return media.mapInPandas(run, AUDIO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 64, mode: str = "auto"
) -> DataFrame:
    """Sample ``n_frames`` evenly-spaced frames from each video payload
    — one OUTPUT ROW PER FRAME (the exploding-cardinality shape real
    frame samplers have; mapInPandas lets one input row yield many).

    ``real``: demux the ISO BMFF sample tables and return the ACTUAL
    stored samples, evenly spaced over the container's sample list
    (what ffmpeg's demuxer-level frame extraction does; ``frame_bytes``
    is ignored — real frames keep their stored size). ``fake``: frame
    i = the frame_bytes slice at the i-th equal division of the raw
    payload. ``auto`` (default): real for BMFF payloads (ftyp sniff),
    fake otherwise."""
    if mode not in ("real", "fake", "auto"):
        raise ValueError(f"mode must be real|fake|auto, got {mode!r}")

    def one(doc_id, payload: bytes) -> list[tuple]:
        if mode == "real" or (mode == "auto" and _decodable(payload, "video/mp4")):
            _w, _h, samples = media_codecs.mp4_decode(bytes(payload))
            take = min(n_frames, len(samples))
            picked = [samples[(i * len(samples)) // take] for i in range(take)]
            return [(doc_id, i, f) for i, f in enumerate(picked)]
        n = len(payload)
        return [
            (doc_id, i, bytes(payload[(i * n) // n_frames : (i * n) // n_frames + frame_bytes]))
            for i in range(n_frames)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if not str(mt).startswith("video/") or not payload:  # None or empty
                    continue
                rows.extend(one(doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return media.mapInPandas(run, FRAME_SCHEMA)


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("l1_change", T.DoubleType()),
        T.StructField("is_scene_change", T.BooleanType()),
    ]
)


def scene_changes(media: DataFrame, threshold: float = 16.0) -> DataFrame:
    """Scene-change detection over video payloads: demux each mp4's
    frames (the REAL BMFF sample tables via media_codecs) and score
    every consecutive frame pair by mean absolute per-pixel byte
    difference — one output row per pair (doc_id, frame_idx of the
    LATER frame, l1_change, is_scene_change = l1 > ``threshold``).
    The classic shot-boundary heuristic (frame-difference
    thresholding), here as the temporal-analysis composition on top
    of the container plumbing: frame-sample → pairwise diff → flag.
    The curation use: per-video cut density is a liveliness/quality
    signal, and detected boundaries are where a keyframe sampler
    should sample.

    Determinism: integer byte sums, ONE IEEE division per pair
    (sum/n_pixels), threshold compare. Mismatched frame sizes within
    a video compare over the common prefix (real codecs can emit
    variable sizes; the synthetic ones never do). Non-video /
    undecodable payloads yield no rows.

    Scale shape: mapInPandas Arrow batches, one row in → (frames−1)
    rows out; all byte work executor-side, nothing but the flagged
    table leaves the stage."""
    if threshold < 0:
        raise ValueError(f"scene_changes: threshold must be >= 0, got {threshold}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if not str(mt).startswith("video/") or not payload:
                    continue
                if not _decodable(payload, "video/mp4"):
                    continue
                import numpy as np

                _w, _h, frames = media_codecs.mp4_decode(bytes(payload))
                for i in range(1, len(frames)):
                    a, b = frames[i - 1], frames[i]
                    n = min(len(a), len(b))
                    if n == 0:
                        continue
                    # vectorized (review r12): the per-byte Python
                    # generator ran the interpreter once per pixel per
                    # pair — ~1M iterations per real-size frame pair.
                    # int16 before subtracting: uint8 difference wraps.
                    av = np.frombuffer(bytes(a[:n]), dtype=np.uint8).astype(np.int16)
                    bv = np.frombuffer(bytes(b[:n]), dtype=np.uint8).astype(np.int16)
                    total = int(np.abs(av - bv).sum())
                    l1 = total / n
                    rows.append((doc_id, i, l1, l1 > threshold))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "l1_change", "is_scene_change"]
            )

    return media.mapInPandas(run, SCENE_SCHEMA)
