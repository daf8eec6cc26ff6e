"""Dependency-free media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but PNG and WAV are decodable with
the standard library alone (zlib / wave), so the "real decode" seam in
:mod:`multimodal` doesn't have to stay a stub for those types:

- :func:`png_encode` / :func:`png_decode` — 8-bit grayscale (color
  type 0) and RGB (color type 2), non-interlaced. The decoder
  implements all five scanline filters (None/Sub/Up/Average/Paeth), so
  it reads PNGs from real encoders, not just its own output.
- :func:`wav_encode` / :func:`wav_decode` — PCM via the stdlib
  ``wave`` module (8-bit unsigned / 16-bit signed).
- :func:`resize_nearest` — nearest-neighbor resample on the decoded
  pixel grid (what PIL's ``Image.resize(..., NEAREST)`` does).

video/mp4 has no stdlib decoder; that path remains a documented stub
in :mod:`multimodal`.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` interleaved
    samples per pixel) as a PNG. channels=1 → grayscale, 3 → RGB."""
    color_type = {1: 0, 3: 2}.get(channels)
    if color_type is None:
        raise ValueError(f"png_encode supports 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride]) for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a non-interlaced 8-bit grayscale/RGB PNG →
    (width, height, channels, pixels). Unfilters all five filter
    types, so output from any conforming encoder round-trips."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type} interlace={interlace}); "
                    "only 8-bit gray/RGB non-interlaced"
                )
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, out_w: int, out_h: int
) -> bytearray:
    """Nearest-neighbor resample of a decoded pixel grid."""
    out = bytearray(out_w * out_h * channels)
    for y in range(out_h):
        sy = (y * height) // out_h
        src_row = sy * width * channels
        dst_row = y * out_w * channels
        for x in range(out_w):
            sx = (x * width) // out_w
            for c in range(channels):
                out[dst_row + x * channels + c] = pixels[src_row + sx * channels + c]
    return out


def wav_encode(samples: list[int], sample_rate: int = 8000, sample_width: int = 1) -> bytes:
    """Encode PCM samples as WAV (sample_width 1 → 8-bit unsigned,
    2 → 16-bit signed little-endian), mono."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        if sample_width == 1:
            frames = bytes(s & 0xFF for s in samples)
        else:
            frames = b"".join(struct.pack("<h", s) for s in samples)
        w.writeframes(frames)
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a WAV → (sample_rate, sample_width, samples). Mono only
    (the shape the pipeline's audio features consume)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1:
            raise ValueError("only mono WAV supported")
        rate, width = w.getframerate(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        samples = list(frames)
    elif width == 2:
        samples = [s[0] for s in struct.iter_unpack("<h", frames)]
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return rate, width, samples
