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
- :func:`mp4_encode` / :func:`mp4_decode` — ISO BMFF (MP4) container
  mux/demux: a real box-tree walker that reads the sample tables
  (stsc/stsz/stco) and slices the actual stored samples out of mdat.
  Frame *sampling* is container-level work (what ffmpeg's demuxer
  does before any codec runs), so this makes the video seam real for
  the operator we ship (per-frame extraction). Bitstream decode of
  compressed codecs (H.264 etc.) inside the samples is NOT attempted
  — samples are returned as stored; the synthetic pipeline stores raw
  8-bit grayscale frames, so their statistics are honest.
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


# ---------------------------------------------------------------------------
# ISO BMFF (MP4) container mux/demux
# ---------------------------------------------------------------------------

_MP4_TIMESCALE = 1000
_MP4_FRAME_DUR = 100  # 10 fps
_BMFF_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full_box(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + body)


def mp4_encode(frames: list[bytes], width: int, height: int) -> bytes:
    """Mux raw video samples into a minimal but structurally valid ISO
    BMFF file: ftyp + mdat (the concatenated samples) + moov whose
    sample tables (stts/stsc/stsz/stco) index every frame. Any
    conforming demuxer can get the frames back; :func:`mp4_decode` is
    the stdlib one."""
    if not frames:
        raise ValueError("mp4_encode needs at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2")
    mdat = _box(b"mdat", b"".join(frames))
    duration = len(frames) * _MP4_FRAME_DUR

    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, _MP4_TIMESCALE, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)  # identity
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        3,  # enabled | in movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full_box(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, _MP4_TIMESCALE, duration, 0x55C4, 0)
    )
    hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00")
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    # 'raw ' visual sample entry: uncompressed — honest about the
    # samples being stored as-is (8-bit grayscale rows)
    sample_entry = _box(
        b"raw ",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 0x0018, -1),
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, len(frames), _MP4_FRAME_DUR))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1))
    stsz = _full_box(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, len(frames)) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, len(ftyp) + 8))  # first mdat byte
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _bmff_boxes(data: bytes, start: int, end: int):
    """Yield (tag, body_start, box_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed BMFF box {tag!r} at {pos}")
        yield tag, body, pos + size
        pos += size


def _bmff_find(data: bytes, path: list[bytes], start: int, end: int) -> tuple[int, int]:
    tag, rest = path[0], path[1:]
    for t, body, box_end in _bmff_boxes(data, start, end):
        if t == tag:
            return (body, box_end) if not rest else _bmff_find(data, rest, body, box_end)
    raise ValueError(f"BMFF box {b'/'.join(path).decode()} not found")


def mp4_decode(data: bytes) -> tuple[int, int, list[bytes]]:
    """Demux an ISO BMFF file → (width, height, samples). Reads the
    real sample tables: stsc maps samples to chunks, stco (or co64 for
    64-bit offsets) locates each chunk, stsz sizes each sample — the
    general algorithm, not an echo of :func:`mp4_encode`'s
    single-chunk layout. The VIDEO trak is selected by its hdlr
    handler type ('vide'), so files with a leading audio trak demux
    correctly rather than silently returning audio samples. Samples
    are returned as stored (no bitstream decode)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp)")
    moov_s, moov_e = _bmff_find(data, [b"moov"], 0, len(data))
    video_trak: tuple[int, int] | None = None
    for t, trak_s, trak_e in _bmff_boxes(data, moov_s, moov_e):
        if t != b"trak":
            continue
        try:
            hdlr_s, _ = _bmff_find(data, [b"mdia", b"hdlr"], trak_s, trak_e)
        except ValueError:
            continue
        # hdlr full box body: version/flags(4) + pre_defined(4) + handler_type(4)
        if data[hdlr_s + 8 : hdlr_s + 12] == b"vide":
            video_trak = (trak_s, trak_e)
            break
    if video_trak is None:
        raise ValueError("no video trak (hdlr 'vide') in BMFF file")
    trak_s, trak_e = video_trak
    stbl_s, stbl_e = _bmff_find(data, [b"mdia", b"minf", b"stbl"], trak_s, trak_e)
    _tkhd_s, tkhd_e = _bmff_find(data, [b"tkhd"], trak_s, trak_e)
    # width/height are the last 8 bytes of tkhd in both versions, 16.16
    width = struct.unpack(">I", data[tkhd_e - 8 : tkhd_e - 4])[0] >> 16
    height = struct.unpack(">I", data[tkhd_e - 4 : tkhd_e])[0] >> 16

    tables: dict[bytes, tuple[int, int]] = {}
    for t, body, box_end in _bmff_boxes(data, stbl_s, stbl_e):
        tables[t] = (body, box_end)

    def u32s(tag: bytes, skip: int, n: int, stride: int = 4) -> list[int]:
        body, _ = tables[tag]
        base = body + 4 + skip  # 4 = version/flags
        return [struct.unpack(">I", data[base + i * stride : base + i * stride + 4])[0] for i in range(n)]

    if b"stsz" not in tables or b"stsc" not in tables or (
        b"stco" not in tables and b"co64" not in tables
    ):
        raise ValueError("BMFF sample tables incomplete (need stsz/stsc/stco|co64)")
    stsz_body, _ = tables[b"stsz"]
    fixed_size, n_samples = struct.unpack(">II", data[stsz_body + 4 : stsz_body + 12])
    sizes = (
        [fixed_size] * n_samples if fixed_size else u32s(b"stsz", 8, n_samples)
    )
    if b"stco" in tables:
        (n_chunks,) = struct.unpack(">I", data[tables[b"stco"][0] + 4 : tables[b"stco"][0] + 8])
        chunk_offsets = u32s(b"stco", 4, n_chunks)
    else:  # co64: 64-bit chunk offsets (files > 4 GiB)
        co64_body, _ = tables[b"co64"]
        (n_chunks,) = struct.unpack(">I", data[co64_body + 4 : co64_body + 8])
        base = co64_body + 8
        chunk_offsets = [
            struct.unpack(">Q", data[base + i * 8 : base + i * 8 + 8])[0] for i in range(n_chunks)
        ]
    (n_stsc,) = struct.unpack(">I", data[tables[b"stsc"][0] + 4 : tables[b"stsc"][0] + 8])
    stsc_flat = u32s(b"stsc", 4, n_stsc * 3)
    stsc_entries = [tuple(stsc_flat[i * 3 : i * 3 + 3]) for i in range(n_stsc)]

    # expand stsc's run-length chunk map to per-chunk sample counts
    per_chunk: list[int] = []
    for i, (first_chunk, spc, _sdi) in enumerate(stsc_entries):
        last = stsc_entries[i + 1][0] - 1 if i + 1 < len(stsc_entries) else n_chunks
        per_chunk.extend([spc] * (last - first_chunk + 1))

    samples: list[bytes] = []
    si = 0
    for chunk_i, offset in enumerate(chunk_offsets):
        pos = offset
        for _ in range(per_chunk[chunk_i] if chunk_i < len(per_chunk) else 0):
            if si >= n_samples:
                break
            if pos + sizes[si] > len(data):
                # a clamped slice would silently return short/empty
                # frames while the coverage check still passes
                raise ValueError(
                    f"BMFF sample {si} at {pos}+{sizes[si]} exceeds file size {len(data)}"
                )
            samples.append(bytes(data[pos : pos + sizes[si]]))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(f"BMFF chunk map covered {si} of {n_samples} samples")
    return width, height, samples


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
