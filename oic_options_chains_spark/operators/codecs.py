"""Dependency-free media codecs: PNG (stdlib zlib) and WAV PCM (struct).

These are the REAL kernels behind the ``fake=False`` seam in
``operators/multimodal.py``. The container ships no Pillow/libvips/
torchaudio, but a complete baseline PNG codec needs only ``zlib``
(DEFLATE) plus the five scanline filters, and RIFF/WAVE PCM is plain
struct parsing — so the decode path is honest working code, not a stub,
for the two formats the synthetic corpus carries. JPEG/GIF/video stay
behind ``NotImplementedError`` (an entropy decoder is a library, not a
function) and are routed around via ``sniff_format``.

Supported surface (rejects anything else with ValueError, so a caller
can quarantine rather than mis-decode):

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); no interlace, no palette. All five row filters (None/Sub/
  Up/Average/Paeth) on decode; encode writes filter 0. Chunk CRCs are
  VERIFIED on decode (a flipped bit fails loudly, not as noise pixels).
- WAV: canonical RIFF/WAVE with ``fmt `` + ``data`` chunks, PCM
  (format tag 1), 16-bit samples.

Everything is per-row Python executed INSIDE the Arrow-batched
``mapInPandas`` kernels of operators/multimodal.py — the plan-level
rules (no Python in relational operators) are untouched; this is the
contracted kernel tier, the same tier as the HTML parsers. Pixel work
uses numpy per scanline; the sequential filters (Average/Paeth) loop
per byte in Python, which is fine for kernel-sized images — swap in a
C codec at the same seam when throughput demands it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
# decode cap: 16M pixels (4096x4096). The inflate is bounded by the
# IHDR-declared payload, so this caps the allocation a crafted header
# can demand; kernel-tier images are orders of magnitude smaller.
_MAX_PIXELS = 1 << 24


def encode_png(pixels: np.ndarray) -> bytes:
    """Baseline PNG from an (h, w, c) or (h, w) uint8 array — filter 0
    rows, one zlib IDAT, CRC'd chunks. c in {1, 2, 3, 4} maps to gray /
    gray+alpha / RGB / RGBA."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> np.ndarray:
    """(h, w, c) uint8 pixels from a baseline PNG. Verifies chunk CRCs;
    raises ValueError on malformed/unsupported input (callers
    quarantine)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if len(ihdr) != 13:
        raise ValueError(f"malformed PNG IHDR ({len(ihdr)} bytes)")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} interlace={interlace})"
        )
    if w == 0 or h == 0:
        # the spec requires nonzero dimensions; an empty pixel array
        # would propagate NaN stats instead of quarantining
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    c = _CHANNELS[color_type]
    if w * h > _MAX_PIXELS:
        # IHDR-declared dimensions bound the inflate below; a bomb that
        # also lies about w*h must be rejected before allocating
        raise ValueError(f"PNG dimensions {w}x{h} exceed decode cap")
    stride = w * c
    expected = h * (stride + 1)
    # bounded inflate: a zlib bomb expands only to expected+1 bytes
    # (the +1 detects overrun) before being rejected as a ValueError,
    # so it quarantines instead of escaping as MemoryError
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != expected or not d.eof or d.unconsumed_tail:
        raise ValueError("PNG pixel payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = row
        elif f == 1:  # Sub: prefix sum per bpp lane — modular addition
            # is associative, so masking once at the end is exact
            cur = row.reshape(w, c).cumsum(axis=0).reshape(stride)
        elif f == 2:  # Up — same associativity argument
            cur = row + prev
        elif f in (3, 4):  # Average / Paeth: sequential left-dependency.
            # The left neighbor 'a' MUST be the reconstructed byte
            # (mod 256) — Average's >>1 and Paeth's abs() are nonlinear,
            # so an unmasked accumulator decodes silently-wrong pixels
            # (e.g. off by 128 whenever the previous byte wrapped).
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[x - c] if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = (cur & 0xFF).astype(np.uint8)
    return out.reshape(h, w, c)


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample of (h, w, c) uint8 —
    source index floor(i * src / dst), pure integer, no rounding mode
    ambiguity."""
    h, w = pixels.shape[:2]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return pixels[ys][:, xs]


def luma(pixels: np.ndarray) -> np.ndarray:
    """(h, w) int32 luma in 0..255: integer Rec.601 for color
    ((299R + 587G + 114B) // 1000), channel 0 for gray/gray+alpha."""
    c = pixels.shape[2]
    p = pixels.astype(np.int32)
    if c >= 3:
        return (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    return p[:, :, 0]


def image_stats(blob: bytes, feature_dims: int) -> tuple[int, int, float, list[float]]:
    """The real counterpart of multimodal._fake_image_stats: decode,
    integer luma, and a ``feature_dims``-cell mean-luma grid feature
    (the flattened luma split into contiguous cells — a deterministic
    fixed-width embedding stand-in)."""
    px = decode_png(blob)
    h, w = px.shape[:2]
    lm = luma(px).reshape(-1)
    mean_luma = float(lm.mean()) / 255.0
    cells = np.array_split(lm, feature_dims)
    feature = [float(cell.mean()) / 255.0 if len(cell) else 0.0 for cell in cells]
    return w, h, mean_luma, feature


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, samples int16 array) from a RIFF/WAVE
    PCM-16 blob; samples are interleaved as stored. ValueError on
    anything else."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        # struct.error is NOT a ValueError — an unguarded unpack here
        # would escape the kernels' quarantine catch and fail the job
        raise ValueError(f"malformed WAV fmt chunk ({len(fmt)} bytes)")
    tag_, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag_ != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={tag_} bits={bits})")
    samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    return rate, n_ch, samples


def wav_stats(blob: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_samples, peak_abs, mean_abs_e3): integer loudness
    stats for an ASR-prep quality gate — exact (scaled mean, no float)."""
    rate, n_ch, samples = decode_wav(blob)
    n = len(samples) // max(n_ch, 1)
    if len(samples) == 0:
        return rate, 0, 0, 0
    a = np.abs(samples.astype(np.int64))
    return rate, n, int(a.max()), int((1000 * a.sum()) // len(samples))
