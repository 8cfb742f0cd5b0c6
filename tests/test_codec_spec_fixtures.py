"""Byte-pinned EXTERNAL codec fixtures (round-6 advice): every other
JPEG/GIF test round-trips through this repo's own encoder, so a
mirrored encoder/decoder spec error (swapped chroma order, wrong
zigzag axis, bad level shift) would pass them all. These fixtures are
hand-assembled byte-by-byte from the published specs — ITU-T T.81
(Annex K Huffman tables, IDCT definition) and GIF89a (hand-packed LZW
codes) — with expected pixels derived from the spec math written
independently in this file, never from the repo's codec module. A
decoder that disagrees with the spec fails here even if its encoder
mirrors the same mistake.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oic_options_chains_spark.operators.codecs import decode_gif, decode_jpeg

# --- T.81 Annex K (Tables K.3/K.5): standard luminance Huffman specs ---
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canon_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: symbol -> (length, code)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


DC_CODE = _canon_codes(DC_BITS, DC_VALS)
AC_CODE = _canon_codes(AC_BITS, AC_VALS)


class _BitWriter:
    """MSB-first entropy bit packer with T.81 byte stuffing (0xFF->00)
    and 1-padding at flush — written here from the spec, independent of
    the codec module's writer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        while self.nbits:
            self.put(1, 1)
        return bytes(self.out)


def _put_dc(w: _BitWriter, diff: int) -> None:
    mag = abs(diff)
    cat = mag.bit_length()
    length, code = DC_CODE[cat]
    w.put(code, length)
    if cat:
        w.put(diff if diff > 0 else (diff - 1) & ((1 << cat) - 1), cat)


def _put_ac(w: _BitWriter, run: int, value: int) -> None:
    mag = abs(value)
    cat = mag.bit_length()
    length, code = AC_CODE[(run << 4) | cat]
    w.put(code, length)
    w.put(value if value > 0 else (value - 1) & ((1 << cat) - 1), cat)


def _put_eob(w: _BitWriter) -> None:
    length, code = AC_CODE[0x00]
    w.put(code, length)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc << 4 | th] + bits + vals))


def _jpeg(n_comp: int, entropy: bytes) -> bytes:
    """8x8 baseline JPEG container with an IDENTITY quant table (all
    ones), standard Annex K luminance tables for every component, and
    the given hand-packed entropy bytes."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(n_comp))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([n_comp]) + comps)
    scomps = b"".join(bytes([i + 1, 0x00]) for i in range(n_comp))
    sos = _seg(0xDA, bytes([n_comp]) + scomps + bytes([0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt
        + sof
        + _dht(0, 0, DC_BITS, DC_VALS)
        + _dht(1, 0, AC_BITS, AC_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )


def test_jpeg_flat_gray_fixture_decodes_to_128():
    """DC diff 0, all ACs zero: quantized block is all-zero, IDCT is
    flat zero, level shift (T.81 A.3.1) gives exactly 128 everywhere."""
    w = _BitWriter()
    _put_dc(w, 0)
    _put_eob(w)
    blob = _jpeg(1, w.flush())
    # the hand-packed entropy for this block is pinned: '00'+'1010'+pad
    assert blob[-3:] == bytes([0x2B, 0xFF, 0xD9])
    got = decode_jpeg(blob)
    assert got.shape == (8, 8, 1)
    assert np.all(got == 128)


def test_jpeg_dc_step_fixture_decodes_to_129():
    """DC diff +8 with an identity quant table: dequantized DC is 8,
    the DC-only IDCT is 8/8 = +1 (orthonormal scaling, T.81 A.3.3),
    so every pixel is exactly 129 — anchors DC magnitude-bit decoding
    and the IDCT DC gain against the spec."""
    w = _BitWriter()
    _put_dc(w, 8)
    _put_eob(w)
    got = decode_jpeg(_jpeg(1, w.flush()))
    assert np.all(got == 129)


def test_jpeg_zigzag_axis_fixture():
    """One AC coefficient at ZIGZAG INDEX 1 — per T.81 Figure A.6 the
    scan's first step moves RIGHT, so index 1 is the horizontal-
    frequency-1 coefficient: the decoded block must vary along x and be
    constant along y, with values matching the spec IDCT evaluated
    independently here. A transposed zigzag (the classic mirrored
    encoder+decoder bug) flips the variation axis and fails."""
    w = _BitWriter()
    _put_dc(w, 0)
    _put_ac(w, 0, 40)  # run 0, category 6, value +40
    _put_eob(w)
    got = decode_jpeg(_jpeg(1, w.flush()))[:, :, 0].astype(int)
    x = np.arange(8)
    c0, c1 = np.sqrt(1 / 2.0), 1.0
    row = 128 + 0.25 * c0 * c1 * 40 * np.cos((2 * x + 1) * 1 * np.pi / 16)
    expect = np.clip(np.rint(np.tile(row, (8, 1))), 0, 255).astype(int)
    assert np.array_equal(got, expect)
    # variation is along x only
    assert np.all(got[0] == got[7])
    assert got[0, 0] != got[0, 7]


def test_jpeg_chroma_order_fixture():
    """3-component interleaved MCU with Y diff 0, Cb diff +32, Cr diff
    -32: planes are flat 128/132/124, and the JFIF inverse matrix gives
    one exact RGB everywhere, computed here from the published
    coefficients. Swapped Cb/Cr decoding produces the complementary
    cast and fails."""
    w = _BitWriter()
    for diff in (0, 32, -32):  # Y, Cb, Cr block in MCU order
        _put_dc(w, diff)
        _put_eob(w)
    got = decode_jpeg(_jpeg(3, w.flush()))
    y, cb, cr = 128.0, 132.0, 124.0
    expect = np.rint(
        [
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ]
    ).astype(np.uint8)
    assert got.shape == (8, 8, 3)
    assert np.all(got == expect.reshape(1, 1, 3))
    # the qualitative anchor: +Cb/-Cr is a BLUE cast (B > R)
    assert expect[2] > expect[0]


def test_gif_hand_packed_lzw_fixture():
    """2x2 GIF89a assembled byte-by-byte: 2-entry palette {red, blue},
    LZW minimum code size 2 (clear=4, EOB=5), pixel indices 0,1,1,0
    packed BY HAND per the GIF89a spec's LSB-first sub-block format
    (with the code width bumping 3->4 bits when the dictionary reaches
    8 entries) into the pinned bytes 44 02 05. Anchors the LZW decoder, palette
    lookup, and row order to the spec independent of the repo's
    encoder."""
    blob = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)  # logical screen 2x2
        + bytes([0x80, 0, 0])  # GCT present, 2 entries; bg 0; no aspect
        + bytes([255, 0, 0, 0, 0, 255])  # palette: red, blue
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 2, 2)
        + bytes([0])  # no LCT, sequential
        + bytes([2])  # LZW min code size
        + bytes([3, 0x44, 0x02, 0x05])  # hand-packed codes 4,0,1,1,0,5
        + bytes([0])  # sub-block terminator
        + b"\x3b"
    )
    got = decode_gif(blob)
    expect = np.array(
        [[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert np.array_equal(got, expect)


def test_gif_fixture_corrupt_lzw_quarantines():
    """Flipping the hand-packed LZW data to reference an undefined
    dictionary code must raise ValueError (quarantine), not decode."""
    blob = bytearray(
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])
        + bytes([255, 0, 0, 0, 0, 255])
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 2, 2)
        + bytes([0, 2, 3, 0x44, 0x02, 0x05, 0])
        + b"\x3b"
    )
    blob[-5] = 0xFF  # entropy bytes now emit far-out-of-range codes
    with pytest.raises(ValueError):
        decode_gif(bytes(blob))
