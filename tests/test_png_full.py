"""PNG decode coverage beyond 8-bit sequential: every spec bit depth
(1/2/4/8/16), palette at sub-byte depths, and Adam7 interlacing.

The fixtures are built by an independent test-side writer (filter-0
rows, hand-packed bits, per-pass Adam7 serialization) so the decoder
is checked against the spec's byte layout, not against its own
encoder.
"""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.codecs import (  # noqa: E402
    PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
)

_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """Big-endian bit-packing of one row's samples at ``depth`` bits."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = []
    for s in samples.ravel():
        bits.extend((int(s) >> b) & 1 for b in range(depth - 1, -1, -1))
    while len(bits) % 8:
        bits.append(0)
    return np.packbits(np.array(bits, np.uint8)).tobytes()


def _raw_png(samples: np.ndarray, depth: int, color_type: int,
             plte: bytes = b"", interlace: int = 0) -> bytes:
    """(h, w, channels) samples → PNG bytes, filter type 0 rows."""
    h, w = samples.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       interlace)
    lines = []
    if interlace == 0:
        for y in range(h):
            lines.append(b"\x00" + _pack_row(samples[y], depth))
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass: no scanlines at all
            for y in range(sub.shape[0]):
                lines.append(b"\x00" + _pack_row(sub[y], depth))
    idat = zlib.compress(b"".join(lines), 6)
    out = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def test_grey_sub_byte_depths_scale_to_full_range():
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        vals = np.arange(maxv + 1, dtype=np.uint8)
        img = np.tile(vals, (3, 2))[:, :, None]  # (3, 2*(maxv+1), 1)
        out = decode_png(_raw_png(img, depth, 0))
        expect = (img.astype(np.int64) * (255 // maxv)).astype(np.uint8)
        assert np.array_equal(out, expect), depth
        assert out.max() == 255 and out.min() == 0


def test_grey_16bit_reduces_to_high_byte():
    img16 = np.array([[0, 0x1234, 0xFFFF, 0xABCD]], np.uint16)[..., None]
    out = decode_png(_raw_png(img16, 16, 0))
    assert out.ravel().tolist() == [0x00, 0x12, 0xFF, 0xAB]


def test_rgb_and_rgba_16bit():
    rng = np.random.default_rng(0)
    img16 = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
    out = decode_png(_raw_png(img16, 16, 2))
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))
    img16a = rng.integers(0, 65536, (4, 3, 4), dtype=np.uint16)
    out = decode_png(_raw_png(img16a, 16, 6))
    assert np.array_equal(out, (img16a >> 8).astype(np.uint8))


def test_palette_at_every_depth():
    palette = np.array([[250, 10, 20], [0, 200, 30], [5, 6, 255],
                        [9, 8, 7]], np.uint8)
    for depth in (1, 2, 4, 8):
        n = min(1 << depth, 4)
        idx = (np.arange(24).reshape(4, 6) % n).astype(np.uint8)
        out = decode_png(_raw_png(idx[:, :, None], depth, 3,
                                  plte=palette.tobytes()))
        assert np.array_equal(out, palette[idx]), depth


def test_adam7_rgb_roundtrip_various_sizes():
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (3, 5), (7, 9), (8, 8), (16, 13), (9, 21)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = decode_png(_raw_png(img, 8, 2, interlace=1))
        assert np.array_equal(out, img), shape


def test_adam7_sub_byte_palette():
    palette = bytes(range(48))  # 16 entries
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 16, (11, 6), dtype=np.uint8)
    out = decode_png(_raw_png(idx[:, :, None], 4, 3, plte=palette,
                              interlace=1))
    plte = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    assert np.array_equal(out, plte[idx])


def test_sequential_8bit_path_unchanged():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    # the product encoder cycles all five filter types
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_invalid_depth_colortype_combos_rejected():
    img = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(_raw_png(img, 4, 2))     # RGB at depth 4
    idx = np.zeros((2, 2, 1), np.uint8)
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(_raw_png(idx, 16, 3))    # palette at depth 16


def test_truncated_idat_is_an_error():
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(_raw_png(img, 8, 2))
    # shrink the image claimed in IHDR? no — drop IDAT rows instead:
    # rebuild with one scanline missing
    short = zlib.compress((b"\x00" + bytes(12)) * 3, 6)  # 3 of 4 rows
    out = PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    out += _png_chunk(b"IDAT", short) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(out)
    del data
