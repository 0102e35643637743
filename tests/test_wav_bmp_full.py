"""WAV beyond 8/16-bit PCM (24/32-bit, IEEE float, EXTENSIBLE) and
BMP beyond truecolor (paletted 1/4/8-bit, RLE8) — the long tail of
real-world files the media seam meets.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.codecs import (  # noqa: E402
    decode_bmp,
    decode_wav,
)


def _wav(fmt_tag: int, bits: int, data: bytes, rate: int = 8000,
         channels: int = 1, extensible: bool = False) -> bytes:
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: cbSize=22, valid bits, mask, GUID
        guid = struct.pack("<H", fmt_tag) + b"\x00\x00" \
            + bytes([0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
                     0x00, 0x38, 0x9B, 0x71])
        fmt = struct.pack("<HHIIHHH", 0xFFFE, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits, 22)
        fmt += struct.pack("<HI", bits, 0) + guid
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                          rate * channels * bits // 8,
                          channels * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_wav_24bit_pcm():
    vals = [-8388608, -1, 0, 1, 8388607]
    data = b"".join((v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    pcm, rate = decode_wav(_wav(1, 24, data))
    assert rate == 8000
    np.testing.assert_allclose(
        pcm, np.array(vals, np.float64) / 8388608.0, atol=1e-7)


def test_wav_32bit_pcm():
    vals = np.array([-2**31, -1, 0, 2**31 - 1], "<i4")
    pcm, _ = decode_wav(_wav(1, 32, vals.tobytes()))
    np.testing.assert_allclose(pcm, vals / 2147483648.0, atol=1e-7)


def test_wav_float32_and_float64():
    f = np.array([-1.0, -0.25, 0.0, 0.5, 1.0], "<f4")
    pcm, _ = decode_wav(_wav(3, 32, f.tobytes()))
    np.testing.assert_array_equal(pcm, f)
    d = f.astype("<f8")
    pcm, _ = decode_wav(_wav(3, 64, d.tobytes()))
    np.testing.assert_array_equal(pcm, f)
    # out-of-range float samples clip rather than escape [-1, 1]
    hot = np.array([-3.0, 2.5], "<f4")
    pcm, _ = decode_wav(_wav(3, 32, hot.tobytes()))
    assert pcm.tolist() == [-1.0, 1.0]


def test_wav_extensible_resolves_subformat():
    f = np.array([0.25, -0.5], "<f4")
    pcm, _ = decode_wav(_wav(3, 32, f.tobytes(), extensible=True))
    np.testing.assert_array_equal(pcm, f)
    vals = np.array([1000, -1000], "<i2")
    pcm, _ = decode_wav(_wav(1, 16, vals.tobytes(), extensible=True))
    np.testing.assert_allclose(pcm, vals / 32768.0)


def test_wav_unknown_format_still_raises():
    with pytest.raises(NotImplementedError, match="format"):
        decode_wav(_wav(2, 16, b"\x00\x00"))  # ADPCM


# --- BMP -------------------------------------------------------------------

def _bmp(w: int, h: int, bpp: int, palette: list, pixel_bytes: bytes,
         compression: int = 0, top_down: bool = False,
         clr_used: int = 0) -> bytes:
    table = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    offset = 14 + 40 + len(table)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1,
                      bpp, compression, len(pixel_bytes), 2835, 2835,
                      clr_used, 0)
    head = struct.pack("<2sIHHI", b"BM", offset + len(pixel_bytes),
                       0, 0, offset)
    return head + dib + table + pixel_bytes


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


def test_bmp_8bit_paletted():
    idx = np.array([[0, 1, 2], [3, 0, 1]], np.uint8)
    rows = b"".join(idx[y].tobytes() + b"\x00" for y in (1, 0))  # pad 4
    out = decode_bmp(_bmp(3, 2, 8, PAL, rows))
    expect = np.array(PAL, np.uint8)[idx]
    np.testing.assert_array_equal(out, expect)


def test_bmp_8bit_top_down():
    idx = np.array([[0, 1, 2], [3, 0, 1]], np.uint8)
    rows = b"".join(idx[y].tobytes() + b"\x00" for y in (0, 1))
    out = decode_bmp(_bmp(3, 2, 8, PAL, rows, top_down=True))
    np.testing.assert_array_equal(out, np.array(PAL, np.uint8)[idx])


def test_bmp_4bit_and_1bit():
    idx = np.array([[0, 1, 2, 3, 1]], np.uint8)
    packed = bytes([0x01, 0x23, 0x10]) + b"\x00"       # 4bpp, pad to 4
    out = decode_bmp(_bmp(5, 1, 4, PAL, packed))
    np.testing.assert_array_equal(out[0], np.array(PAL, np.uint8)[idx[0]])
    mono = [(0, 0, 0), (255, 255, 255)]
    bits = np.array([[1, 0, 1, 1, 0]], np.uint8)
    packed = bytes([0b10110000]) + b"\x00\x00\x00"
    out = decode_bmp(_bmp(5, 1, 1, mono, packed))
    np.testing.assert_array_equal(
        out[0], np.array(mono, np.uint8)[bits[0]])


def test_bmp_clr_used_truncates_palette():
    idx = np.array([[0, 1]], np.uint8)
    rows = idx.tobytes() + b"\x00\x00"
    out = decode_bmp(_bmp(2, 1, 8, PAL[:2], rows, clr_used=2))
    np.testing.assert_array_equal(out[0], np.array(PAL[:2], np.uint8))


def test_bmp_rle8_runs_absolute_delta():
    # 6x3 image: row0 = run of 3 zeros + absolute run of 3 (spec:
    # absolute counts are >= 3, 0/1/2 are escapes, odd counts pad to
    # a word); row1 = delta(2,0) then a width-clipped run; row2 = run
    rle = bytes([
        3, 0,                 # run: 3 × palette[0]
        0, 3, 1, 2, 1, 0,     # absolute: pixels 1, 2, 1 (+pad byte)
        0, 0,                 # EOL → row 1
        0, 2, 2, 0,           # delta: x += 2
        6, 3,                 # run: 6 × palette[3] (clips at w=6)
        0, 0,                 # EOL → row 2
        6, 1,                 # run: full row of palette[1]
        0, 1,                 # EOD
    ])
    out = decode_bmp(_bmp(6, 3, 8, PAL, rle, compression=1))
    pal = np.array(PAL, np.uint8)
    # BMP rows are bottom-up: decoded row 0 is the BOTTOM row
    np.testing.assert_array_equal(out[2], pal[[0, 0, 0, 1, 2, 1]])
    np.testing.assert_array_equal(out[1], pal[[0, 0, 3, 3, 3, 3]])
    np.testing.assert_array_equal(out[0], pal[[1] * 6])


def test_bmp_rle4_still_raises():
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(_bmp(2, 1, 4, PAL, b"\x00\x00", compression=2))
