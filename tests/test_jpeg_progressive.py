"""Progressive JPEG (SOF2): spectral selection + successive
approximation, EOB runs, restart markers.

The strong check: the progressive encoder carries EXACTLY the same
quantized coefficients as the baseline path, so
``decode(encode(img, progressive=True))`` must be bit-identical to
``decode(encode(img))`` — any drift in the scan split, the point
transforms, the EOB-run bookkeeping, or the refinement correction
bits shows up as a pixel diff.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.jpeg import (  # noqa: E402
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    idct2,
    quant_tables,
)


def _img(seed: int, shape) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=shape, dtype=np.uint8)
    # low-pass blend: structured content exercises EOB runs; pure
    # noise exercises dense AC bands — mix both halves
    smooth = (base.astype(np.int64) // 3 + 80).astype(np.uint8)
    out = base.copy()
    out[: shape[0] // 2] = smooth[: shape[0] // 2]
    return out


CASES = [
    ((24, 32, 3), {}),
    ((17, 23, 3), {}),                       # non-multiple-of-8 dims
    ((16, 16), {}),                          # greyscale
    ((8, 8, 3), {}),                         # single MCU
    ((33, 41, 3), {"subsampling": "420"}),   # padded Y block grid
    ((64, 48, 3), {"restart_interval": 3}),
    ((40, 56, 3), {"subsampling": "420", "restart_interval": 2}),
]


@pytest.mark.parametrize("shape,kw", CASES)
@pytest.mark.parametrize("quality", [60, 85, 95])
def test_progressive_decodes_identical_to_baseline(shape, kw, quality):
    img = _img(hash((shape, quality)) & 0xFFFF, shape)
    base = decode_jpeg(encode_jpeg(img, quality=quality, **kw))
    prog = decode_jpeg(
        encode_jpeg(img, quality=quality, progressive=True, **kw))
    assert np.array_equal(base, prog)


def test_randomized_sweep():
    for seed in range(12):
        shape = ((seed % 5) * 7 + 9, (seed % 3) * 11 + 10, 3)
        img = _img(seed, shape)
        base = decode_jpeg(encode_jpeg(img, quality=75))
        prog = decode_jpeg(encode_jpeg(img, quality=75,
                                       progressive=True))
        assert np.array_equal(base, prog), f"seed {seed}"


def test_refinement_zrl_long_zero_run():
    # craft a block whose only AC coefficient quantizes to ±1 deep in
    # the zigzag (k≈40): invisible to the AC-first scan (1 >> Al = 0),
    # newly significant in the refinement scan after a >16-zero run —
    # the ZRL-in-refinement path
    luma_q, _ = quant_tables(85)
    coef = np.zeros(64)
    kq = 40
    coef[_ZZ[kq]] = float(luma_q.ravel()[_ZZ[kq]])  # quantizes to 1
    block = np.clip(np.round(idct2(coef.reshape(8, 8)) + 128.0),
                    0, 255).astype(np.uint8)
    img = np.tile(block, (2, 3))
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_jpeg(img, quality=85, progressive=True))
    assert np.array_equal(base, prog)
    # and the coefficient actually survived the trip (non-flat output)
    assert base[..., 0].std() > 0.5


def test_marker_structure():
    img = _img(3, (24, 24, 3))
    data = encode_jpeg(img, progressive=True)
    assert b"\xff\xc2" in data          # SOF2
    assert b"\xff\xc0" not in data      # no baseline SOF
    # scan script: DC first + 3 AC first + 3 AC refine + DC refine
    assert data.count(b"\xff\xda") == 8


def test_greyscale_scan_count():
    img = _img(4, (24, 24))
    data = encode_jpeg(img, progressive=True)
    assert data.count(b"\xff\xda") == 4  # DC, AC, AC refine, DC refine


def test_progressive_restart_markers_present():
    img = _img(5, (64, 64, 3))
    data = encode_jpeg(img, progressive=True, restart_interval=2)
    assert b"\xff\xdd" in data
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


def test_undefined_ac_table_is_a_clear_error():
    img = _img(6, (16, 16, 3))
    data = bytearray(encode_jpeg(img, progressive=True))
    # strip every DHT segment: decoder must name the problem
    out = bytearray()
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == 0xC4:
            ln = int.from_bytes(data[i + 2:i + 4], "big")
            i += 2 + ln
            continue
        out.append(data[i])
        i += 1
    out.append(data[-1])
    with pytest.raises(ValueError, match="undefined"):
        decode_jpeg(bytes(out))


def test_interleaved_ac_scan_rejected():
    img = _img(7, (16, 16, 3))
    data = bytearray(encode_jpeg(img, progressive=True))
    # find the first single-component SOS (the AC-first scan) and
    # rewrite its header to claim 2 components — spec violation
    i = 0
    seen = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            seen += 1
            if seen == 2:                      # first AC scan
                ns_at = i + 4
                assert data[ns_at] == 1
                # 2 comps: reuse the same comp entry twice, then the
                # Ss/Se/AhAl triple shifts — rebuild the segment
                comp = bytes(data[ns_at + 1:ns_at + 3])
                tail = bytes(data[ns_at + 3:ns_at + 6])
                seg = bytes([2]) + comp + bytes([2, comp[1]]) + tail
                ln = len(seg) + 2
                data[i + 2:i + 4] = ln.to_bytes(2, "big")
                data[ns_at:ns_at + 6] = seg
                break
        i += 1
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg(bytes(data))


def test_media_seam_accepts_progressive():
    # the decode_media dispatcher must now decode progressive bytes
    # instead of routing them out of scope
    from credit_ocr_system_spark.kernel.codecs import decode_image_rgb
    img = _img(8, (24, 32, 3))
    data = encode_jpeg(img, quality=90, progressive=True)
    out = decode_image_rgb(data)
    assert out.shape == (24, 32, 3)
