"""Baseline JPEG codec tests (kernel/jpeg.py).

The codec's design rule is "no memorized spec constants are
load-bearing": zigzag is generated, huffman tables travel in DHT,
quant tables travel in DQT. These tests pin the parts that make the
emitted stream self-describing — a decoder that reads ONLY the bytes
must reconstruct the image — plus the edge paths (huffman length cap,
odd sizes, greyscale, out-of-scope rejection).
"""

import struct

import numpy as np
import pytest

from credit_ocr_system_spark.kernel.jpeg import (
    _BitReader,
    _BitWriter,
    _canonical,
    _code_lengths,
    _codebook_from_dht,
    decode_jpeg,
    dct2,
    encode_jpeg,
    idct2,
    quant_tables,
    zigzag_order,
)


def _rng_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c) if c else (h, w)).astype(np.uint8)


def _smooth_img(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 3) % 256,
                     ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# generated transform plumbing
# ---------------------------------------------------------------------------

def test_zigzag_is_a_permutation_with_correct_endpoints():
    zz = zigzag_order()
    assert sorted(zz.tolist()) == list(range(64))
    assert zz[0] == 0                     # DC first
    assert zz[1] == 1                     # (0,1) — even diagonal runs up
    assert zz[2] == 8                     # (1,0)
    assert zz[-1] == 63                   # last coefficient

def test_dct_is_orthonormal_and_invertible():
    rng = np.random.default_rng(3)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(idct2(dct2(b)), b, atol=1e-10)
    # Parseval: orthonormal basis preserves energy
    assert np.isclose((dct2(b) ** 2).sum(), (b ** 2).sum())


def test_quant_tables_monotone_in_quality():
    lo_l, lo_c = quant_tables(20)
    hi_l, hi_c = quant_tables(95)
    assert (hi_l <= lo_l).all() and (hi_c <= lo_c).all()
    for t in (lo_l, lo_c, hi_l, hi_c):
        assert t.min() >= 1 and t.max() <= 255


# ---------------------------------------------------------------------------
# bit I/O + huffman derivation
# ---------------------------------------------------------------------------

def test_bit_roundtrip_with_ff_stuffing():
    w = _BitWriter()
    vals = [(0xFF, 8), (0b101, 3), (0xFFFF, 16), (0, 1), (0x3F, 6)]
    for v, n in vals:
        w.write(v, n)
    data = w.flush()
    assert b"\xff\x00" in data            # stuffing actually happened
    r = _BitReader(data)
    for v, n in vals:
        assert r.read_bits(n) == v


def test_code_lengths_cap_and_allones_reservation():
    # Fibonacci frequencies maximize huffman depth: 40 symbols would
    # give ~40-bit codes uncapped — the cap must clamp to 16 while
    # keeping the Kraft inequality (decodability) intact.
    fib = [1, 1]
    for _ in range(38):
        fib.append(fib[-1] + fib[-2])
    lengths = _code_lengths({i: f for i, f in enumerate(fib)})
    real = {s: l for s, l in lengths.items() if s != 256}
    assert max(real.values()) <= 16
    assert sum(2.0 ** -l for l in lengths.values()) <= 1.0 + 1e-12
    # dummy symbol sits at max depth → canonical all-ones lands on it
    assert lengths[256] == max(lengths.values())
    bits, huffval, codebook = _canonical(lengths)
    assert 256 not in codebook and 256 not in huffval
    for sym, (code, l) in codebook.items():
        assert code != (1 << l) - 1       # spec: no real all-ones code


def test_canonical_roundtrips_through_dht_payload():
    freqs = {0: 100, 1: 60, 5: 30, 17: 10, 240: 3, 255: 1}
    bits, huffval, codebook = _canonical(_code_lengths(freqs))
    decoded = _codebook_from_dht(bits, huffval)
    # the two-level LUT must decode every encoder code back to its
    # symbol with the right consumed length, for any suffix bits
    for s, (c, l) in codebook.items():
        for suffix in (0, (1 << (16 - l)) - 1):
            v16 = (c << (16 - l)) | suffix
            hit = decoded[v16 >> 8]
            if isinstance(hit, list):
                hit = hit[v16 & 0xFF]
            assert hit == (s, l)
    # prefix-free: no code is a prefix of a longer one
    codes = sorted(codebook.values(), key=lambda cl: cl[1])
    for i, (c1, l1) in enumerate(codes):
        for c2, l2 in codes[i + 1:]:
            assert c2 >> (l2 - l1) != c1 or l1 == l2


# ---------------------------------------------------------------------------
# end-to-end round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,quality,max_mean_err", [
    ((64, 64, 3), 95, 4.0),
    ((33, 47, 3), 85, 8.0),              # non-multiple-of-8 dims
    ((8, 8, 3), 75, 14.0),
    ((17, 3, 3), 85, 10.0),              # narrower than one block
    ((1, 1, 3), 85, 4.0),
])
def test_roundtrip_color(shape, quality, max_mean_err):
    img = _rng_img(*shape[:2], seed=shape[0])
    # overlay smooth structure so quantization has something to keep
    img[..., 0] = _smooth_img(*shape[:2])[..., 0]
    dec = decode_jpeg(encode_jpeg(img, quality))
    assert dec.shape == (shape[0], shape[1], 3)
    assert dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < max_mean_err, err


def test_roundtrip_greyscale_replicates_channels():
    img = _rng_img(24, 40, c=0, seed=9)
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == (24, 40, 3)
    np.testing.assert_array_equal(dec[..., 0], dec[..., 1])
    np.testing.assert_array_equal(dec[..., 1], dec[..., 2])
    assert np.abs(dec[..., 0].astype(int) - img.astype(int)).mean() < 4


def test_constant_images_are_lossless():
    for v in (0, 128, 255):
        img = np.full((24, 24, 3), v, np.uint8)
        np.testing.assert_array_equal(decode_jpeg(encode_jpeg(img, 85)), img)


def test_high_quality_smooth_is_near_lossless():
    img = _smooth_img(48, 48)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_quality_tradeoff_bytes_and_error():
    img = _rng_img(40, 40, seed=1)
    enc_lo, enc_hi = encode_jpeg(img, 10), encode_jpeg(img, 95)
    assert len(enc_lo) < len(enc_hi)
    err = lambda e: np.abs(
        decode_jpeg(e).astype(int) - img.astype(int)).mean()
    assert err(enc_lo) > err(enc_hi)


def test_encode_is_deterministic():
    img = _rng_img(20, 20, seed=5)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


# ---------------------------------------------------------------------------
# stream structure + scope rejection
# ---------------------------------------------------------------------------

def _markers(payload):
    """Walk the marker sequence (skipping entropy data via lengths)."""
    tags, pos = [], 2
    tags.append(payload[1])
    while pos < len(payload):
        assert payload[pos] == 0xFF
        tag = payload[pos + 1]
        tags.append(tag)
        pos += 2
        if tag in (0xD8, 0xD9):
            continue
        (ln,) = struct.unpack(">H", payload[pos:pos + 2])
        pos += ln
        if tag == 0xDA:                   # scan: skip to EOI
            while not (payload[pos] == 0xFF and payload[pos + 1] == 0xD9):
                pos += 1
    return tags


def test_emitted_marker_sequence_is_wellformed_jfif():
    tags = _markers(encode_jpeg(_rng_img(16, 16), 85))
    assert tags[0] == 0xD8 and tags[-1] == 0xD9          # SOI ... EOI
    assert tags[1] == 0xE0                               # JFIF APP0
    assert tags.count(0xDB) == 2                         # luma+chroma DQT
    assert tags.count(0xC4) == 4                         # 2 DC + 2 AC DHT
    assert 0xC0 in tags and 0xDA in tags                 # SOF0, SOS


def test_greyscale_stream_has_single_component_tables():
    tags = _markers(encode_jpeg(_rng_img(16, 16, c=0), 85))
    assert tags.count(0xDB) == 1 and tags.count(0xC4) == 2


def test_decoder_rejects_out_of_scope():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG")
    enc = bytearray(encode_jpeg(_rng_img(16, 16), 85))
    # flip SOF0 -> SOF1 (extended sequential — still out of scope)
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(enc))
    # SOF2 is in scope now, but a baseline stream relabeled SOF2 is
    # MALFORMED progressive (its one scan spans Ss=0..Se=63): the
    # decoder must name that, not decode garbage
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(bytes(enc))
    # sampling factors beyond 2 in SOF0 (4:2:0/4:2:2 are in scope now)
    enc = bytearray(encode_jpeg(_rng_img(16, 16), 85))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 11] = 0x31                  # first component h/v = 3x1
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(enc))


def test_multi_scan_baseline_decodes_via_coefficient_store():
    # multi-scan baseline decodes now (the coefficient-store path) —
    # a duplicated full scan re-codes the same coefficients, so the
    # decode must equal the single-scan decode, never garbage
    enc = encode_jpeg(_rng_img(16, 16), 85)
    sos = enc.index(b"\xff\xda")
    two_scans = enc[:-2] + enc[sos:]
    np.testing.assert_array_equal(decode_jpeg(two_scans),
                                  decode_jpeg(enc))


def test_baseline_per_component_scan_split():
    for shape, kw in [((16, 16, 3), {}), ((17, 23, 3), {}),
                      ((25, 19, 3), {"subsampling": "420"}),
                      ((24, 24, 3), {"restart_interval": 2})]:
        rng = np.random.default_rng(shape[0])
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, 85, **kw))
        multi = encode_jpeg(img, 85, scan_split="per_component", **kw)
        assert multi.count(b"\xff\xda") == 3   # one scan per component
        np.testing.assert_array_equal(decode_jpeg(multi), base, shape)


def test_decoder_rejects_undefined_tables():
    enc = encode_jpeg(_rng_img(16, 16), 85)
    sos = enc.index(b"\xff\xda")
    # scan referencing a huffman table id that was never defined must
    # name the problem instead of KeyError-ing mid-scan
    enc2 = bytearray(enc)
    # SOS body: len(2) ns(1) then (cid, dc<<4|ac) pairs
    enc2[sos + 6] = 0x33
    with pytest.raises(ValueError, match="huffman table"):
        decode_jpeg(bytes(enc2))


def test_quality_100_roundtrips_and_caps_ac_categories():
    # at quality 100 the quant step is 1 everywhere; AC coefficients
    # are clamped to category <= 10 so strict third-party decoders
    # accept the stream — and the self round-trip stays near-lossless
    img = _rng_img(24, 24, seed=3)
    enc = encode_jpeg(img, 100)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.float64) - img.astype(np.float64))
    assert err.mean() < 4.0


def test_bitreader_long_scan_reads_exact_bits():
    # the segment reader keeps O(1) per-read state (a flat buffer +
    # integer cursor — the bignum-accumulator O(n^2) hazard of a
    # shifting design is structurally absent) and must still produce
    # the exact MSB-first bit sequence over a long scan
    data = bytes([0xAB] * 4096)
    r = _BitReader(data)
    expect = [int(b) for b in f"{0xAB:08b}"]
    for i in range(4096 * 8):
        assert r.read_bit() == expect[i % 8]
    import pytest as _pytest
    with _pytest.raises(EOFError):
        r.read_bit()


def test_bitreader_multibit_matches_single_bits():
    data = bytes(range(64))
    a, b = _BitReader(data), _BitReader(data)
    import random
    rng = random.Random(5)
    read = 0
    while read < 64 * 8 - 16:
        n = rng.randint(1, 16)
        v = a.read_bits(n)
        w = 0
        for _ in range(n):
            w = (w << 1) | b.read_bit()
        assert v == w
        read += n


def test_decode_reads_tables_only_from_the_stream():
    # Re-encode the decoded image with a different quality: tables in
    # the second stream differ, yet both decode — proof the decoder
    # uses DHT/DQT payloads, not shared in-process state.
    img = _smooth_img(32, 32)
    first = encode_jpeg(img, 95)
    second = encode_jpeg(decode_jpeg(first), 50)
    assert first != second
    assert decode_jpeg(second).shape == (32, 32, 3)


def test_module_has_no_nonstdlib_imports_beyond_numpy():
    import credit_ocr_system_spark.kernel.jpeg as m
    src = open(m.__file__).read()
    for line in src.splitlines():
        line = line.strip()
        if line.startswith(("import ", "from ")) and "__future__" not in line:
            mod = line.split()[1].split(".")[0]
            # "" = a relative import of a sibling kernel module (the
            # arithmetic entropy coder), itself stdlib-only
            assert mod in {"heapq", "struct", "numpy", ""}, line


# --- 4:2:0 chroma subsampling ------------------------------------------------


def test_420_roundtrip_shapes_and_luma():
    """4:2:0 round-trips at every geometry (odd sizes pad to the
    16x16 MCU grid and crop back); luma stays near-lossless while
    chroma carries the quarter-resolution loss by design."""
    rng = np.random.default_rng(5)
    for shape in [(16, 16), (24, 40), (17, 19), (8, 8), (33, 47)]:
        img = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 85, subsampling="420"))
        assert dec.shape == img.shape and dec.dtype == np.uint8


def test_420_near_lossless_on_chroma_constant_content():
    # an image whose chroma is constant per 2x2 block loses almost
    # nothing to subsampling — the correctness probe for the MCU walk
    rng = np.random.default_rng(6)
    half = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(half, 2, axis=0), 2, axis=1)
    dec = decode_jpeg(encode_jpeg(img, 95, subsampling="420"))
    err = np.abs(dec.astype(np.float64) - img.astype(np.float64))
    assert err.mean() < 5.0


def test_420_stream_is_smaller_and_declares_sampling():
    img = _smooth_img(64, 64)
    e420 = encode_jpeg(img, 85, subsampling="420")
    e444 = encode_jpeg(img, 85)
    assert len(e420) < len(e444)
    sof = e420.index(b"\xff\xc0")
    assert e420[sof + 11] == 0x22          # Y sampled 2x2
    assert e420[sof + 14] == 0x11          # Cb 1x1
    # and the smooth image survives subsampling nearly untouched
    err = np.abs(decode_jpeg(e420).astype(np.float64)
                 - img.astype(np.float64))
    assert err.mean() < 3.0


def test_420_is_deterministic_and_444_unchanged():
    img = _rng_img(24, 24, seed=9)
    assert encode_jpeg(img, 85, subsampling="420") == \
        encode_jpeg(img, 85, subsampling="420")
    # the 4:4:4 path emits the identical bytes it did before the
    # subsampling feature existed (fixture-protected elsewhere too)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85, subsampling="444")
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, 85, subsampling="422x")


# --- restart intervals (DRI / RSTn) -----------------------------------------


def test_restart_markers_roundtrip_bitexact_vs_plain():
    """RSTn resets DC prediction and re-byte-aligns; the decoded
    pixels must equal the non-RST stream's decode exactly, for both
    chroma layouts and greyscale."""
    img = _rng_img(33, 47, seed=11)
    for sub in ("444", "420"):
        base = decode_jpeg(encode_jpeg(img, 85, subsampling=sub))
        for ri in (1, 2, 5, 100):
            enc = encode_jpeg(img, 85, subsampling=sub,
                              restart_interval=ri)
            assert b"\xff\xdd" in enc          # DRI present
            np.testing.assert_array_equal(decode_jpeg(enc), base)
    g = _rng_img(20, 28, c=0, seed=12)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(g, 85, restart_interval=3)),
        decode_jpeg(encode_jpeg(g, 85)))


def test_restart_marker_indices_cycle_mod_8():
    img = _rng_img(80, 80, seed=13)        # 100 MCUs at 4:4:4
    enc = encode_jpeg(img, 85, restart_interval=1)
    scan = enc[enc.index(b"\xff\xda"):]
    idxs = []
    i = 0
    while True:
        j = scan.find(b"\xff", i)
        if j < 0 or j + 1 >= len(scan):
            break
        m = scan[j + 1]
        if 0xD0 <= m <= 0xD7:
            idxs.append(m - 0xD0)
        i = j + 2 if m != 0x00 else j + 2
    assert len(idxs) == 99                 # one between each MCU pair
    assert idxs[:10] == [0, 1, 2, 3, 4, 5, 6, 7, 0, 1]


def test_missing_restart_marker_is_a_named_error():
    img = _rng_img(32, 32, seed=14)
    enc = bytearray(encode_jpeg(img, 85, restart_interval=1))
    # corrupt the first RST marker's index
    for i in range(len(enc) - 1):
        if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7:
            enc[i + 1] = 0xD7  # wrong sequence position
            break
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(enc))


def test_truncated_scan_raises_named_error_never_indexerror():
    # the fused DC path must bounds-check BEFORE its amplitude read:
    # truncating the entropy segment at every byte boundary must yield
    # a NAMED decode error (EOFError/ValueError), never an IndexError
    # escaping from guard-byte indexing
    import pytest as _pytest

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    payload = encode_jpeg(img, quality=85)
    sos = payload.find(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(payload[sos + 2:sos + 4], "big")
    for cut in range(scan_start + 1, len(payload) - 2, 7):
        with _pytest.raises((EOFError, ValueError)):
            decode_jpeg(payload[:cut] + b"\xff\xd9")


def test_hostile_dc_table_category_is_named_error():
    # a DHT that maps a code to DC category > 11 (spec max) must be a
    # named ValueError, not a negative-shift crash mid-scan
    import pytest as _pytest

    img = np.full((8, 8), 128, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, quality=85))
    dht = payload.find(b"\xff\xc4")
    assert dht > 0
    ln = int.from_bytes(payload[dht + 2:dht + 4], "big")
    # huffval bytes live after the 17-byte (class/id + bits) header
    body = payload[dht + 4:dht + 2 + ln]
    if (body[0] >> 4) == 0:          # DC table: corrupt its symbols
        for k in range(17, len(body)):
            body[k] = 0xFE           # category 254
        payload[dht + 4:dht + 2 + ln] = body
        with _pytest.raises(ValueError):
            decode_jpeg(bytes(payload))
