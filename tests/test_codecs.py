"""Stdlib media codecs: PNG / BMP / WAV round-trips and edge cases.

The decoders are the real path behind ``decode_media``
(``operators/multimodal.py``) — these tests prove actual bytes decode
(zlib inflate + unfilter, DIB rows, PCM scaling), not a stand-in.
WAV is additionally cross-validated against the stdlib ``wave``
module as an independent implementation.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from credit_ocr_system_spark.kernel import codecs
from credit_ocr_system_spark.kernel.codecs import (
    PNG_SIG,
    _png_chunk,
    decode_bmp,
    decode_image_rgb,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_format,
)


def _rng_img(h, w, ch=3, seed=7):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_rgb_each_filter(ftype):
    img = _rng_img(13, 17, 3, seed=ftype)
    out = decode_png(encode_png(img, row_filter=ftype))
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_default_cycles_all_filters():
    # default cycles 0..4 by row — ≥5 rows exercises every unfilter
    img = _rng_img(11, 9, 3)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_grey_and_rgba():
    grey = _rng_img(8, 6, 1)
    out = decode_png(encode_png(grey))
    np.testing.assert_array_equal(out[:, :, 0], grey)
    assert out.shape == (8, 6, 1)

    rgba = _rng_img(7, 5, 4)
    np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_roundtrip_1px_and_wide():
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(one)), one)
    wide = _rng_img(1, 301, 3)
    np.testing.assert_array_equal(decode_png(encode_png(wide)), wide)


def _raw_png(w, h, color_type, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(raw_scanlines)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr) + extra
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def test_png_palette_expansion():
    # 2x2, color type 3, palette of 3 colors, filter 0 rows
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = b"\x00\x00\x01" + b"\x00\x02\x00"       # rows: [0,1], [2,0]
    payload = _raw_png(2, 2, 3, scan, extra=_png_chunk(b"PLTE", plte))
    out = decode_png(payload)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 255])


def test_png_grey_alpha_decode():
    # color type 4 (grey+alpha): encoder never emits it, decoder must
    scan = b"\x00" + bytes([10, 200, 20, 100])     # 2x1, filter 0
    out = decode_png(_raw_png(2, 1, 4, scan))
    assert out.shape == (1, 2, 2)
    np.testing.assert_array_equal(out[0, 0], [10, 200])


def test_png_crc_mismatch_raises():
    payload = bytearray(encode_png(_rng_img(4, 4, 3)))
    payload[-5] ^= 0xFF                            # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_bad_signature_and_depth():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + b"\x00" * 32)
    # 16-bit RGB is in scope now (reduced to the high byte)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
               + _png_chunk(b"IEND", b""))
    assert decode_png(payload).shape == (2, 2, 3)
    # spec-invalid depth/color combos still raise
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)   # RGB @ 4
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 8))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(payload)


def test_png_interlaced_wrong_length_rejected():
    # Adam7 decodes now (tests/test_png_full.py); a sequential-sized
    # IDAT under the interlace flag must fail loudly, not misdecode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)   # Adam7 flag
    payload = (PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(payload)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w", [4, 5, 6, 7])      # all 4-byte pad residues
def test_bmp_roundtrip_padding(w):
    img = _rng_img(6, w, 3, seed=w)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_top_down_rows():
    img = _rng_img(5, 4, 3)
    payload = bytearray(encode_bmp(img))
    # flip height sign to top-down and reverse the stored row order
    (h,) = struct.unpack_from("<i", payload, 22)
    struct.pack_into("<i", payload, 22, -h)
    stride = (4 * 3 + 3) & ~3
    (offset,) = struct.unpack_from("<I", payload, 10)
    rows = [bytes(payload[offset + y * stride: offset + (y + 1) * stride])
            for y in range(h)]
    payload[offset:offset + h * stride] = b"".join(reversed(rows))
    np.testing.assert_array_equal(decode_bmp(bytes(payload)), img)


def test_bmp_32bit_alpha_dropped():
    img = _rng_img(3, 3, 3)
    # hand-build a 32-bit BMP: BGRA rows, no padding needed
    h, w = img.shape[:2]
    body = b"".join(
        bytes(np.concatenate([img[y, x, ::-1], [0xAA]]).astype(np.uint8))
        for y in range(h - 1, -1, -1) for x in range(w))
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body),
                      2835, 2835, 0, 0)
    np.testing.assert_array_equal(decode_bmp(header + dib + body), img)


def test_bmp_compressed_rejected():
    payload = bytearray(encode_bmp(_rng_img(2, 2, 3)))
    struct.pack_into("<I", payload, 30, 1)         # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(payload))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_roundtrip_16bit_quantization_bound():
    rng = np.random.RandomState(3)
    samples = (rng.rand(500).astype(np.float32) * 2 - 1)
    out, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    # 16-bit quantization: encode rounds to /32767, decode divides by
    # 32768 → worst case ≈ 0.5/32767 + |s|·(1/32767 − 1/32768) < 6.2e-5
    np.testing.assert_allclose(out, samples, atol=6.2e-5)


def test_wav_cross_validated_against_stdlib_wave():
    rng = np.random.RandomState(4)
    samples = (rng.rand(300).astype(np.float32) * 2 - 1)
    payload = encode_wav(samples, 8000)
    with wave.open(io.BytesIO(payload)) as wf:
        assert wf.getframerate() == 8000
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        pcm_ref = np.frombuffer(
            wf.readframes(wf.getnframes()), "<i2")
    ours, _ = decode_wav(payload)
    np.testing.assert_array_equal(
        np.clip(np.rint(samples.astype(np.float64) * 32767), -32768, 32767),
        pcm_ref)
    np.testing.assert_allclose(ours, pcm_ref / 32768.0, atol=0)


def test_wav_8bit_and_extra_chunks():
    # hand-build: LIST chunk before data, 8-bit unsigned PCM
    pcm8 = bytes([0, 64, 128, 192, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 11025, 11025, 1, 8)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd→pad
              + b"data" + struct.pack("<I", len(pcm8)) + pcm8)
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    out, rate = decode_wav(payload)
    assert rate == 11025
    np.testing.assert_allclose(
        out, (np.array([0, 64, 128, 192, 255]) - 128.0) / 128.0)


def test_wav_stereo_interleaved_flat():
    samples = np.array([0.5, -0.5, 0.25, -0.25], dtype=np.float32)
    out, _ = decode_wav(encode_wav(samples, 44100, channels=2))
    assert out.shape == (4,)                       # flat, interleaved
    np.testing.assert_allclose(out, samples, atol=6.2e-5)


def test_wav_non_pcm_rejected():
    # IEEE float decodes now (tests/test_wav_bmp_full.py); compressed
    # formats like ADPCM must still raise with the format named
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # MS ADPCM
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError, match="format 2"):
        decode_wav(payload)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def test_sniff_format():
    assert sniff_format(encode_png(_rng_img(2, 2, 3))) == "png"
    assert sniff_format(encode_bmp(_rng_img(2, 2, 3))) == "bmp"
    assert sniff_format(encode_wav(np.zeros(4, np.float32), 8000)) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0 jpeg!") == "jpeg"
    assert sniff_format(b"\x00\x01\x02 nothing") is None


def test_decode_image_rgb_normalizes_channels():
    grey = _rng_img(4, 4, 1)
    out = decode_image_rgb(encode_png(grey))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[:, :, 0], grey)
    np.testing.assert_array_equal(out[:, :, 1], grey)

    rgba = _rng_img(4, 4, 4)
    out = decode_image_rgb(encode_png(rgba))
    np.testing.assert_array_equal(out, rgba[:, :, :3])

    from credit_ocr_system_spark.kernel.jpeg import encode_jpeg

    rgb = _rng_img(12, 9, 3)
    out = decode_image_rgb(encode_jpeg(rgb, quality=95))
    assert out.shape == (12, 9, 3)        # lossy: shape, not pixels
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 16

    with pytest.raises(NotImplementedError):
        decode_image_rgb(b"GIF89a not supported")


def test_module_has_no_nonstdlib_imports():
    import credit_ocr_system_spark.kernel.codecs as m
    src = open(m.__file__).read()
    for line in src.splitlines():
        line = line.strip()
        if line.startswith(("import ", "from ")) and "__future__" not in line:
            mod = line.split()[1].split(".")[0]
            # "" = in-package relative import (the jpeg sibling module)
            assert mod in ("struct", "zlib", "numpy", ""), mod


# --- AVI (MJPEG) -----------------------------------------------------------


def _frames(n=4, h=16, w=24, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)


def test_avi_roundtrip_and_determinism():
    frames = _frames()
    avi = codecs.encode_avi_mjpeg(frames)
    assert codecs.sniff_format(avi) == "avi"
    assert codecs.encode_avi_mjpeg(frames) == avi  # byte-deterministic
    dec = codecs.decode_avi_mjpeg(avi)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    # MJPEG is lossy; frames must still be close and frame-aligned
    err = np.abs(dec.astype(np.float64) - frames.astype(np.float64))
    assert err.mean() < 8.0
    # frames decode independently (no inter-frame state)
    one = codecs.decode_avi_mjpeg(codecs.encode_avi_mjpeg(frames[:1]))
    np.testing.assert_array_equal(one[0], dec[0])


def test_avi_header_fields_are_wellformed():
    frames = _frames(n=3, h=8, w=8)
    avi = codecs.encode_avi_mjpeg(frames, fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    # RIFF size covers the whole file
    assert struct.unpack_from("<I", avi, 4)[0] == len(avi) - 8
    # stream header advertises vids/MJPG; avih carries the frame count
    assert b"vids" in avi and b"MJPG" in avi and b"idx1" in avi
    at = avi.index(b"avih") + 8
    us_per_frame, = struct.unpack_from("<I", avi, at)
    total_frames, = struct.unpack_from("<I", avi, at + 16)
    assert us_per_frame == 100000 and total_frames == 3


def test_avi_rejects_out_of_scope_and_malformed():
    frames = _frames(n=2, h=8, w=8)
    avi = codecs.encode_avi_mjpeg(frames)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        codecs.decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    # a non-MJPEG vids stream must name the codec, not mis-decode
    other = avi.replace(b"vids" + b"MJPG", b"vids" + b"H264")
    with pytest.raises(ValueError, match="H264"):
        codecs.decode_avi_mjpeg(other)
    # empty movi list
    empty = codecs.encode_avi_mjpeg(frames)
    empty = empty.replace(b"00dc", b"00xx")
    with pytest.raises(ValueError, match="no video frames"):
        codecs.decode_avi_mjpeg(empty)


# --- MP4 / ISO BMFF (Motion-JPEG) -------------------------------------------


def test_mp4_roundtrip_and_determinism():
    frames = _frames()
    mp4 = codecs.encode_mp4_mjpeg(frames)
    assert codecs.sniff_format(mp4) == "mp4"
    assert codecs.encode_mp4_mjpeg(frames) == mp4  # byte-deterministic
    dec = codecs.decode_mp4_mjpeg(mp4)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(np.float64) - frames.astype(np.float64))
    assert err.mean() < 8.0
    # the two containers carry identical Motion-JPEG samples: the
    # decoded stacks are bit-equal across AVI and MP4
    avi = codecs.decode_avi_mjpeg(codecs.encode_avi_mjpeg(frames))
    np.testing.assert_array_equal(dec, avi)
    one = codecs.decode_mp4_mjpeg(codecs.encode_mp4_mjpeg(frames[:1]))
    np.testing.assert_array_equal(one[0], dec[0])


def test_mp4_box_tree_is_wellformed():
    frames = _frames(n=3, h=8, w=8)
    mp4 = codecs.encode_mp4_mjpeg(frames, fps=10)
    # top-level boxes tile the file exactly: ftyp, mdat, moov
    tops = list(codecs._mp4_boxes(mp4, 0, len(mp4)))
    assert [t for t, _, _ in tops] == [b"ftyp", b"mdat", b"moov"]
    assert tops[-1][2] == len(mp4)
    # every stco offset lands on a JPEG SOI marker
    moov = codecs._mp4_find(mp4, 0, len(mp4), b"moov")
    trak = codecs._mp4_find(mp4, *moov, b"trak")
    mdia = codecs._mp4_find(mp4, *trak, b"mdia")
    minf = codecs._mp4_find(mp4, *mdia, b"minf")
    stbl = codecs._mp4_find(mp4, *minf, b"stbl")
    ranges = codecs._mp4_sample_ranges(mp4, *stbl)
    assert len(ranges) == 3
    for off, size in ranges:
        assert mp4[off:off + 3] == b"\xff\xd8\xff"
        assert mp4[off + size - 2:off + size] == b"\xff\xd9"


def _remux_stbl(mp4: bytes, stsc_entries, stco_offsets,
                co64: bool = False) -> bytes:
    """Rebuild the encoder's moov with custom stsc/stco tables (the
    mdat bytes and sample sizes stay as encoded)."""
    import struct as _s
    moov = codecs._mp4_find(mp4, 0, len(mp4), b"moov")
    trak = codecs._mp4_find(mp4, *moov, b"trak")
    mdia = codecs._mp4_find(mp4, *trak, b"mdia")
    minf = codecs._mp4_find(mp4, *mdia, b"minf")
    stbl = codecs._mp4_find(mp4, *minf, b"stbl")
    keep = {t: mp4[b0 - 8:b1]
            for t, b0, b1 in codecs._mp4_boxes(mp4, *stbl)}
    stsc = codecs._full_box(b"stsc", 0, 0, _s.pack(
        ">I", len(stsc_entries)) + b"".join(
        _s.pack(">III", *e) for e in stsc_entries))
    fmt, tag = (">Q", b"co64") if co64 else (">I", b"stco")
    stco = codecs._full_box(tag, 0, 0, _s.pack(
        ">I", len(stco_offsets)) + b"".join(
        _s.pack(fmt, o) for o in stco_offsets))
    new_stbl = codecs._box(b"stbl", keep[b"stsd"] + keep[b"stts"]
                           + stsc + keep[b"stsz"] + stco)
    # splice the new stbl into minf/mdia/trak/moov, inside out
    out = mp4[:stbl[0] - 8] + new_stbl + mp4[stbl[1]:]
    # fix ancestor box sizes (each grew/shrank by the same delta)
    delta = len(new_stbl) - (stbl[1] - (stbl[0] - 8))
    for b0, _b1 in (moov, trak, mdia, minf):
        at = b0 - 8
        old = _s.unpack_from(">I", out, at)[0]
        out = out[:at] + _s.pack(">I", old + delta) + out[at + 4:]
    return out


def test_mp4_general_sample_tables_decode():
    """Third-party muxers pack several samples per chunk and may use
    co64 — the decoder honors the general stsc map, not just the
    encoder's one-sample-per-chunk layout."""
    frames = _frames(n=4, h=8, w=8)
    mp4 = codecs.encode_mp4_mjpeg(frames)
    want = codecs.decode_mp4_mjpeg(mp4)
    moov = codecs._mp4_find(mp4, 0, len(mp4), b"moov")
    trak = codecs._mp4_find(mp4, *moov, b"trak")
    mdia = codecs._mp4_find(mp4, *trak, b"mdia")
    minf = codecs._mp4_find(mp4, *mdia, b"minf")
    stbl = codecs._mp4_find(mp4, *minf, b"stbl")
    ranges = codecs._mp4_sample_ranges(mp4, *stbl)
    # samples are contiguous in mdat: two chunks of two samples each
    two_per = _remux_stbl(mp4, [(1, 2, 1)],
                          [ranges[0][0], ranges[2][0]])
    np.testing.assert_array_equal(
        codecs.decode_mp4_mjpeg(two_per), want)
    # same, with 64-bit chunk offsets
    with_co64 = _remux_stbl(mp4, [(1, 2, 1)],
                            [ranges[0][0], ranges[2][0]], co64=True)
    np.testing.assert_array_equal(
        codecs.decode_mp4_mjpeg(with_co64), want)


def test_mp4_rejects_out_of_scope_and_malformed():
    import struct as _s
    frames = _frames(n=2, h=8, w=8)
    mp4 = codecs.encode_mp4_mjpeg(frames)
    with pytest.raises(ValueError, match="ftyp"):
        codecs.decode_mp4_mjpeg(b"\x00\x00\x00\x08free")
    # an H.264 sample entry must name the codec, not mis-decode
    entry = _s.pack(">I", 86) + b"jpeg"
    avc = mp4.replace(entry, _s.pack(">I", 86) + b"avc1")
    with pytest.raises(ValueError, match="avc1"):
        codecs.decode_mp4_mjpeg(avc)
    # no moov
    moov = codecs._mp4_find(mp4, 0, len(mp4), b"moov")
    headless = mp4[:moov[0] - 8]
    with pytest.raises(ValueError, match="moov"):
        codecs.decode_mp4_mjpeg(headless)
    # a sample range pointing past EOF must raise, not wrap
    truncated = mp4[:moov[0] - 8 - 40] + mp4[moov[0] - 8:]
    # (dropping mdat tail shifts nothing — moov still references the
    # original offsets, which now exceed the file)
    with pytest.raises(ValueError):
        codecs.decode_mp4_mjpeg(truncated)
