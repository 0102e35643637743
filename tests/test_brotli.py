"""From-scratch RFC 7932 brotli codec (kernel/brotli.py).

Three layers of evidence:

* **conformance vs the reference implementation** (the system
  libbrotlienc/libbrotlidec, used as a test oracle ONLY): streams
  produced by the real encoder at every quality 0..11 and window
  10..24 — including static-dictionary/transform references and
  multi-metablock window-wrap streams — decode byte-identically
  here, and this module's deterministic encoder output decodes
  byte-identically under the real decoder. Skipped (loudly) if the
  system library is absent; the pure round-trip layer below still
  runs everywhere.
* **self round-trip** without any C library: encoder(store|literal)
  -> decoder == identity, property-tested.
* **robustness**: random garbage and every truncation of a valid
  stream raise BrotliError (never hang, crash, or return wrong
  data); the max_output zip-bomb guard trips.

Plus provenance pins for the extracted RFC tables (Appendix A
dictionary shape/sha256, Appendix B transform count, Appendix C
context table vs the closed-form LSB6/MSB6 modes).
"""

import ctypes
import ctypes.util
import hashlib
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from credit_ocr_system_spark.kernel import brotli_data as BD
from credit_ocr_system_spark.kernel.brotli import (
    BrotliError,
    _dictionary,
    brotli_compress,
    brotli_decompress,
)


def _load(name):
    try:
        return ctypes.CDLL(name)
    except OSError:
        return None


_ENC = _load("libbrotlienc.so.1")
_DEC = _load("libbrotlidec.so.1")
needs_libs = pytest.mark.skipif(
    _ENC is None or _DEC is None,
    reason="system libbrotli absent — conformance oracle unavailable")


def c_compress(data: bytes, quality: int = 9, lgwin: int = 22) -> bytes:
    n = ctypes.c_size_t(len(data) * 2 + 1024)
    out = ctypes.create_string_buffer(n.value)
    assert _ENC.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(n), out)
    return out.raw[:n.value]


def c_decompress(data: bytes, cap: int = 1 << 26) -> bytes:
    n = ctypes.c_size_t(cap)
    out = ctypes.create_string_buffer(n.value)
    r = _DEC.BrotliDecoderDecompress(len(data), data,
                                     ctypes.byref(n), out)
    assert r == 1, f"reference decoder rejected stream ({r})"
    return out.raw[:n.value]


def _payloads():
    rng = random.Random(7)
    text = ("the quick brown fox jumps over the lazy dog. "
            "Download information about this HTML page here. ") * 40
    return [
        b"",
        b"a",
        b"hello world " * 3,
        text.encode(),
        "Straße über die Brücke — 日本語のテスト".encode() * 30,
        bytes(range(256)) * 8,
        bytes(rng.getrandbits(8) for _ in range(4096)),
        (b"abc" * 100001)[:300000],   # window wrap at lgwin<=16
    ]


@needs_libs
@pytest.mark.parametrize("quality", [0, 1, 2, 4, 5, 6, 9, 10, 11])
def test_decodes_reference_encoder_all_qualities(quality):
    for p in _payloads():
        stream = c_compress(p, quality)
        assert brotli_decompress(stream, max_output=1 << 27) == p


@needs_libs
@pytest.mark.parametrize("lgwin", [10, 14, 16, 18, 24])
def test_decodes_reference_encoder_all_windows(lgwin):
    for p in _payloads():
        stream = c_compress(p, 6, lgwin)
        assert brotli_decompress(stream, max_output=1 << 27) == p


@needs_libs
def test_dictionary_transform_streams():
    # quality 5+ on short dictionary-rich text forces static-
    # dictionary references (sub-input-size output on a 35-byte
    # non-repeating-window input is impossible without them)
    p = b"hello world hello world hello world"
    stream = c_compress(p, 5)
    assert len(stream) < len(p) // 2
    assert brotli_decompress(stream) == p
    p1 = b"the quick brown fox jumps over the lazy dog"
    assert brotli_decompress(c_compress(p1, 11)) == p1
    # uppercase/ferment transform coverage
    p2 = b"The Quick Brown Fox. THE INFORMATION DOWNLOAD PAGE."
    assert brotli_decompress(c_compress(p2, 11)) == p2


@needs_libs
@pytest.mark.parametrize("mode", ["store", "literal"])
def test_own_encoder_accepted_by_reference_decoder(mode):
    for p in _payloads():
        stream = brotli_compress(p, mode)
        assert c_decompress(stream, cap=1 << 27) == p


@needs_libs
def test_fuzz_conformance():
    rng = random.Random(1234)
    words = ["the", "of", "and", "download", "information", "über",
             "straße", "<div>", "</div>", "http://", "page"]
    for trial in range(60):
        kind = trial % 4
        size = rng.choice([0, 1, 17, 100, 1000, 5000, 70000])
        if kind == 0:
            p = bytes(rng.getrandbits(8) for _ in range(min(size, 4000)))
        elif kind == 1:
            p = " ".join(rng.choice(words)
                         for _ in range(size // 4)).encode()
        elif kind == 2:
            p = (b"xyz" * (size // 3 + 1))[:size]
        else:
            p = b"<html><body>" + b"x" * size + b"</body></html>"
        q = rng.choice(range(12))
        w = rng.choice([10, 16, 18, 22])
        assert brotli_decompress(c_compress(p, q, w),
                                 max_output=1 << 27) == p


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096),
       st.sampled_from(["store", "literal"]))
def test_self_roundtrip_property(payload, mode):
    assert brotli_decompress(brotli_compress(payload, mode)) == payload


def test_self_roundtrip_multiblock():
    # > one metablock in both modes (store chunks at 64 KiB)
    p = bytes((i * 7 + 13) & 0xFF for i in range(200_000))
    for mode in ("store", "literal"):
        assert brotli_decompress(brotli_compress(p, mode),
                                 max_output=1 << 27) == p


def test_garbage_raises_brotli_error_only():
    rng = random.Random(99)
    for _ in range(300):
        blob = bytes(rng.getrandbits(8)
                     for _ in range(rng.randrange(1, 120)))
        try:
            brotli_decompress(blob, max_output=1 << 20)
        except BrotliError:
            pass  # the only acceptable failure type


def test_truncations_raise():
    stream = brotli_compress(b"hello brotli " * 500, "literal")
    for cut in range(len(stream) - 1):
        try:
            brotli_decompress(stream[:cut])
        except BrotliError:
            continue
        # a prefix that still parses must yield a prefix of the data
        # (possible when truncation lands exactly on a block boundary
        # before the final empty block -- our encoder never does)
        pytest.fail(f"truncation at {cut} decoded silently")


def test_max_output_guard():
    p = b"\x00" * (1 << 20)
    stream = brotli_compress(p, "store")
    with pytest.raises(BrotliError):
        brotli_decompress(stream, max_output=1 << 10)


def test_empty_stream_forms():
    # minimal last-empty stream from our encoder
    assert brotli_decompress(brotli_compress(b"", "store")) == b""
    assert brotli_decompress(brotli_compress(b"", "literal")) == b""


# ------------------------------------------------- table provenance


def test_dictionary_blob_pinned():
    d = _dictionary()
    assert len(d) == 122784  # RFC 7932 Appendix A
    assert hashlib.sha256(d).hexdigest() == BD.DICT_SHA256
    # spot words from the published dictionary head
    assert d[:4] == b"time"
    assert d[4:8] == b"down"


def test_transform_table_shape():
    assert len(BD.TRANSFORMS) == 121  # RFC 7932 Appendix B
    # row 0 is the identity transform; row 9 ferments the first char
    assert BD.TRANSFORMS[0] == (b"", "identity", 0, b"")
    assert BD.TRANSFORMS[9] == (b"", "ferment_first", 0, b"")


def test_context_lut_closed_forms():
    # Appendix C: modes LSB6 and MSB6 have closed forms; the packed
    # table must agree with them (p2 half of those modes is zero)
    for p1 in range(256):
        assert BD.CONTEXT_LUT[0 * 512 + p1] == (p1 & 0x3F)
        assert BD.CONTEXT_LUT[1 * 512 + p1] == (p1 >> 2)
    for p2 in range(256):
        assert BD.CONTEXT_LUT[0 * 512 + 256 + p2] == 0
        assert BD.CONTEXT_LUT[1 * 512 + 256 + p2] == 0
    # UTF8/Signed halves are genuine lookups with 6-bit range
    assert max(BD.CONTEXT_LUT) <= 63
