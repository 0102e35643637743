#!/usr/bin/env python3
"""Regenerate ``kernel/brotli_data.py`` + ``kernel/data/brotli_dict.bin``
from the system brotli C library.

Provenance: the static dictionary, the 121 word transforms, and the
literal-context lookup table are normative content of **RFC 7932**
(Appendix A: dictionary; Appendix B: transforms; Appendix C: context
lookup). Rather than transcribing ~125 KB of RFC appendix bytes by
hand (error-prone), this script reads the identical public data out
of the installed ``libbrotlicommon`` (BSD-licensed reference
implementation of the same RFC) via ctypes, classifies each
transform's behavior by probing ``BrotliTransformDictionaryWord``
with two independent witness words, and emits a pure-Python data
module. The engine itself never loads the C library — executors
import only the generated module (``kernel/brotli_data.py``) and the
dictionary blob.

Run: ``python3 tools/extract_brotli_tables.py`` (idempotent; fails
loudly if the library data does not match RFC 7932's published
shape: 122,784 dictionary bytes, 121 transforms).
"""

from __future__ import annotations

import ctypes
import hashlib
import os

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "credit_ocr_system_spark", "kernel")
DICT_BIN = os.path.join(OUT_DIR, "data", "brotli_dict.bin")
DATA_PY = os.path.join(OUT_DIR, "brotli_data.py")

# RFC 7932 Appendix A: total dictionary size.
RFC_DICT_SIZE = 122784
RFC_NUM_TRANSFORMS = 121


class _Dict(ctypes.Structure):
    # brotli/common/dictionary.h (v1.x)
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


class _Transforms(ctypes.Structure):
    # brotli/common/transform.h (v1.x)
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                ("params", ctypes.POINTER(ctypes.c_uint8)),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


def _ferment_first(w: bytes) -> bytes:
    # RFC 7932 §8 "ferment": byte-level uppercase for the first
    # "character" (multibyte rule irrelevant for the ASCII witnesses)
    return (bytes([w[0] ^ 32]) if 97 <= w[0] <= 122 else w[:1]) + w[1:]


def _ferment_all(w: bytes) -> bytes:
    return bytes(b ^ 32 if 97 <= b <= 122 else b for b in w)


def _candidates(w: bytes):
    yield ("identity", 0, w)
    yield ("ferment_first", 0, _ferment_first(w))
    yield ("ferment_all", 0, _ferment_all(w))
    for n in range(1, 10):
        yield ("omit_first", n, w[n:])
        yield ("omit_last", n, w[:-n])


def _classify(apply, idx: int):
    """(prefix, kind, param, suffix) explaining BOTH witness words."""
    w1 = b"abcdefghijklmnopqrst"
    w2 = b"zyxwvutsrqponmlkjihg"
    out1, out2 = apply(idx, w1), apply(idx, w2)
    hits = []
    for (kind, param, core1), (_, _, core2) in zip(
            _candidates(w1), _candidates(w2)):
        i1, i2 = out1.find(core1), out2.find(core2)
        if i1 < 0 or i2 < 0:
            continue
        pre1, suf1 = out1[:i1], out1[i1 + len(core1):]
        pre2, suf2 = out2[:i2], out2[i2 + len(core2):]
        if pre1 == pre2 and suf1 == suf2:
            hits.append((pre1, kind, param, suf1))
    if not hits:
        raise AssertionError(f"transform {idx}: no kind explains both "
                             f"witnesses ({out1!r}, {out2!r})")
    # identical-output duplicates (e.g. empty-prefix ambiguity) cannot
    # occur with two independent 20-byte witnesses; longest core wins
    return hits[0]


def main() -> None:
    lib = ctypes.CDLL("libbrotlicommon.so.1")

    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dict)
    d = lib.BrotliGetDictionary().contents
    assert d.data_size == RFC_DICT_SIZE, d.data_size
    data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
    os.makedirs(os.path.dirname(DICT_BIN), exist_ok=True)
    with open(DICT_BIN, "wb") as fh:
        fh.write(data)

    lib.BrotliGetTransforms.restype = ctypes.POINTER(_Transforms)
    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == RFC_NUM_TRANSFORMS, t.num_transforms
    lib.BrotliTransformDictionaryWord.restype = ctypes.c_int

    def apply(idx: int, word: bytes) -> bytes:
        dst = (ctypes.c_uint8 * 64)()
        n = lib.BrotliTransformDictionaryWord(
            dst, (ctypes.c_uint8 * len(word)).from_buffer_copy(word),
            len(word), ctypes.byref(t), idx)
        return bytes(dst[:n])

    transforms = [_classify(apply, i) for i in range(t.num_transforms)]

    # RFC 7932 Appendix C: 4 x 256-byte literal-context sub-tables
    # packed as one 2048-byte lookup (two sub-tables per mode).
    lut = bytes((ctypes.c_uint8 * 2048).in_dll(
        lib, "_kBrotliContextLookupTable"))

    with open(DATA_PY, "w", encoding="utf-8") as fh:
        fh.write('"""GENERATED by tools/extract_brotli_tables.py — '
                 'do not edit.\n\nRFC 7932 normative tables '
                 '(Appendix A sizes/offsets, Appendix B word\n'
                 'transforms, Appendix C context lookup), read from '
                 'the system\nlibbrotlicommon (BSD) and emitted as '
                 'pure Python so the decoder\nnever needs the C '
                 'library. Dictionary bytes: data/brotli_dict.bin\n'
                 f'(sha256 {hashlib.sha256(data).hexdigest()}).\n'
                 '"""\n\n')
        fh.write("DICT_SIZE_BITS_BY_LENGTH = %r\n\n"
                 % (list(d.size_bits_by_length),))
        fh.write("DICT_OFFSETS_BY_LENGTH = %r\n\n"
                 % (list(d.offsets_by_length),))
        fh.write("DICT_SHA256 = %r\n\n"
                 % hashlib.sha256(data).hexdigest())
        fh.write("# (prefix, kind, param, suffix) per RFC 7932 "
                 "Appendix B row\nTRANSFORMS = [\n")
        for pre, kind, param, suf in transforms:
            fh.write(f"    ({pre!r}, {kind!r}, {param}, {suf!r}),\n")
        fh.write("]\n\n")
        fh.write("CONTEXT_LUT = (  # Appendix C, 2048 bytes\n")
        for i in range(0, 2048, 16):
            fh.write("    %r\n" % (lut[i:i + 16],))
        fh.write(")\n")
    print(f"wrote {DICT_BIN} ({len(data)} bytes) and {DATA_PY} "
          f"({len(transforms)} transforms)")


if __name__ == "__main__":
    main()
