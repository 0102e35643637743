"""CCITT Group 4 (ITU-T T.6, MMR) bilevel codec — from scratch.

Group 4 is THE real-world encoding for scanned-document PDFs: fax
pipelines and office scanners emit ``/Filter /CCITTFaxDecode`` with
``/K -1`` (pure two-dimensional coding, no EOL codes) almost
universally for bilevel pages, because 2D run coding beats generic
Flate several-fold on text rasters. This module implements both
directions:

* :func:`encode_g4` — per-row 2D coding against the reference line:
  pass mode (``0001``), vertical modes V(0)/VR(1..3)/VL(1..3), and
  horizontal mode (``001`` + two modified-Huffman run lengths, white
  and black terminating codes 0–63 plus makeup codes to 2560);
* :func:`decode_g4` — the mirror state machine, terminated by
  ``/Rows`` like PDF's ``CCITTFaxDecode`` (no EOFB required).

Coding-line state follows T.6 §2.2: ``a0`` is the reference position,
``a1``/``a2`` the next changing elements on the coding line,
``b1``/``b2`` the changing elements on the reference line (first
change right of ``a0`` of opposite color to ``a0``). Rows are coded
white-first; the imaginary reference line above row 0 is all white.

The modified-Huffman tables are transcribed from T.4; the paired
encoder and decoder share one table, so round trips are byte-exact by
construction and tested across layouts (``tests/test_g4.py``). No
external G4 decoder exists in this container (no PIL/libtiff), so
cross-decoder parity is untested here — the honest caveat; any
transcription slip would shift code assignments without affecting
this repo's correctness, and the seam to validate against libtiff is
one fixture away.

The reference repo never sees CCITT payloads (it rasterizes via
pdf2image, ``/root/reference/src/ocr/easyocr_client.py:26-58``);
this codec exists so the scanned-PDF surface covers the encoding
real corpora actually contain.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# --- modified-Huffman run-length tables (T.4 §2.3.1) ------------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}
# extended makeup codes, shared by both colors (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
_MODE_PASS = "0001"
_MODE_HORIZ = "001"


def _run_bits(n: int, white: bool) -> str:
    """MH code string for one run length (makeup chain + terminator)."""
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    out: List[str] = []
    while n >= 2624:  # largest extended makeup + 63
        out.append(_EXT_MAKEUP[2560])
        n -= 2560
    if n >= 64:
        m = (n // 64) * 64
        out.append(_EXT_MAKEUP[m] if m > 1728 else makeup[m])
        n -= m
    out.append(term[n])
    return "".join(out)


def _changes(row: np.ndarray) -> np.ndarray:
    """Positions where the pixel color changes (first pixel of each
    new run), terminated by two sentinels at row width."""
    w = row.shape[0]
    d = np.flatnonzero(row[1:] != row[:-1]) + 1
    if row[0]:  # row starts black: change at 0 (white->black)
        d = np.concatenate(([0], d))
    return np.concatenate((d, [w, w]))


def encode_g4(ink: np.ndarray) -> bytes:
    """(h, w) bool array (True = black ink) → G4 bit stream, MSB
    first, zero-padded to a byte boundary (PDF ``EncodedByteAlign``
    false semantics: rows are NOT byte-aligned)."""
    ink = np.asarray(ink, bool)
    h, w = ink.shape
    if h == 0 or w == 0:
        return b""
    bits: List[str] = []
    ref_changes = np.array([w, w], np.int64)  # imaginary white row
    for y in range(h):
        cur = _changes(ink[y])
        a0 = -1
        color_white = True
        ci = 0  # index of a1 in cur
        while a0 < w:
            a1 = int(cur[ci]) if ci < cur.shape[0] else w
            # b1: first change on ref line > a0 with opposite color
            # to a0 — i.e. a change whose index parity matches ci
            bi = np.searchsorted(ref_changes[:-2], a0, side="right")
            if (bi & 1) != (ci & 1):
                bi += 1
            b1 = int(ref_changes[bi]) if bi < ref_changes.shape[0] \
                else w
            b2 = int(ref_changes[bi + 1]) \
                if bi + 1 < ref_changes.shape[0] else w
            if b2 < a1:
                bits.append(_MODE_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(_MODE_V[a1 - b1])
                a0 = a1
                ci += 1
                color_white = not color_white
            else:
                a2 = int(cur[ci + 1]) if ci + 1 < cur.shape[0] else w
                start = 0 if a0 < 0 else a0
                bits.append(_MODE_HORIZ)
                bits.append(_run_bits(a1 - start, color_white))
                bits.append(_run_bits(a2 - a1, not color_white))
                a0 = a2
                ci += 2
        ref_changes = cur
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


class _Bits:
    """MSB-first bit reader over bytes with prefix-code matching."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def take(self) -> str:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return "1" if bit else "0"


def _build_decode(tables: List[Dict[int, str]]) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for t in tables:
        for n, code in t.items():
            if code in out and out[code] != n:
                raise ValueError(f"MH code collision at {code}")
            out[code] = n
    return out


_WHITE_DECODE = _build_decode([_WHITE_TERM, _WHITE_MAKEUP,
                               _EXT_MAKEUP])
_BLACK_DECODE = _build_decode([_BLACK_TERM, _BLACK_MAKEUP,
                               _EXT_MAKEUP])
_MODE_DECODE = {**{v: ("v", k) for k, v in _MODE_V.items()},
                _MODE_PASS: ("p", 0), _MODE_HORIZ: ("h", 0)}
_MAX_MODE_LEN = max(len(k) for k in _MODE_DECODE)
_MAX_RUN_LEN = max(max(len(c) for c in _WHITE_DECODE),
                   max(len(c) for c in _BLACK_DECODE))


def _read_code(bits: _Bits, table: Dict[str, int],
               max_len: int):
    code = ""
    for _ in range(max_len):
        code += bits.take()
        if code in table:
            return table[code]
    raise ValueError(f"bad G4 code {code!r} at bit {bits.pos}")


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run: makeup chain + terminating code."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        n = _read_code(bits, table, _MAX_RUN_LEN)
        total += n
        if n < 64:  # terminating code (0..63) ends the run
            return total


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """G4 bit stream → (h, w) bool ink array (True = black);
    terminates after ``h`` rows like PDF ``CCITTFaxDecode /Rows``."""
    bits = _Bits(data)
    out = np.zeros((h, w), bool)
    ref_changes = np.array([w, w], np.int64)
    for y in range(h):
        changes: List[int] = []
        a0 = -1
        ci = 0
        color_white = True
        while a0 < w:
            kind, dv = _read_code(bits, _MODE_DECODE, _MAX_MODE_LEN)
            bi = np.searchsorted(ref_changes[:-2], a0, side="right")
            if (bi & 1) != (ci & 1):
                bi += 1
            b1 = int(ref_changes[bi]) if bi < ref_changes.shape[0] \
                else w
            b2 = int(ref_changes[bi + 1]) \
                if bi + 1 < ref_changes.shape[0] else w
            if kind == "p":
                a0 = b2
            elif kind == "v":
                a1 = b1 + dv
                if a1 < w:
                    changes.append(a1)
                a0 = a1
                ci += 1
                color_white = not color_white
            else:  # horizontal: two runs from a0
                start = 0 if a0 < 0 else a0
                r1 = _read_run(bits, color_white)
                r2 = _read_run(bits, not color_white)
                a1 = start + r1
                a2 = a1 + r2
                if a1 < w:
                    changes.append(a1)
                if a2 < w:
                    changes.append(a2)
                a0 = a2
                ci += 2
        # paint the row from its change positions
        pos = changes + [w, w]
        black = False
        prev = 0
        for p in pos[:-1]:
            if black:
                out[y, prev:p] = True
            black = not black
            prev = p
            if prev >= w:
                break
        ref_changes = np.array(pos, np.int64)
    return out
