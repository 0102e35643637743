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


# --- decoding: flat canonical-prefix lookup tables ---------------------------
#
# The codes are prefix-free, so a single W-bit window lookup resolves
# any code of length <= W in one table index instead of a per-bit walk:
# every W-bit value whose leading bits equal a code maps to
# (decoded, code_length). One lookup per code, not per bit.


def _flat_lut(entries: List[Tuple[str, object]], width: int) -> list:
    lut: list = [None] * (1 << width)
    for code, val in entries:
        ln = len(code)
        base = int(code, 2) << (width - ln)
        for i in range(1 << (width - ln)):
            if lut[base + i] is not None:
                raise ValueError(f"MH code collision at {code}")
            lut[base + i] = (val, ln)
    return lut


def _run_entries(term: Dict[int, str],
                 makeup: Dict[int, str]) -> List[Tuple[str, object]]:
    ent = [(c, n) for n, c in term.items()]
    ent += [(c, n) for n, c in makeup.items()]
    ent += [(c, n) for n, c in _EXT_MAKEUP.items()]
    return ent


_MAX_RUN_LEN = max(len(c) for c in
                   (list(_WHITE_TERM.values()) +
                    list(_WHITE_MAKEUP.values()) +
                    list(_BLACK_TERM.values()) +
                    list(_BLACK_MAKEUP.values()) +
                    list(_EXT_MAKEUP.values())))
_MAX_MODE_LEN = max(len(c) for c in
                    (list(_MODE_V.values()) +
                     [_MODE_PASS, _MODE_HORIZ]))
_WHITE_LUT = _flat_lut(_run_entries(_WHITE_TERM, _WHITE_MAKEUP),
                       _MAX_RUN_LEN)
_BLACK_LUT = _flat_lut(_run_entries(_BLACK_TERM, _BLACK_MAKEUP),
                       _MAX_RUN_LEN)
_MODE_LUT = _flat_lut([(c, ("v", dv)) for dv, c in _MODE_V.items()] +
                      [(_MODE_PASS, ("p", 0)),
                       (_MODE_HORIZ, ("h", 0))], _MAX_MODE_LEN)


def decode_g4(data: bytes, w: int, h: int) -> np.ndarray:
    """G4 bit stream → (h, w) bool ink array (True = black);
    terminates after ``h`` rows like PDF ``CCITTFaxDecode /Rows``."""
    from bisect import bisect_right

    # 3 guard bytes let the window peek run past the final code; the
    # loop structure never *consumes* padding bits (row h terminates).
    buf = bytes(data) + b"\x00\x00\x00"
    nbits = len(data) * 8
    pos = 0
    mode_lut, run_w, run_b = _MODE_LUT, _WHITE_LUT, _BLACK_LUT
    mode_width, run_width = _MAX_MODE_LEN, _MAX_RUN_LEN
    out = np.zeros((h, w), bool)
    ref: List[int] = [w, w]  # imaginary all-white reference row
    for y in range(h):
        changes: List[int] = []
        a0 = -1
        ci = 0
        color_white = True
        while a0 < w:
            if pos >= nbits:
                raise ValueError(f"G4 stream truncated at bit {pos}")
            byte_i = pos >> 3
            window = (((buf[byte_i] << 16) | (buf[byte_i + 1] << 8)
                       | buf[byte_i + 2])
                      >> (24 - (pos & 7) - mode_width)) \
                & ((1 << mode_width) - 1)
            hit = mode_lut[window]
            if hit is None:
                raise ValueError(f"bad G4 mode code at bit {pos}")
            (kind, dv), ln = hit
            pos += ln
            bi = bisect_right(ref, a0, 0, len(ref) - 2)
            if (bi & 1) != (ci & 1):
                bi += 1
            b1 = ref[bi] if bi < len(ref) else w
            b2 = ref[bi + 1] if bi + 1 < len(ref) else w
            if kind == "p":
                a0 = b2
            elif kind == "v":
                a1 = b1 + dv
                if a1 < w:
                    changes.append(a1)
                a0 = a1
                ci += 1
                color_white = not color_white
            else:  # horizontal: two complete runs from a0
                start = 0 if a0 < 0 else a0
                runs = [0, 0]
                for k, white in ((0, color_white),
                                 (1, not color_white)):
                    lut = run_w if white else run_b
                    total = 0
                    while True:
                        if pos >= nbits:
                            raise ValueError(
                                f"G4 stream truncated at bit {pos}")
                        byte_i = pos >> 3
                        window = (((buf[byte_i] << 16)
                                   | (buf[byte_i + 1] << 8)
                                   | buf[byte_i + 2])
                                  >> (24 - (pos & 7) - run_width)) \
                            & ((1 << run_width) - 1)
                        hit = lut[window]
                        if hit is None:
                            raise ValueError(
                                f"bad G4 run code at bit {pos}")
                        n, ln = hit
                        pos += ln
                        total += n
                        if n < 64:  # terminating code ends the run
                            break
                    runs[k] = total
                a1 = start + runs[0]
                a2 = a1 + runs[1]
                if a1 < w:
                    changes.append(a1)
                if a2 < w:
                    changes.append(a2)
                a0 = a2
                ci += 2
        # paint the row from its change positions
        changes.append(w)
        changes.append(w)
        black = False
        prev = 0
        for p in changes[:-1]:
            if black:
                out[y, prev:p] = True
            black = not black
            prev = p
            if prev >= w:
                break
        ref = changes
    return out
