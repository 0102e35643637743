"""Minimal TrueType ``cmap`` reader — the ToUnicode-less fallback.

Many real PDFs (especially pre-2010 generators) embed a Type0/
Identity-H font but omit ``/ToUnicode``; the show-string codes are
then glyph ids (GIDs) into the embedded font program, and the only
road back to text is the font's own ``cmap`` table (Unicode → GID),
inverted. That is what pdfminer/pdfium do; the reference never faces
this (it OCRs rasterized pages, ``/root/reference/src/ocr/
easyocr_client.py:26-58``), but a batch extractor over crawl PDFs
does.

Scope: the sfnt table directory and the two cmap subtable formats
that cover real fonts — format 4 (segment mapping to delta values,
the mandatory BMP table) and format 12 (segmented coverage, the
supplementary-plane table). Everything is bounds-checked and
exception-free by contract: a malformed font yields ``{}``, never a
raise (the extraction kernel's never-fail rule).
"""

from __future__ import annotations

import struct
from typing import Dict

# prefer a Unicode-capable encoding record: (platform, encoding)
# Windows BMP (3,1) and full (3,10), any Unicode platform (0,*)
_UNICODE_ENCODINGS = {(3, 1), (3, 10)}


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from(">H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _format4(b: bytes, off: int, out: Dict[int, str]) -> None:
    segx2 = _u16(b, off + 6)
    segs = segx2 // 2
    ends = off + 14
    starts = ends + segx2 + 2          # +2: reservedPad
    deltas = starts + segx2
    ranges = deltas + segx2
    budget = 0x20000  # valid BMP segments are disjoint (<= 65536
    # codes total); the budget bounds overlapping malicious segments
    for s in range(segs):
        if budget <= 0 or ranges + 2 * s + 2 > len(b):
            break
        end = _u16(b, ends + 2 * s)
        start = _u16(b, starts + 2 * s)
        if start > end or (start == 0xFFFF and end == 0xFFFF):
            continue
        end = min(end, start + budget - 1)
        budget -= end - start + 1
        delta = _u16(b, deltas + 2 * s)
        ro = _u16(b, ranges + 2 * s)
        for c in range(start, end + 1):
            if ro == 0:
                gid = (c + delta) & 0xFFFF
            else:
                # offset is relative to THIS rangeOffset word
                at = ranges + 2 * s + ro + 2 * (c - start)
                if at + 2 > len(b):
                    continue
                gid = _u16(b, at)
                if gid != 0:
                    gid = (gid + delta) & 0xFFFF
            if gid != 0 and gid not in out:
                out[gid] = chr(c)


def _format12(b: bytes, off: int, out: Dict[int, str]) -> None:
    ngroups = _u32(b, off + 12)
    at = off + 16
    budget = 0x110000  # total code points is the hard cap
    for _ in range(min(ngroups, 0x10000)):
        if at + 12 > len(b):
            break
        start, end, gid0 = struct.unpack_from(">III", b, at)
        at += 12
        if start > end or end >= 0x110000:
            continue
        n = min(end - start + 1, budget)
        budget -= n
        for k in range(n):
            gid = gid0 + k
            if gid != 0 and gid not in out:
                out[gid] = chr(start + k)
        if budget <= 0:
            break


def gid_to_unicode(font: bytes) -> Dict[int, str]:
    """GID → unicode char from the font's best ``cmap`` subtable
    (``{}`` for fonts without one, or malformed data)."""
    try:
        if len(font) < 12:
            return {}
        num_tables = _u16(font, 4)
        cmap_off = None
        for i in range(min(num_tables, 64)):
            rec = 12 + 16 * i
            if rec + 16 > len(font):
                break
            if font[rec:rec + 4] == b"cmap":
                cmap_off = _u32(font, rec + 8)
                break
        if cmap_off is None or cmap_off + 4 > len(font):
            return {}
        n_enc = _u16(font, cmap_off + 2)
        # pick the best subtable: prefer format 12, then a Unicode
        # format 4, then any format 4
        chosen: list = []  # (priority, subtable offset, format)
        for i in range(min(n_enc, 32)):
            rec = cmap_off + 4 + 8 * i
            if rec + 8 > len(font):
                break
            plat = _u16(font, rec)
            enc = _u16(font, rec + 2)
            sub = cmap_off + _u32(font, rec + 4)
            if sub + 2 > len(font):
                continue
            fmt = _u16(font, sub)
            is_uni = plat == 0 or (plat, enc) in _UNICODE_ENCODINGS
            if fmt == 12:
                chosen.append((0 if is_uni else 2, sub, 12))
            elif fmt == 4:
                chosen.append((1 if is_uni else 3, sub, 4))
        if not chosen:
            return {}
        _prio, sub, fmt = min(chosen)
        out: Dict[int, str] = {}
        if fmt == 12:
            _format12(font, sub, out)
        else:
            _format4(font, sub, out)
        return out
    except Exception:
        return {}
