"""Minimal deterministic ``%PDF-1.4`` writer (fixtures + generator).

Emits genuine, spec-shaped PDF files — catalog → page tree → per-page
FlateDecode-able content streams with ``Tf/Tm/Td/TJ/Tj`` text
operators, a cross-reference table and trailer — from positioned
tokens, entirely from the stdlib. Used by the synthetic page generator
(``sources/pages.py``) and the checked-in test fixtures so the real-PDF
parser (``kernel/pdf_text.py``) is exercised against authentic
``%PDF-1.x`` structure, not just our own token serialization.

Byte-deterministic: no clock, no randomness, fixed number formatting,
and ``zlib.compress(level=6)`` (stable for a given zlib build; the
checked-in fixture pins it).

Coordinates: callers pass kernel-style *top-down* ``y_top`` per token;
the writer converts to PDF's bottom-up user space such that the parser
round-trips ``y_top`` exactly: baseline ``= PAGE_H − y_top −
ASCENT_FRAC × fontsize``. Token x-advance in the layout grid should
use ``CHAR_W = CHAR_W_FRAC × FONT_SIZE`` px/char to match the parser's
width model.
"""

from __future__ import annotations

import zlib
from typing import Iterable, List, Sequence, Tuple

from ..kernel.pdf_text import ASCENT_FRAC, CHAR_W_FRAC

PAGE_W = 612.0
PAGE_H = 792.0
FONT_SIZE = 12.0
CHAR_W = CHAR_W_FRAC * FONT_SIZE  # layout-grid px per char

# (x, y_top, text, font_size)
Token = Tuple[float, float, str, float]


def _num(v: float) -> bytes:
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


def _escape_literal(text: str) -> bytes:
    data = text.encode("cp1252", errors="replace")
    out = bytearray()
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([b])
        elif 0x20 <= b <= 0x7E:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def _content_stream(tokens: Sequence[Token], style: str) -> bytes:
    """Text operators for one page.

    * ``tm``: absolute ``Tm`` placement per token, one ``Tj`` each;
    * ``td``: relative ``Td`` moves from the previous token;
    * ``tj``: absolute placement, strings split in half into a ``TJ``
      array with a 0-kern between the halves (exercises reassembly).
    """
    out: List[bytes] = [b"BT"]
    cur_fs = None
    prev_bx, prev_by = 0.0, 0.0
    for x, y_top, text, fs in tokens:
        if fs != cur_fs:
            out.append(b"/F1 " + _num(fs) + b" Tf")
            cur_fs = fs
        baseline = PAGE_H - y_top - ASCENT_FRAC * fs
        if style == "td":
            out.append(_num(x - prev_bx) + b" " + _num(baseline - prev_by)
                       + b" Td")
            prev_bx, prev_by = x, baseline
        else:
            out.append(b"1 0 0 1 " + _num(x) + b" " + _num(baseline)
                       + b" Tm")
        esc = _escape_literal(text)
        if style == "tj" and len(text) >= 2:
            half = len(text) // 2
            out.append(b"[(" + _escape_literal(text[:half]) + b") 0 ("
                       + _escape_literal(text[half:]) + b")] TJ")
        else:
            out.append(b"(" + esc + b") Tj")
    out.append(b"ET")
    return b"\n".join(out)


def build_pdf(pages: Iterable[Sequence[Token]], compress: bool = False,
              style: str = "tm") -> bytes:
    """Assemble a complete one-font PDF from per-page token lists."""
    page_tokens = [list(p) for p in pages] or [[]]
    n_pages = len(page_tokens)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i (0-based): 4+2i page, 5+2i content
    objs: List[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d"
                b" /MediaBox [0 0 %s %s] >>"
                % (n_pages, _num(PAGE_W), _num(PAGE_H)))
    objs.append(b"<< /Type /Font /Subtype /Type1"
                b" /BaseFont /Helvetica >>")
    for i, tokens in enumerate(page_tokens):
        objs.append(b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R"
                    b" /Resources << /Font << /F1 3 0 R >> >> >>"
                    % (5 + 2 * i))
        data = _content_stream(tokens, style)
        if compress:
            data = zlib.compress(data, 6)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: List[int] = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(buf)
