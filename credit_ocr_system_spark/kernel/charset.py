"""Charset sniffing + decoding for fetched HTML bytes.

Real Common-Crawl payloads are not all UTF-8: the legacy web ships
windows-1252 (usually labeled ``iso-8859-1``), national 8-bit code
pages, Shift_JIS/GBK/Big5, and the occasional UTF-16 with a BOM. A
text-first extraction engine must resolve the encoding BEFORE the DOM
parse — decoding everything as UTF-8 silently shreds every non-ASCII
byte of a 1252 page into replacement characters, which then poisons
dedup signatures, language ID, and the extracted text itself.

Precedence follows the WHATWG Encoding standard's legacy-web rules
(https://encoding.spec.whatwg.org/ — public spec):

1. **byte-order mark** (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
2. the **transport-layer charset** (the HTTP ``Content-Type``
   parameter) when the caller passes one — the WARC reader surfaces
   the stored envelope header for exactly this;
3. an ASCII **prescan of the first 1024 bytes** for
   ``<meta charset=…>`` / ``<meta http-equiv=content-type …>``
   (a ``utf-16`` label found here is read as ``utf-8``, per spec —
   a meta visible to an ASCII prescan cannot be 16-bit);
4. **strict UTF-8** when the whole payload validates;
5. **windows-1252** — the WHATWG default for unlabeled legacy
   content — with the five undefined bytes (0x81 0x8D 0x8F 0x90
   0x9D) decoded as their Latin-1 C1 controls, as the spec's index
   requires, so the fallback can NEVER raise.

Labels normalize through a WHATWG-style alias table (``latin1`` and
``iso-8859-1`` ARE windows-1252 on the web; ``gb2312`` is ``gbk``).
Unknown labels fall through to the next precedence step rather than
erroring — one bad header must never poison a batch (the same
contract as the extraction kernel's poison-document guard).

The reference pipeline never faces this problem: it rasterizes pages
and OCRs the pixels (reference ``src/ocr/easyocr_client.py:26-58``),
so byte encodings vanish at the image boundary. This module is the
text-first equivalent of that indifference: any legacy page decodes
to the same text a browser would render.
"""

from __future__ import annotations

import codecs
import re
from typing import Optional, Tuple

# WHATWG label → Python codec. Keys are lower-cased, stripped labels.
# iso-8859-1 / latin1 / ascii intentionally map to cp1252: on the web
# those labels mean windows-1252 (the C1 range carries curly quotes,
# the euro sign, em-dashes — not control characters).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "iso_8859-1": "cp1252",
    "latin1": "cp1252", "latin-1": "cp1252", "l1": "cp1252",
    "ascii": "cp1252", "us-ascii": "cp1252",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-5": "iso8859-5", "iso-8859-7": "iso8859-7",
    "iso-8859-9": "cp1254",  # WHATWG: iso-8859-9 IS windows-1254
    "iso-8859-15": "iso8859-15",
    "koi8-r": "koi8-r", "koi8": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk",
    "gb_2312": "gbk", "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr", "ks_c_5601-1987": "euc_kr",
}

# single regex covers both modern (<meta charset=X>) and legacy
# (<meta http-equiv=... content="text/html; charset=X">) forms — an
# honest approximation of the spec's prescan state machine, adequate
# because only the first 1024 bytes are scanned either way
_META_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-z0-9_.:\-]+)""",
    re.IGNORECASE)
_CT_RE = re.compile(r"""charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""")

_BOMS: Tuple[Tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def _whatwg_1252(err: UnicodeDecodeError):
    # the five bytes cp1252 leaves undefined decode as their Latin-1
    # (C1 control) values in the WHATWG windows-1252 index
    return (err.object[err.start:err.end].decode("latin-1"),
            err.end)


codecs.register_error("whatwg1252", _whatwg_1252)


def _lookup(label: Optional[str]) -> Optional[str]:
    if not label:
        return None
    return _LABELS.get(label.strip().lower())


def sniff_charset(payload: bytes,
                  content_type: str = "") -> Tuple[str, str]:
    """``(python_codec, source)`` for HTML ``payload``; ``source`` is
    one of ``bom | http | meta | utf-8 | fallback`` (the precedence
    step that decided). Pure function of its inputs."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec, "bom"
    m = _CT_RE.search(content_type or "")
    codec = _lookup(m.group(1) if m else None)
    if codec:
        return codec, "http"
    m = _META_RE.search(payload[:1024])
    codec = _lookup(m.group(1).decode("ascii", "replace") if m else None)
    if codec:
        # ASCII-visible meta cannot be 16-bit — spec says read utf-8
        if codec.startswith("utf-16"):
            codec = "utf-8"
        return codec, "meta"
    try:
        payload.decode("utf-8")
        return "utf-8", "utf-8"
    except UnicodeDecodeError:
        return "cp1252", "fallback"


def decode_html(payload: bytes, content_type: str = "") -> str:
    """Decode fetched HTML bytes to the text a browser would see.
    Never raises: cp1252 paths use the WHATWG index (Latin-1 C1
    fill), everything else replaces malformed sequences. A leading
    BOM is consumed, not emitted."""
    codec, source = sniff_charset(payload, content_type)
    if source == "bom":
        payload = payload[len({
            "utf-8": codecs.BOM_UTF8,
            "utf-16-le": codecs.BOM_UTF16_LE,
            "utf-16-be": codecs.BOM_UTF16_BE,
        }[codec]):]
    errors = "whatwg1252" if codec == "cp1252" else "replace"
    text = payload.decode(codec, errors=errors)
    # a page labeled utf-8 by meta/http may still open with a BOM
    return text[1:] if text[:1] == "\ufeff" else text
