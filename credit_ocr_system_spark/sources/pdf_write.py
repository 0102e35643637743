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

import hashlib
import struct
import zlib
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from ..kernel.pdf_text import _ENC_PAD, _rc4, ASCENT_FRAC, CHAR_W_FRAC

PAGE_W = 612.0
PAGE_H = 792.0
FONT_SIZE = 12.0
CHAR_W = CHAR_W_FRAC * FONT_SIZE  # layout-grid px per char

# (x, y_top, text, font_size)
Token = Tuple[float, float, str, float]


def _num(v: float) -> bytes:
    s = f"{v:.2f}".rstrip("0").rstrip(".")
    return (s or "0").encode("ascii")


def _escape_literal(text: str, enc: str = "cp1252") -> bytes:
    data = text.encode(enc, errors="replace")
    out = bytearray()
    for b in data:
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([b])
        elif 0x20 <= b <= 0x7E:
            out.append(b)
        else:
            out += b"\\%03o" % b
    return bytes(out)


def _show_fragment(text: str, cid: bool,
                   gid_map: Optional[Dict[str, int]] = None,
                   enc: str = "cp1252") -> bytes:
    """One show-string operand: literal for the simple font, a hex
    string of 2-byte Identity-H CIDs for the composite font (CID =
    BMP codepoint, or the font's own GID when ``gid_map`` is given —
    the ToUnicode-less shape where codes index the embedded font)."""
    if not cid:
        return b"(" + _escape_literal(text, enc) + b")"
    if gid_map is not None:
        hexs = "".join(f"{gid_map[ch]:04X}" for ch in text)
    else:
        hexs = "".join(f"{min(ord(ch), 0xFFFD):04X}" for ch in text)
    return b"<" + hexs.encode("ascii") + b">"


def _minimal_ttf(gid_map: Dict[str, int]) -> bytes:
    """Tiny sfnt carrying ONLY a cmap table (format 4, one segment
    per char + the 0xFFFF terminator) — enough for a parser's
    GID→Unicode inversion; not a renderable font."""
    import math

    items = sorted((ord(ch), gid) for ch, gid in gid_map.items())
    segs = [(c, c, (g - c) & 0xFFFF) for c, g in items]
    segs.append((0xFFFF, 0xFFFF, 1))  # terminator → gid 0
    sc = len(segs)
    pw = 1 << int(math.log2(sc))
    sub = struct.pack(">HHHHHHH", 4, 16 + 8 * sc, 0, sc * 2,
                      pw * 2, int(math.log2(pw)), sc * 2 - pw * 2)
    sub += b"".join(struct.pack(">H", e) for _s, e, _d in segs)
    sub += b"\x00\x00"  # reservedPad
    sub += b"".join(struct.pack(">H", s) for s, _e, _d in segs)
    sub += b"".join(struct.pack(">H", d) for _s, _e, d in segs)
    sub += b"\x00\x00" * sc  # idRangeOffset: all delta-mapped
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) \
        + sub
    padded = cmap + bytes(-len(cmap) % 4)
    cksum = sum(struct.unpack(">%dI" % (len(padded) // 4), padded)) \
        & 0xFFFFFFFF
    head = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    rec = b"cmap" + struct.pack(">III", cksum, 28, len(cmap))
    return head + rec + cmap


def _tounicode_cmap(chars: set) -> bytes:
    """Deterministic ToUnicode CMap for the identity CID assignment:
    printable ASCII as one incrementing ``bfrange``, every other used
    character as a ``bfchar`` entry — so the parser's range AND char
    paths are both exercised by generated corpora."""
    extra = sorted(c for c in chars
                   if not 0x20 <= ord(c) <= 0x7E and ord(c) <= 0xFFFD)
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS)"
        b" /Supplement 0 >> def",
        b"/CMapName /GraftToUni def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
        b"1 beginbfrange",
        b"<0020> <007E> <0020>",
        b"endbfrange",
    ]
    for at in range(0, len(extra), 100):  # <=100 entries per block
        block = extra[at:at + 100]
        lines.append(b"%d beginbfchar" % len(block))
        lines += [b"<%04X> <%04X>" % (ord(c), ord(c)) for c in block]
        lines.append(b"endbfchar")
    lines += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(lines)


def _content_stream(tokens: Sequence[Token], style: str,
                    cid: bool = False,
                    gid_map: Optional[Dict[str, int]] = None,
                    enc: str = "cp1252") -> bytes:
    """Text operators for one page.

    * ``tm``: absolute ``Tm`` placement per token, one ``Tj`` each;
    * ``td``: relative ``Td`` moves from the previous token;
    * ``tj``: absolute placement, strings split in half into a ``TJ``
      array with a 0-kern between the halves (exercises reassembly).

    With ``cid``, show strings are hex-coded 2-byte Identity-H CIDs.
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
        if style == "tj" and len(text) >= 2:
            half = len(text) // 2
            out.append(b"[" + _show_fragment(text[:half], cid,
                                             gid_map, enc)
                       + b" 0 "
                       + _show_fragment(text[half:], cid, gid_map,
                                        enc)
                       + b"] TJ")
        else:
            out.append(_show_fragment(text, cid, gid_map, enc)
                       + b" Tj")
    out.append(b"ET")
    return b"\n".join(out)


def _lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode-compatible compressor (EarlyChange=1, variable
    9–12-bit codes, CLEAR/EOD framing) — lets the generated corpus
    carry the legacy-writer filter the parser must read."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code <= 4095:
            table[wc] = next_code
            next_code += 1
        # EarlyChange=1: the decoder's table holds next_code-1 entries
        # after consuming the code just emitted, and it widens when
        # len + 1 >= 1<<width — so the encoder widens when
        # next_code >= 1<<width (NOT >, which is one code late and
        # desyncs against standard decoders).
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# content-stream /Filter variants a generated corpus can carry;
# each returns (encoded bytes, dict entry)
_STREAM_FILTERS = {
    "flate": lambda d: (zlib.compress(d, 6), b" /Filter /FlateDecode"),
    "lzw": lambda d: (_lzw_encode(d), b" /Filter /LZWDecode"),
    "ahx": lambda d: (d.hex().encode("ascii") + b">",
                      b" /Filter /ASCIIHexDecode"),
    "rl": lambda d: (_rl_encode(d), b" /Filter /RunLengthDecode"),
    "a85+flate": lambda d: (
        __import__("base64").a85encode(zlib.compress(d, 6)) + b"~>",
        b" /Filter [/ASCII85Decode /FlateDecode]"),
}


def _rl_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible: literal runs only (always valid,
    never smaller — fine, the point is exercising the decoder)."""
    out = bytearray()
    for at in range(0, len(data), 128):
        chunk = data[at:at + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)  # EOD
    return bytes(out)


import re as _re


def _rewrite_streams(emit: List[Tuple[int, bytes]], transform
                     ) -> List[Tuple[int, bytes]]:
    """Apply ``transform(objnum, stream_bytes) -> bytes`` to every
    stream object's data, fixing up /Length (AES grows streams)."""
    out: List[Tuple[int, bytes]] = []
    for num, body in emit:
        at = body.find(b"\nstream\n")
        if at >= 0:
            head = body[:at]
            end = body.rfind(b"\nendstream")
            data = transform(num, body[at + 8:end])
            head = _re.sub(rb"/Length\s+\d+",
                           b"/Length %d" % len(data), head, count=1)
            body = head + b"\nstream\n" + data + b"\nendstream"
        out.append((num, body))
    return out


def _encrypt_strings(out: List[Tuple[int, bytes]], transform
                     ) -> List[Tuple[int, bytes]]:
    """Encrypt the ``/V (...)`` literal in annotation dicts (the only
    strings this writer emits outside streams and the encrypt dict
    itself), re-emitting as hex strings. ``transform(num, raw) ->
    bytes`` is the same per-object cipher the streams use — T.32000
    encrypts strings and streams identically."""
    from ..kernel.pdf_text import _parse_literal_string
    fixed: List[Tuple[int, bytes]] = []
    for num, body in out:
        for key in (b"/V (", b"/URI ("):
            at = body.find(key)
            if at >= 0 and b"/Type /Annot" in body:
                k = len(key) - 1
                raw, end = _parse_literal_string(body, at + k)
                body = (body[:at] + key[:k] + b"<"
                        + transform(num, raw).hex().encode("ascii")
                        + b">" + body[end:])
        fixed.append((num, body))
    return fixed


def _encrypt_objects_aes256(emit: List[Tuple[int, bytes]], id0: bytes
                            ) -> Tuple[List[Tuple[int, bytes]],
                                       bytes, int]:
    """AES-256 (``/V 5 /R 6``) with empty user+owner passwords:
    /U//UE//O//OE per ISO 32000-2 Algorithms 8–10, /Perms encrypted
    with the file key, every stream AES-256-CBC'd (iv ‖ ciphertext,
    PKCS#7)."""
    from ..kernel.aes import aes_encrypt_block, cbc_encrypt
    from ..kernel.pdf_text import hash_2b
    file_key = (hashlib.md5(id0).digest()
                + hashlib.md5(id0 + b"2").digest())
    vsalt = hashlib.md5(id0 + b"v").digest()[:8]
    ksalt = hashlib.md5(id0 + b"k").digest()[:8]
    u_entry = hash_2b(b"", vsalt) + vsalt + ksalt
    ue_entry = cbc_encrypt(hash_2b(b"", ksalt), file_key,
                           iv=b"\x00" * 16, add_padding=False)[16:]
    ovsalt = hashlib.md5(id0 + b"ov").digest()[:8]
    oksalt = hashlib.md5(id0 + b"ok").digest()[:8]
    o_entry = hash_2b(b"", ovsalt, u_entry) + ovsalt + oksalt
    oe_entry = cbc_encrypt(hash_2b(b"", oksalt, u_entry), file_key,
                           iv=b"\x00" * 16, add_padding=False)[16:]
    p = -44
    perms = aes_encrypt_block(
        file_key, (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff" + b"Tadb" + id0[:4])

    def transform(num: int, data: bytes) -> bytes:
        iv = hashlib.md5(b"iv%d" % num + id0).digest()
        return cbc_encrypt(file_key, data, iv)

    out = _encrypt_strings(_rewrite_streams(emit, transform),
                           transform)
    enc_num = max(n for n, _ in out) + 1
    out.append((enc_num,
                b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
                b" /U <%s> /UE <%s> /O <%s> /OE <%s>"
                b" /P %d /Perms <%s> >>"
                % (u_entry.hex().encode("ascii"),
                   ue_entry.hex().encode("ascii"),
                   o_entry.hex().encode("ascii"),
                   oe_entry.hex().encode("ascii"), p,
                   perms.hex().encode("ascii"))))
    trailer_extra = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                     % (enc_num, id0.hex().encode("ascii"),
                        id0.hex().encode("ascii")))
    return out, trailer_extra, enc_num


def _encrypt_objects(emit: List[Tuple[int, bytes]], nkey: int,
                     r: int, v: int, id0: bytes,
                     aes: bool = False
                     ) -> Tuple[List[Tuple[int, bytes]], bytes, int]:
    """RC4- or AESV2-encrypt every stream's bytes (standard security
    handler, empty user AND owner passwords) and return the rewritten
    objects, the trailer additions, and the /Encrypt object number.

    /O is Algorithm 3, /U Algorithm 4 (R2) / 5 (R3–4); the file key
    is Algorithm 2 — the same derivation ``kernel/pdf_text`` runs,
    but implemented here from the writer's side of the contract.
    """
    # Algorithm 3: /O from the (empty→pad) owner password
    h = hashlib.md5(_ENC_PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:nkey]
    o_entry = _rc4(okey, _ENC_PAD)
    if r >= 3:
        for i in range(1, 20):
            o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)
    p = -44  # permissions: print only — any value, it feeds the key
    key = hashlib.md5(
        _ENC_PAD + o_entry + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nkey]).digest()
    key = key[:nkey]
    if r == 2:  # Algorithm 4
        u_entry = _rc4(key, _ENC_PAD)
    else:       # Algorithm 5
        u = hashlib.md5(_ENC_PAD + id0).digest()
        u = _rc4(key, u)
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u_entry = u + b"\x00" * 16

    def obj_key(num: int) -> bytes:
        tail = num.to_bytes(3, "little") + b"\x00\x00"
        if aes:
            tail += b"sAlT"
        return hashlib.md5(key + tail).digest()[:min(nkey + 5, 16)]

    if aes:
        from ..kernel.aes import cbc_encrypt

        def transform(num: int, data: bytes) -> bytes:
            iv = hashlib.md5(b"iv%d" % num + id0).digest()
            return cbc_encrypt(obj_key(num), data, iv)
    else:
        def transform(num: int, data: bytes) -> bytes:
            return _rc4(obj_key(num), data)

    out = _encrypt_strings(_rewrite_streams(emit, transform),
                           transform)
    enc_num = max(n for n, _ in out) + 1
    cf = (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
          b" /StmF /StdCF /StrF /StdCF") if aes else b""
    out.append((enc_num,
                b"<< /Filter /Standard /V %d /R %d /Length %d%s"
                b" /O <%s> /U <%s> /P %d >>"
                % (v, r, nkey * 8, cf,
                   o_entry.hex().encode("ascii"),
                   u_entry.hex().encode("ascii"), p)))
    trailer_extra = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                     % (enc_num, id0.hex().encode("ascii"),
                        id0.hex().encode("ascii")))
    return out, trailer_extra, enc_num


def _encode_scanned_jpeg(img) -> bytes:
    """Scanned-page JPEG bytes: quality 85 keeps 2-px glyph dots
    exactly recoverable after binarization (tests/test_ocr.py) while
    staying the real-world scanner default."""
    from ..kernel.jpeg import encode_jpeg
    return encode_jpeg(img, quality=85)


def build_pdf(pages: Iterable[Sequence[Token]], compress: bool = False,
              style: str = "tm", font: str = "simple",
              objstm: bool = False,
              stream_filter: Optional[str] = None,
              encrypt: Optional[str] = None,
              form_xobject: bool = False,
              annots: Optional[List[List[tuple]]] = None,
              links: Optional[List[List[str]]] = None,
              scanned: Optional[str] = None,
              scan_skew: float = 0.0,
              scan_specks: int = 0,
              scan_orient: int = 0,
              scan_inline: bool = False,
              scan_invert: bool = False,
              cid_tounicode: bool = True) -> bytes:
    """Assemble a complete one-font PDF from per-page token lists.

    ``font="cid"`` emits a composite (Type0 / Identity-H /
    CIDFontType2) font with a ToUnicode CMap and hex-coded 2-byte
    show strings — the post-2010 real-world PDF text shape — instead
    of the WinAnsi simple font.

    ``objstm=True`` packs every dictionary-only object (catalog, page
    tree, fonts, page dicts) into ONE ``/Type /ObjStm`` container —
    where PDF ≥1.5 writers put them — leaving only stream objects and
    the ObjStm itself at the top level. Object numbers (hence all
    references) are unchanged. The trailing classic xref covers the
    top-level objects via per-object subsections (a real 1.5 writer
    would emit an xref stream; the parsers this writer exists to
    exercise scan objects sequentially and never read the xref).

    ``stream_filter`` overrides ``compress`` for the page content
    streams: ``"flate"``, ``"lzw"``, ``"ahx"`` (ASCIIHex), ``"rl"``
    (RunLength), or the chain ``"a85+flate"`` — the filter spread of
    real-world writers.

    ``encrypt="rc4-40"`` / ``"rc4-128"`` emits a standard-security-
    handler file (empty user password): every stream RC4-encrypted
    under the Algorithm-2 file key, /O and /U computed per
    Algorithms 3–5, /Encrypt + /ID in the trailer.

    ``form_xobject=True`` moves each page's text into a
    ``/Subtype /Form`` XObject invoked from a tiny ``q /Fm1 Do Q``
    content stream — the letterhead/stamp/OCR-layer document shape.

    ``annots`` (one list per page of ``(x, y_top, w, h, value)``)
    emits filled AcroForm text fields: ``/Subtype /Widget``
    annotations carrying their value in ``/V`` — where form-based
    documents put their data instead of the content stream.

    ``scanned="flate"`` / ``"dct"`` emits an image-only document —
    the scanned-paper shape: each page's tokens are rasterized with
    the ``kernel/ocr.py`` atlas into a full-page greyscale image
    XObject (raw samples under ``/FlateDecode``, or genuine JPEG
    bytes from ``kernel/jpeg.py`` under ``/DCTDecode``) placed by a
    ``q W 0 0 H 0 0 cm /Im1 Do Q`` content stream; no text layer
    exists, so extraction must OCR. Incompatible with
    ``form_xobject`` (the image is the page). ``scan_skew`` (a
    ``kernel.ocr.SKEW_GRID`` value) and ``scan_specks`` add the
    scanner's artifacts — feeder tilt and dust — which the
    recognizer's deskew/despeckle pre-passes invert exactly (speck
    seed = page index, so pages differ deterministically);
    ``scan_orient`` (90/180/270) feeds the paper rotated, detected by
    the recognizer's orientation search.

    ``scan_inline=True`` embeds each page's raster as an INLINE image
    (``BI … ID <data> EI``, ISO 32000 §8.9.7 with the Table-93
    abbreviated keys ``/W /H /CS /G /BPC /F /Fl|/CCF|/DCT /DP``)
    inside the content stream instead of an image XObject — the shape
    fax-to-PDF converters and some office scanners emit. Same raster
    bytes, same placement ``cm``, so extraction output is identical
    to the XObject form.

    ``scan_invert=True`` stores the SAME raster with an inverted
    sample mapping: Flate/bilevel samples are complemented and the
    image carries ``/Decode [1 0]``; G4 keeps its bit stream and
    carries ``/BlackIs1 true`` plus ``/Decode [1 0]`` (the XOR of the
    two is the default polarity). Rendered page identical — pure
    encoding, exercising the decoder's sample-mapping parameters.
    DCT ignores the flag (lossy re-encode of an inverted plane would
    not round-trip bit-identically).
    """
    page_tokens = [list(p) for p in pages] or [[]]
    n_pages = len(page_tokens)
    cid = font == "cid"
    cid_gids: Optional[Dict[str, int]] = None
    if cid and not cid_tounicode:
        # ToUnicode-less fonts: show-string codes are GIDs into the
        # embedded font program; assign NON-identity GIDs so text
        # recovery genuinely requires inverting the TTF cmap
        used = sorted({ch for toks in page_tokens
                       for _x, _y, t, _fs in toks for ch in t})
        cid_gids = {ch: i + 1 for i, ch in enumerate(used)}
    type3 = font == "type3"
    # Type3 glyph set is known up front, so the /CharProcs dict and
    # per-glyph streams can reserve object numbers before the pages.
    # Chars dedupe through their cp1252 BYTE (collisions collapse to
    # '?', matching the simple font's replace-encode), so the glyph
    # count equals the code count.
    t3_chars: List[str] = sorted(
        {bytes([ch.encode("cp1252", "replace")[0]]).decode(
            "cp1252", "replace")
         for toks in page_tokens for _x, _y, t, _fs in toks
         for ch in t}) if type3 else []
    if scanned is not None:
        if scanned not in ("flate", "dct", "bilevel", "g4"):
            raise ValueError(f"unknown scanned mode {scanned!r}")
        if form_xobject:
            raise ValueError("scanned pages cannot use form XObjects")
    if stream_filter is None:
        stream_filter = "flate" if compress else None
    elif stream_filter not in _STREAM_FILTERS:
        raise ValueError(f"unknown stream_filter {stream_filter!r}")
    # object numbering: 1 catalog, 2 pages, 3 font, (cid: 4 descendant
    # font, 5 ToUnicode stream,) then per page i (0-based): page obj +
    # content obj pairs
    objs: List[bytes] = []
    first_page_obj = (7 if cid_gids is not None
                      else 6 if cid
                      else 5 + len(t3_chars) if type3
                      else 4)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (first_page_obj + 2 * i)
                     for i in range(n_pages))
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d"
                b" /MediaBox [0 0 %s %s] >>"
                % (n_pages, _num(PAGE_W), _num(PAGE_H)))
    if cid_gids is not None:
        # ToUnicode-less composite font: text is only recoverable by
        # inverting the embedded TrueType's cmap (/FontFile2)
        objs.append(b"<< /Type /Font /Subtype /Type0"
                    b" /BaseFont /GraftSans /Encoding /Identity-H"
                    b" /DescendantFonts [4 0 R] >>")
        objs.append(b"<< /Type /Font /Subtype /CIDFontType2"
                    b" /BaseFont /GraftSans /CIDSystemInfo"
                    b" << /Registry (Adobe) /Ordering (Identity)"
                    b" /Supplement 0 >> /DW 500"
                    b" /FontDescriptor 5 0 R >>")
        objs.append(b"<< /Type /FontDescriptor /FontName /GraftSans"
                    b" /Flags 4 /FontFile2 6 0 R >>")
        ttf = _minimal_ttf(cid_gids)
        objs.append(b"<< /Length %d >>\nstream\n" % len(ttf)
                    + ttf + b"\nendstream")
    elif cid:
        objs.append(b"<< /Type /Font /Subtype /Type0"
                    b" /BaseFont /GraftSans /Encoding /Identity-H"
                    b" /DescendantFonts [4 0 R] /ToUnicode 5 0 R >>")
        objs.append(b"<< /Type /Font /Subtype /CIDFontType2"
                    b" /BaseFont /GraftSans /CIDSystemInfo"
                    b" << /Registry (Adobe) /Ordering (Identity)"
                    b" /Supplement 0 >> /DW 500 >>")
        cmap = _tounicode_cmap(
            {ch for toks in page_tokens for _, _, t, _ in toks
             for ch in t})
        if compress:
            cmap = zlib.compress(cmap, 6)
            objs.append(b"<< /Length %d /Filter /FlateDecode >>"
                        b"\nstream\n" % len(cmap)
                        + cmap + b"\nendstream")
        else:
            objs.append(b"<< /Length %d >>\nstream\n" % len(cmap)
                        + cmap + b"\nendstream")
    elif type3:
        # Type3: glyphs are content streams under /CharProcs, codes
        # decode through /Encoding /Differences (uniXXXX names), and
        # /Widths are in GLYPH SPACE — /FontMatrix [0.01 …] maps them
        # to text space, so width 50 = 0.5 em (the default advance).
        # glyph names derive from the CODE's cp1252 meaning (not the
        # source char), so chars outside cp1252 collapse to the same
        # '?' the simple font's replace-encode produces — the two
        # fonts stay extraction-identical on ANY input
        codes = sorted({ch.encode("cp1252", "replace")[0]
                        for ch in t3_chars})
        by_code = [(c, bytes([c]).decode("cp1252", "replace"))
                   for c in codes]
        diffs = b" ".join(b"%d /uni%04X" % (c, ord(ch))
                          for c, ch in by_code)
        fc, lc = by_code[0][0], by_code[-1][0]
        widths = b" ".join(b"50" for _ in range(fc, lc + 1))
        objs.append(
            b"<< /Type /Font /Subtype /Type3"
            b" /FontMatrix [0.01 0 0 0.01 0 0]"
            b" /FontBBox [0 0 100 100] /CharProcs 4 0 R"
            b" /Encoding << /Type /Encoding /Differences ["
            + diffs + b"] >> /FirstChar %d /LastChar %d"
            b" /Widths [" % (fc, lc) + widths + b"] >>")
        objs.append(b"<< " + b" ".join(
            b"/uni%04X %d 0 R" % (ord(ch), 5 + i)
            for i, (_c, ch) in enumerate(by_code)) + b" >>")
        for _c, _ch in by_code:
            glyph = b"50 0 d0"  # advance-only glyph description
            objs.append(b"<< /Length %d >>\nstream\n" % len(glyph)
                        + glyph + b"\nendstream")
    elif font == "widths":
        # explicit per-glyph metrics: the CHAR_W average everywhere
        # EXCEPT a deterministic detuned band, so the parser's
        # /Widths path is load-bearing (not coincidentally equal to
        # the fallback) while the layout stays on a predictable grid
        w_entries = b" ".join(
            b"%d" % (500 if not 0x61 <= c <= 0x7A
                     else 460 + (c * 37) % 81)
            for c in range(32, 256))
        objs.append(b"<< /Type /Font /Subtype /Type1"
                    b" /BaseFont /Helvetica /FirstChar 32"
                    b" /Widths [" + w_entries + b"] >>")
    elif font == "macroman":
        # the legacy-Mac-generator shape: simple font whose bytes
        # decode through MacRomanEncoding, not WinAnsi
        objs.append(b"<< /Type /Font /Subtype /Type1"
                    b" /BaseFont /Helvetica"
                    b" /Encoding /MacRomanEncoding >>")
    else:
        objs.append(b"<< /Type /Font /Subtype /Type1"
                    b" /BaseFont /Helvetica >>")
    form_base = first_page_obj + 2 * n_pages  # form objs come after
    form_objs: List[bytes] = []
    # widget-annotation objects come after the forms; number them now
    # so page dicts can reference them
    page_annots = [list(a) for a in (annots or [])]
    page_annots += [[] for _ in range(n_pages - len(page_annots))]
    page_links = [list(l) for l in (links or [])]
    page_links += [[] for _ in range(n_pages - len(page_links))]
    annot_base = form_base + (n_pages if form_xobject else 0)
    annot_refs: List[List[int]] = []
    acc = annot_base
    for pa, pl in zip(page_annots, page_links):
        annot_refs.append(list(range(acc, acc + len(pa) + len(pl))))
        acc += len(pa) + len(pl)
    image_base = acc  # image XObjects (scanned mode) come last
    image_objs: List[bytes] = []
    annot_objs: List[bytes] = []
    for pa, pl in zip(page_annots, page_links):
        for x, y_top, w_box, h_box, value in pa:
            ry2 = PAGE_H - y_top
            annot_objs.append(
                b"<< /Type /Annot /Subtype /Widget /FT /Tx"
                b" /Rect [" + b" ".join(_num(v) for v in (
                    x, ry2 - h_box, x + w_box, ry2))
                + b"] /V (" + _escape_literal(value) + b") >>")
        for j, uri in enumerate(pl):
            # hyperlink hot area: ISO 32000-1 §12.5.6.5 Link
            # annotation with a §12.6.4.7 URI action
            x0 = 36 + 12 * j
            annot_objs.append(
                b"<< /Type /Annot /Subtype /Link"
                b" /Rect [" + b" ".join(_num(v) for v in (
                    x0, 8, x0 + 10, 18))
                + b"] /Border [0 0 0] /A << /S /URI /URI ("
                + _escape_literal(uri) + b") >> >>")
    for i, tokens in enumerate(page_tokens):
        if form_xobject:
            res = (b" /Resources << /Font << /F1 3 0 R >>"
                   b" /XObject << /Fm1 %d 0 R >> >>" % (form_base + i))
        elif scanned is not None and not scan_inline:
            res = (b" /Resources << /XObject << /Im1 %d 0 R >> >>"
                   % (image_base + i))
        elif scanned is not None:
            res = b""  # inline image: no XObject resource needed
        else:
            res = b" /Resources << /Font << /F1 3 0 R >> >>"
        if annot_refs[i]:
            res += (b" /Annots [" + b" ".join(
                b"%d 0 R" % r for r in annot_refs[i]) + b"]")
        objs.append(b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R%s >>"
                    % (first_page_obj + 1 + 2 * i, res))
        if scanned is not None:
            from ..kernel.ocr import render_tokens
            img = render_tokens(tokens, PAGE_W, PAGE_H,
                                skew=scan_skew, specks=scan_specks,
                                speck_seed=i, orient=scan_orient)
            ih, iw = img.shape
            bpc = 8
            invert = scan_invert and scanned != "dct"
            if scanned == "dct":
                idata = _encode_scanned_jpeg(img)
                ifilt = b" /Filter /DCTDecode"
            elif scanned == "g4":
                # the real-world scanned-PDF encoding: CCITT Group 4
                # (T.6 MMR) with pure 2D coding, PDF /K -1 semantics
                from ..kernel.g4 import encode_g4
                idata = encode_g4(img < 128)
                ifilt = (b" /Filter /CCITTFaxDecode /DecodeParms"
                         b" << /K -1 /Columns %d /Rows %d%s >>"
                         % (iw, ih,
                            b" /BlackIs1 true" if invert else b""))
                bpc = 1
            elif scanned == "bilevel":
                # fax-style 1-bit raster: 1 = white (DeviceGray max),
                # rows padded to byte boundaries, MSB first — 8x
                # smaller before Flate even sees it
                import numpy as np
                bits = np.packbits((img < 128) if invert
                                   else (img >= 128), axis=1)
                idata = zlib.compress(bits.tobytes(), 6)
                ifilt = b" /Filter /FlateDecode"
                bpc = 1
            else:
                samples = (255 - img) if invert else img
                idata = zlib.compress(samples.tobytes(), 6)
                ifilt = b" /Filter /FlateDecode"
            if invert:
                ifilt += b" /Decode [1 0]"
            if scan_inline:
                # abbreviated inline-image keys (ISO 32000 Table 93)
                if scanned == "dct":
                    ifl = b" /F /DCT"
                elif scanned == "g4":
                    ifl = (b" /F /CCF /DP << /K -1 /Columns %d"
                           b" /Rows %d%s >>"
                           % (iw, ih,
                              b" /BlackIs1 true" if invert else b""))
                else:
                    ifl = b" /F /Fl"
                if invert:
                    ifl += b" /D [1 0]"
                data = (b"q " + _num(PAGE_W) + b" 0 0 "
                        + _num(PAGE_H) + b" 0 0 cm"
                        + b" BI /W %d /H %d /CS /G /BPC %d%s ID\n"
                        % (iw, ih, bpc, ifl)
                        + idata + b"\nEI Q")
            else:
                image_objs.append(
                    b"<< /Type /XObject /Subtype /Image /Width %d"
                    b" /Height %d /ColorSpace /DeviceGray"
                    b" /BitsPerComponent %d /Length %d%s >>\nstream\n"
                    % (iw, ih, bpc, len(idata), ifilt)
                    + idata + b"\nendstream")
                data = (b"q " + _num(PAGE_W) + b" 0 0 " + _num(PAGE_H)
                        + b" 0 0 cm /Im1 Do Q")
        else:
            data = _content_stream(
                tokens, style, cid, cid_gids,
                "mac_roman" if font == "macroman" else "cp1252")
        if form_xobject:
            form_data = data
            data = b"q /Fm1 Do Q"
        if stream_filter is not None:
            data, filt = _STREAM_FILTERS[stream_filter](data)
        else:
            filt = b""
        objs.append(b"<< /Length %d%s >>" % (len(data), filt)
                    + b"\nstream\n" + data + b"\nendstream")
        if form_xobject:
            if stream_filter is not None:
                form_data, ffilt = _STREAM_FILTERS[stream_filter](
                    form_data)
            else:
                ffilt = b""
            form_objs.append(
                b"<< /Type /XObject /Subtype /Form"
                b" /BBox [0 0 %s %s] /Matrix [1 0 0 1 0 0]"
                b" /Length %d%s >>\nstream\n"
                % (_num(PAGE_W), _num(PAGE_H), len(form_data), ffilt)
                + form_data + b"\nendstream")
    objs.extend(form_objs)
    objs.extend(annot_objs)
    objs.extend(image_objs)

    if objstm:
        dict_items = [(i, b) for i, b in enumerate(objs, start=1)
                      if b"\nstream\n" not in b]
        emit = [(i, b) for i, b in enumerate(objs, start=1)
                if b"\nstream\n" in b]
        blob = b""
        pair_parts = []
        for num, body in dict_items:
            pair_parts.append(b"%d %d" % (num, len(blob)))
            blob += body + b"\n"
        header = b" ".join(pair_parts) + b"\n"
        data = header + blob
        first = len(header)
        filt = b""
        if compress:
            data = zlib.compress(data, 6)
            filt = b" /Filter /FlateDecode"
        stm_num = len(objs) + 1
        emit.append((stm_num, b"<< /Type /ObjStm /N %d /First %d"
                     b" /Length %d%s >>\nstream\n" %
                     (len(dict_items), first, len(data), filt)
                     + data + b"\nendstream"))
        total = stm_num + 1
        version = b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    else:
        emit = list(enumerate(objs, start=1))
        total = len(objs) + 1
        version = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"

    trailer_extra = b""
    if encrypt is not None:
        modes = {"rc4-40": (5, 2, 1), "rc4-128": (16, 3, 2),
                 "aesv2": (16, 4, 4)}
        if encrypt not in modes and encrypt != "aes256":
            raise ValueError(f"unknown encrypt mode {encrypt!r}")
        # deterministic /ID: digest of the plaintext objects
        id0 = hashlib.md5(b"".join(b for _n, b in emit)).digest()
        if encrypt == "aes256":
            emit, trailer_extra, enc_num = _encrypt_objects_aes256(
                emit, id0)
        else:
            nkey, r, v = modes[encrypt]
            emit, trailer_extra, enc_num = _encrypt_objects(
                emit, nkey, r, v, id0, aes=encrypt == "aesv2")
        total = enc_num + 1

    buf = bytearray(version)
    offsets: List[Tuple[int, int]] = []
    for num, body in emit:
        offsets.append((num, len(buf)))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(buf)
    if objstm or encrypt is not None:
        # sparse top-level numbering: one xref subsection per object
        buf += b"xref\n0 1\n0000000000 65535 f \n"
        for num, off in offsets:
            buf += b"%d 1\n%010d 00000 n \n" % (num, off)
    else:
        buf += b"xref\n0 %d\n" % (len(objs) + 1)
        buf += b"0000000000 65535 f \n"
        for _onum, off in offsets:
            buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (total, trailer_extra, xref_at))
    return bytes(buf)
