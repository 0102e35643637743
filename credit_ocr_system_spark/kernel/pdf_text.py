"""Real ``%PDF-1.x`` text extraction — the digital-text fallback.

The reference rasterizes genuine PDFs at dpi=150 and runs EasyOCR over
the page images (``/root/reference/src/ocr/easyocr_client.py:26-58``).
OCR models aren't in this container (by design), but a PDF that carries
*digital* text needs no OCR at all: its content streams already hold
positioned show-text operators. This module parses that subset with
the stdlib only (``re`` + ``zlib``) and emits the same element records
the OCR front end produces (``easyocr_client.py:60-83``) — so genuine
``%PDF-1.x`` payloads flow through the identical row/merge/pair kernel
instead of silently yielding zero elements.

Supported (the text-bearing core of ISO 32000):

* object scan with direct-``/Length`` streams (fallback: scan to
  ``endstream``); full ``/Filter`` chains over Flate (``zlib``), LZW
  (from scratch, EarlyChange honored), ASCIIHex, ASCII85, RunLength,
  with PNG row predictors (Sub/Up/Average/Paeth) via
  ``/DecodeParms`` — image-only filters (DCT/JPX/CCITT) carry no
  text and contribute nothing;
* page tree walk (``/Catalog → /Pages → /Kids``, nested, cycle-safe)
  with ``/MediaBox`` inheritance through ``/Parent``;
* text operators ``BT/ET  Tf  Tm  Td  TD  TL  T*  Tj  TJ  '  "``,
  literal strings (nesting, escapes, octal, line continuation) and
  hex strings, WinAnsi (cp1252) or MacRoman simple-font decoding
  (``/Encoding /MacRomanEncoding`` as a name or ``/BaseEncoding``);
* Type3 glyph-stream fonts: ``/Differences`` code→glyph-name
  decoding and GLYPH-SPACE ``/Widths`` mapped to text space through
  ``/FontMatrix`` (simple fonts use the fixed 1/1000 em);
* composite (Type0) fonts with ``/Encoding /Identity-H``: per-page
  ``/Resources → /Font`` resolution (inline dict or reference,
  inherited through ``/Parent``), 2-byte CID codes decoded through
  the font's ``/ToUnicode`` CMap (``bfchar``, ``bfrange`` in both the
  increment and array forms) — the dominant post-2010 real-world PDF
  text encoding; ToUnicode-less fonts recover text by inverting the
  embedded TrueType's cmap (``kernel/ttf.py``, formats 4 and 12);
  per-CID advances honor the descendant CIDFont's ``/W`` (both
  ISO 32000 §9.7.4.3 forms) with the ``/DW`` default.

* encrypted files under the standard security handler with RC4
  (``/V`` 1–2, ``/R`` 2–3) and an empty user password — the common
  "owner locked printing, anyone can read" web PDF: Algorithm-2 key
  derivation + per-object RC4 over stream bytes (AES variants
  contribute nothing rather than garbage);

* form XObjects: ``Do`` executes a ``/Subtype /Form`` stream with its
  own ``/Resources`` fonts merged over the caller's, under the
  graphics state (``q``/``Q``/``cm``) and the form ``/Matrix``
  reduced to axis-aligned scale + translate (rotated text is out of
  the geometry model); nesting bounded;

* object streams (``/Type /ObjStm``): contained objects (catalog,
  page tree, font dicts — where PDF ≥1.5 writers put them) are
  expanded from the decompressed stream via its ``/N``/``/First``
  pair table; the document is scanned sequentially, so no xref
  stream parse is needed;

* scanned (image-only) pages: a page whose content yields no text
  elements dispatches to the OCR branch (``_ocr_page_images`` →
  ``kernel/ocr.py``) over its placed ``/Subtype /Image`` XObjects
  (8-bit DeviceGray raw/Flate samples or DCTDecode JPEG).

Not supported (returns whatever text the supported subset yields,
never raises): CID encodings other than Identity-H (predefined CJK
CMaps), user-password-protected files (empty-user-password RC4,
AESV2 and AES-256/R6 all decrypt — see the security-handler section
below), and rotated or skewed text frames.

Geometry model: simple fonts that carry ``/FirstChar`` + ``/Widths``
advance by their real per-glyph metrics (1/1000-em units), and
``/Encoding /Differences`` overrides decode through algorithmic glyph
names (single-char, ``uniXXXX``, ``uXXXX``) plus an Adobe-Glyph-List
subset. Fonts without metrics use the classic average-width
approximation ``CHAR_W_FRAC × fontsize`` per glyph — Helvetica's mean
AW is ~0.513 em — and the bbox is ``ascent 0.8 em`` above /
``descent 0.2 em`` below the baseline. PDF user space is bottom-up; elements convert to the
kernel's top-down page coordinates via the page's MediaBox height.
Confidence is 1.0: digital text has no recognition uncertainty.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

CHAR_W_FRAC = 0.5
ASCENT_FRAC = 0.8
DEFAULT_FONT_SIZE = 12.0
DEFAULT_MEDIABOX = (0.0, 0.0, 612.0, 792.0)
_MAX_PAGES = 10_000

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(?:\r\n|\n|\r)")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+"
    rb"([\d.+-]+)\s+([\d.+-]+)\s*\]")


def _scan_objects(payload: bytes, decrypt=None,
                  from_objstm: Optional[set] = None
                  ) -> Dict[int, Tuple[bytes, Optional[bytes]]]:
    """obj number → (dict bytes, raw stream bytes or None).

    ``decrypt`` (from :func:`_make_decryptor`) is applied to stream
    bytes — the only encrypted material this parser reads — before
    storage and ObjStm expansion; XRef streams are never encrypted
    (T.32000 §7.5.8.2) and are passed through.

    Sequential scan so byte patterns *inside* stream data (compressed
    bytes can contain ``N 0 obj`` or ``endobj``) never spawn phantom
    objects: after a stream, scanning resumes past its ``endstream``.

    Duplicate object numbers resolve by FILE ORDER, last wins — the
    incremental-update convention: an updated PDF appends the new
    revision of an object (top-level or inside a later ``/ObjStm``,
    expanded inline here at its scan position) after the original,
    and readers must see the newest. (Exact semantics would need the
    xref chain; file-order last-wins is the standard tolerant-scanner
    approximation.)
    """
    objs: Dict[int, Tuple[bytes, Optional[bytes]]] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        num = int(m.group(1))
        gen = int(m.group(2))
        start = m.end()
        end_obj = payload.find(b"endobj", start)
        if end_obj < 0:
            end_obj = len(payload)
        sm = _STREAM_RE.search(payload, start, end_obj)
        if sm is None:
            objs[num] = (payload[start:end_obj], None)
            pos = end_obj + len(b"endobj")
            continue
        head = payload[start:sm.start()]
        data_start = sm.end()
        lm = _LENGTH_RE.search(head)
        if lm is not None:
            data_end = data_start + int(lm.group(1))
            if data_end > len(payload):
                data_end = len(payload)
            stream = payload[data_start:data_end]
            end_stream = payload.find(b"endstream", data_end)
        else:
            end_stream = payload.find(b"endstream", data_start)
            stream = payload[data_start:
                             end_stream if end_stream >= 0 else None]
            if stream.endswith(b"\r\n"):
                stream = stream[:-2]
            elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                stream = stream[:-1]
        if decrypt is not None \
                and not re.search(rb"/Type\s*/XRef\b", head):
            stream = decrypt(num, gen, stream)
        objs[num] = (head, stream)
        if re.search(rb"/Type\s*/ObjStm\b", head):
            _expand_objstm(objs, head, stream, from_objstm)
        resume = end_stream + len(b"endstream") if end_stream >= 0 \
            else len(payload)
        pos = max(resume, end_obj + len(b"endobj"))
    return objs


def _expand_objstm(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                   head: bytes, stream: bytes,
                   from_objstm: Optional[set] = None) -> None:
    """Expand one ``/Type /ObjStm`` container into ``objs``: the
    stream is ``N`` (objnum, offset) integer pairs up to ``/First``,
    then the serialized objects back-to-back (dict objects only —
    T.32000 forbids streams inside an ObjStm). Called at the
    container's scan position, so contained objects participate in
    the same file-order last-wins resolution as top-level ones."""
    data = _decode_stream(head, stream)
    m_n = re.search(rb"/N\s+(\d+)", head)
    m_f = re.search(rb"/First\s+(\d+)", head)
    if not data or m_n is None or m_f is None:
        return
    first = int(m_f.group(1))
    pairs = re.findall(rb"(\d+)\s+(\d+)",
                       data[:first])[:int(m_n.group(1))]
    for k, (onum, off) in enumerate(pairs):
        start = first + int(off)
        end = (first + int(pairs[k + 1][1])
               if k + 1 < len(pairs) else len(data))
        if 0 <= start <= end:
            objs[int(onum)] = (data[start:end], None)
            if from_objstm is not None:
                # strings in these dicts were decrypted with the
                # container — never re-decrypt them individually
                from_objstm.add(int(onum))


def _ascii_hex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    digits = re.sub(rb"[^0-9A-Fa-f]", b"",
                    data[:end] if end >= 0 else data)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _ascii_85_decode(data: bytes) -> bytes:
    import base64
    data = re.sub(rb"\s+", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    return base64.a85decode(data, adobe=False)


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i + 1:i + 2 + length]
            i += 2 + length
        else:
            if i + 1 < n:
                out += data[i + 1:i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (T.32000 §7.4.4): variable 9–12-bit codes,
    CLEAR=256, EOD=257; ``EarlyChange`` (default 1) widens the code
    one entry before the table fills."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: Optional[bytes] = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return bytes(out)  # corrupt
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return bytes(out)  # corrupt
            out += entry
            prev = entry
            # EarlyChange=1 (the default): widen one code EARLY, i.e.
            # the first 10-bit code is read once the table holds 511
            # entries — the pdfminer/pdf.js/Acrobat convention. The
            # old `+ early_change - 1` widened one code late, so every
            # real-world stream desynced at the first width
            # transition (masked by the in-repo encoder sharing the
            # shifted convention; both now match the ecosystem).
            if len(table) + early_change >= (1 << width) \
                    and width < 12:
                width += 1
    return bytes(out)


def _png_unpredict(data: bytes, columns: int, colors: int,
                   bpc: int) -> bytes:
    """Reverse PNG row predictors (type tag per row) — /Predictor
    >= 10 on Flate/LZW streams (xref streams, some ObjStms). The
    per-row predictor math delegates to ``codecs._unfilter_row`` (one
    maintained copy of Sub/Up/Average/Paeth in the package); a
    corrupt type tag passes the row through unfiltered instead of
    raising — this surface never raises on dirty input."""
    import numpy as np

    from .codecs import _unfilter_row

    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prior = np.zeros(rowlen, np.uint8)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ftype = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        row += bytes(rowlen - len(row))
        i += 1 + rowlen
        filt = np.frombuffer(bytes(row), np.uint8)
        prior = _unfilter_row(ftype if ftype <= 4 else 0,
                              filt, prior, bpp)
        out += prior.tobytes()
    return bytes(out)


_FILTER_LIST_RE = re.compile(rb"/Filter\s*(?:\[((?:[^\]])*)\]|/([A-Za-z0-9]+))")
_PARMS_INT = {b"Predictor": 1, b"Columns": 1, b"Colors": 1,
              b"BitsPerComponent": 8, b"EarlyChange": 1}


def _decode_parms(head: bytes, count: int) -> List[Dict[bytes, int]]:
    """One params dict per filter in the chain (missing → defaults).
    Handles a single inline ``<< >>`` or an array of dict/null."""
    defaults = dict(_PARMS_INT)
    m = re.search(rb"/(?:DecodeParms|DP)\s*(<<|\[)", head)
    if m is None:
        return [dict(defaults) for _ in range(count)]
    parms: List[Dict[bytes, int]] = []
    if m.group(1) == b"<<":
        blobs = [_balanced_dict(head, m.start(1))]
    else:
        seg = head[m.start(1):]
        close = seg.find(b"]")
        seg = seg[:close if close >= 0 else None]
        # top-level entries only (a nested dict inside an entry must
        # not spawn a phantom chain slot); ``null`` keeps its slot so
        # the chain stays aligned — depth scan
        depth = 0
        blobs = []
        for dm in re.finditer(rb"<<|>>|\bnull\b", seg):
            tok = dm.group(0)
            if tok == b"<<":
                if depth == 0:
                    blobs.append(_balanced_dict(seg, dm.start()))
                depth += 1
            elif tok == b">>":
                depth -= 1
            elif depth == 0:  # null placeholder
                blobs.append(b"")
    for blob in blobs:
        d = dict(defaults)
        for key, default in _PARMS_INT.items():
            km = re.search(rb"/" + key + rb"\s+(\d+)", blob)
            if km is not None:
                d[key] = int(km.group(1))
        parms.append(d)
    while len(parms) < count:
        parms.append(dict(defaults))
    return parms


def _filter_names(head: bytes) -> List[bytes]:
    """The /Filter chain's names, in application order ([] if none)."""
    m = _FILTER_LIST_RE.search(head)
    if m is None:
        return []
    if m.group(1) is not None:
        return re.findall(rb"/([A-Za-z0-9]+)", m.group(1))
    return [m.group(2)]


def _apply_filter_chain(names: List[bytes], parms: List[Dict],
                        data: bytes) -> Optional[bytes]:
    """Run ``data`` through the byte-level filters in order, applying
    PNG predictors per each filter's /DecodeParms. ``None`` on an
    unsupported filter or corrupt data."""
    try:
        for name, parm in zip(names, parms):
            if name in (b"FlateDecode", b"Fl"):
                data = zlib.decompress(data)
            elif name in (b"LZWDecode", b"LZW"):
                data = _lzw_decode(data, parm[b"EarlyChange"])
            elif name in (b"ASCIIHexDecode", b"AHx"):
                data = _ascii_hex_decode(data)
            elif name in (b"ASCII85Decode", b"A85"):
                data = _ascii_85_decode(data)
            elif name in (b"RunLengthDecode", b"RL"):
                data = _run_length_decode(data)
            else:
                return None  # unsupported filter
            if name in (b"FlateDecode", b"Fl", b"LZWDecode", b"LZW") \
                    and parm[b"Predictor"] >= 10:
                data = _png_unpredict(data, parm[b"Columns"],
                                      parm[b"Colors"],
                                      parm[b"BitsPerComponent"])
    except Exception:
        return None
    return data


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    """Run the stream through its full ``/Filter`` chain. Supported:
    Flate, LZW (+ PNG predictors via /DecodeParms), ASCIIHex,
    ASCII85, RunLength. An unsupported filter in the chain
    (DCTDecode, JPXDecode, CCITTFaxDecode, Crypt) contributes
    nothing — tolerant-by-contract, like the rest of the parser."""
    names = _filter_names(head)
    if not names:
        return stream
    data = _apply_filter_chain(names, _decode_parms(head, len(names)),
                               stream)
    return b"" if data is None else data


# --- standard security handler (RC4) --------------------------------------

_ENC_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _enc_string(data: bytes, key: bytes) -> Optional[bytes]:
    """The string value under ``key`` in an encrypt dict — literal or
    hex form."""
    m = re.search(key + rb"\s*(\(|<)", data)
    if m is None:
        return None
    if m.group(1) == b"(":
        s, _ = _parse_literal_string(data, m.start(1))
    else:
        s, _ = _parse_hex_string(data, m.start(1))
    return s


def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash): iterated
    SHA-256/384/512 selected by an AES-128-CBC round."""
    import hashlib
    from .aes import cbc_encrypt
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = cbc_encrypt(k[:16], k1, iv=k[16:32],
                        add_padding=False)[16:]   # strip the iv echo
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[e[15] % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def _make_decryptor(payload: bytes):
    """``fn(objnum, gennum, stream_bytes) -> bytes`` for a file using
    the standard security handler with an EMPTY user password — the
    overwhelmingly common "owner locked printing, anyone can read"
    web PDF. Covers RC4 (``/V`` 1–2, ``/R`` 2–3), crypt-filter files
    (``/V 4``: ``/CFM /AESV2`` or ``/V2``), and AES-256 (``/V 5``,
    ``/R`` 5–6) via the from-scratch AES in ``kernel/aes.py``.
    Password-protected files (the R6 /U validation fails, or a
    non-Standard handler) return a constant ``b""`` mapper so they
    contribute nothing instead of garbage. Returns ``None`` when the
    file is not encrypted.

    RC4/AESV2 key derivation is T.32000 §7.6.3.3 Algorithm 2 (md5
    over pad + /O + /P little-endian + first /ID element, 50 re-hash
    rounds at R>=3, FFFFFFFF appended when /EncryptMetadata false);
    the per-object key is Algorithm 1 (md5 of key + objnum(3 LE) +
    gen(2 LE) [+ ``sAlT`` for AES], truncated to min(n+5, 16)).
    AES-256 recovers the file key from /U + /UE (Algorithm 2.A, with
    the 2.B hash at R6), and uses it directly per stream.
    """
    import hashlib
    m = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", payload)
    if m is None:
        return None
    enc_num, enc_gen = int(m.group(1)), int(m.group(2))
    nothing = lambda n, g, b: b""  # noqa: E731 — undecryptable
    om = re.search(rb"(?<![0-9])%d\s+%d\s+obj\b" % (enc_num, enc_gen),
                   payload)
    if om is None:
        return nothing
    head = payload[om.end():payload.find(b"endobj", om.end())]
    if not re.search(rb"/Filter\s*/Standard\b", head):
        return nothing
    vm = re.search(rb"/V\s+(\d+)", head)
    rm = re.search(rb"/R\s+(\d+)", head)
    v = int(vm.group(1)) if vm else 0
    r = int(rm.group(1)) if rm else 2

    if v == 5 and r in (5, 6):
        from .aes import cbc_decrypt
        u_entry = _enc_string(head, rb"/U")
        ue_entry = _enc_string(head, rb"/UE")
        if u_entry is None or len(u_entry) < 48 or ue_entry is None:
            return nothing
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 6:
            uhash = hash_2b(b"", vsalt)
            ikey = hash_2b(b"", ksalt)
        else:  # R5 (deprecated Adobe extension): single SHA-256
            uhash = hashlib.sha256(vsalt).digest()
            ikey = hashlib.sha256(ksalt).digest()
        if uhash != u_entry[:32]:
            return nothing  # non-empty user password: locked for real
        file_key = cbc_decrypt(ikey, ue_entry[:32], iv=b"\x00" * 16,
                               strip_padding=False)

        def decrypt_v5(num: int, gen: int, data: bytes) -> bytes:
            if num == enc_num:
                return data
            return cbc_decrypt(file_key, data)

        return decrypt_v5

    aes = False
    if v == 4:
        # crypt filters: the default stream filter's method decides
        cfm = re.search(rb"/CFM\s*/(AESV2|V2)\b", head)
        if cfm is None or r != 4:
            return nothing
        aes = cfm.group(1) == b"AESV2"
    elif v not in (1, 2) or r not in (2, 3):
        return nothing
    o_entry = _enc_string(head, rb"/O")
    pm = re.search(rb"/P\s+(-?\d+)", head)
    if o_entry is None or pm is None:
        return nothing
    lm = re.search(rb"/Length\s+(\d+)", head)
    nkey = 5 if r == 2 else (int(lm.group(1)) // 8 if lm else 5)
    idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", payload)
    id0 = bytes.fromhex(re.sub(rb"\s+", b"", idm.group(1)).decode(
        "ascii")) if idm else b""
    p_le = (int(pm.group(1)) & 0xFFFFFFFF).to_bytes(4, "little")
    seed = _ENC_PAD + o_entry[:32].ljust(32, b"\x00") + p_le + id0
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", head):
        seed += b"\xff\xff\xff\xff"
    key = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nkey]).digest()
    key = key[:nkey]

    def decrypt(num: int, gen: int, data: bytes) -> bytes:
        if num == enc_num:  # the encrypt dict itself is never encrypted
            return data
        tail = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        if aes:
            okey = hashlib.md5(key + tail + b"sAlT").digest()[
                :min(nkey + 5, 16)]
            from .aes import cbc_decrypt
            return cbc_decrypt(okey, data)
        okey = hashlib.md5(key + tail).digest()[:min(nkey + 5, 16)]
        return _rc4(okey, data)

    return decrypt


def _refs(pattern: bytes, head: bytes) -> List[int]:
    m = re.search(pattern + rb"\s*\[((?:[^\]])*)\]", head)
    if m is not None:
        return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    m = re.search(pattern + rb"\s+(\d+)\s+\d+\s+R", head)
    return [int(m.group(1))] if m is not None else []


def _page_order(objs: Dict[int, Tuple[bytes, Optional[bytes]]]
                ) -> List[int]:
    """Page object numbers in document order via the page tree; falls
    back to object-number order over ``/Type /Page`` objects."""
    root_pages: Optional[int] = None
    for head, _ in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", head):
            pages_ref = _refs(rb"/Pages", head)
            if pages_ref:
                root_pages = pages_ref[0]
            break
    pages: List[int] = []
    if root_pages is not None:
        seen: set = set()
        stack = [root_pages]
        while stack and len(pages) < _MAX_PAGES:
            num = stack.pop(0)
            if num in seen or num not in objs:
                continue
            seen.add(num)
            head = objs[num][0]
            kids = _refs(rb"/Kids", head)
            if kids:
                stack = kids + stack  # depth-first, document order
            elif re.search(rb"/Type\s*/Page\b", head):
                pages.append(num)
    if not pages:
        pages = [num for num in sorted(objs)
                 if re.search(rb"/Type\s*/Page\b", objs[num][0])
                 and not re.search(rb"/Type\s*/Pages\b", objs[num][0])]
    return pages


def _media_height(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                  page_num_obj: int) -> float:
    """Page height from /MediaBox, inherited through /Parent."""
    num: Optional[int] = page_num_obj
    for _ in range(32):  # parent chains are shallow; cap guards cycles
        if num is None or num not in objs:
            break
        head = objs[num][0]
        m = _MEDIABOX_RE.search(head)
        if m is not None:
            try:
                return float(m.group(4)) - float(m.group(2))
            except ValueError:
                break
        parents = _refs(rb"/Parent", head)
        num = parents[0] if parents else None
    return DEFAULT_MEDIABOX[3] - DEFAULT_MEDIABOX[1]


# --- font resources (simple vs Identity-H composite) ----------------------

_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _balanced_dict(data: bytes, start: int) -> bytes:
    """The ``<< ... >>`` slice starting at ``start`` (nesting-aware)."""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:]


def _dict_value(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                head: bytes, key: bytes) -> Optional[bytes]:
    """Bytes of the dictionary under ``key`` — inline ``<< >>`` or a
    dereferenced indirect object."""
    m = re.search(key + rb"\s*(<<|\d+\s+\d+\s+R)", head)
    if m is None:
        return None
    if m.group(1) == b"<<":
        return _balanced_dict(head, m.start(1))
    num = int(m.group(1).split()[0])
    return objs.get(num, (None, None))[0]


def _utf16be(hex_digits: bytes) -> str:
    hex_digits = re.sub(rb"\s+", b"", hex_digits)
    if len(hex_digits) % 4:
        hex_digits = hex_digits[:len(hex_digits) - len(hex_digits) % 4]
    try:
        return bytes.fromhex(hex_digits.decode("ascii")).decode(
            "utf-16-be", errors="replace")
    except ValueError:
        return ""


def _parse_tounicode(data: bytes) -> Dict[int, str]:
    """ToUnicode CMap → {CID code: unicode string}. Handles
    ``bfchar`` pairs and ``bfrange`` in both destination forms
    (incrementing base string, explicit array)."""
    cmap: Dict[int, str] = {}
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for rm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(<[0-9A-Fa-f\s]+>|\[[^\]]*\])", m.group(1), re.S):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            hi = min(hi, lo + 0xFFFF)  # bound malformed ranges
            tgt = rm.group(3)
            if tgt.startswith(b"["):
                # hex strings may carry internal whitespace (T.32000
                # §7.3.4.3) — keep it here, _utf16be strips it
                dsts = re.findall(rb"<([0-9A-Fa-f\s]+)>", tgt)
                for k, d in enumerate(dsts[:hi - lo + 1]):
                    cmap[lo + k] = _utf16be(d)
            else:
                digits = re.sub(rb"\s+", b"", tgt[1:-1])
                if len(digits) % 4:
                    continue
                raw = bytes.fromhex(digits.decode("ascii"))
                prefix, last = raw[:-2], int.from_bytes(raw[-2:], "big")
                for k in range(hi - lo + 1):
                    unit = (last + k) & 0xFFFF
                    cmap[lo + k] = (prefix + unit.to_bytes(2, "big")
                                    ).decode("utf-16-be",
                                             errors="replace")
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for pm in re.finditer(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            cmap[int(pm.group(1), 16)] = _utf16be(pm.group(2))
    return cmap


def _descendant_head(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                     fhead: bytes) -> Optional[bytes]:
    darr = _array_value(objs, fhead, rb"/DescendantFonts")
    if darr is None:
        return None
    dm = re.search(rb"(\d+)\s+\d+\s+R", darr)
    if dm is None:
        return None
    return objs.get(int(dm.group(1)), (None, None))[0]


def _fontfile_cid_map(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                      fhead: bytes) -> Dict[int, str]:
    """GID → unicode recovered from the descendant CIDFont's embedded
    TrueType program (``/FontDescriptor → /FontFile2``) by inverting
    its cmap table — the text path for Type0 fonts that carry no
    ``/ToUnicode`` (``{}`` when no usable font program exists)."""
    dhead = _descendant_head(objs, fhead)
    if dhead is None:
        return {}
    fd = _dict_value(objs, dhead, rb"/FontDescriptor")
    if fd is None:
        return {}
    ff = _refs(rb"/FontFile2", fd)
    if not ff or ff[0] not in objs:
        return {}
    phead, pstream = objs[ff[0]]
    if pstream is None:
        return {}
    from .ttf import gid_to_unicode
    return gid_to_unicode(_decode_stream(phead, pstream))


def _cid_widths(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                fhead: bytes
                ) -> Tuple[Optional[Dict[int, float]],
                           Optional[float]]:
    """(per-CID widths, /DW default) from the Type0 font's
    descendant CIDFont — /W carries both forms of ISO 32000 §9.7.4.3
    (``c [w1 w2 …]`` and ``cFirst cLast w``); widths are 1/1000 em,
    /DW defaults to 1000."""
    dhead = _descendant_head(objs, fhead)
    if dhead is None:
        return None, None
    dwm = re.search(rb"/DW\s+([-+\d.]+)", dhead)
    try:
        dw = float(dwm.group(1)) if dwm is not None else 1000.0
    except ValueError:
        dw = 1000.0
    widths: Dict[int, float] = {}
    # /W nests arrays (c [w1 w2 …]) — needs a depth-aware scan, not
    # the first-']' slice _array_value takes
    warr = None
    wm = re.search(rb"/W\s*(\[|\d+\s+\d+\s+R)", dhead)
    if wm is not None:
        src, start = dhead, wm.start(1)
        if wm.group(1) != b"[":
            ihead = objs.get(int(wm.group(1).split()[0]),
                             (None, None))[0]
            im = re.search(rb"\[", ihead) if ihead else None
            if im is not None:
                src, start = ihead, im.start()
            else:
                src = None
        if src is not None:
            depth = 0
            for j in range(start, len(src)):
                if src[j] == 0x5B:
                    depth += 1
                elif src[j] == 0x5D:
                    depth -= 1
                    if depth == 0:
                        warr = src[start + 1:j]
                        break
    if warr is not None:
        toks = re.findall(rb"\[[^\]]*\]|[-+]?[\d.]+", warr)
        i = 0
        while i < len(toks):
            if toks[i].startswith(b"["):
                i += 1  # malformed: group with no leading CID
                continue
            try:
                c1 = int(float(toks[i]))
            except ValueError:
                break
            if i + 1 < len(toks) and toks[i + 1].startswith(b"["):
                vals = re.findall(rb"[-+]?[\d.]+", toks[i + 1])
                for k, v in enumerate(vals):
                    widths[c1 + k] = float(v)
                i += 2
            elif i + 2 < len(toks):
                c2 = min(int(float(toks[i + 1])), c1 + 0xFFFF)
                w = float(toks[i + 2])
                for c in range(c1, c2 + 1):
                    widths[c] = w
                i += 3
            else:
                break
    return (widths or None), dw


def _page_resources(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                    page_obj: int) -> Optional[bytes]:
    """The page's ``/Resources`` dict bytes, inherited through
    ``/Parent`` like MediaBox."""
    num: Optional[int] = page_obj
    for _ in range(32):
        if num is None or num not in objs:
            break
        head = objs[num][0]
        res = _dict_value(objs, head, rb"/Resources")
        if res is not None:
            return res
        parents = _refs(rb"/Parent", head)
        num = parents[0] if parents else None
    return None


# A resolved font: ``cid`` marks 2-byte Identity-H codes decoded
# through ``charmap`` (a ToUnicode CID map); simple fonts decode
# bytes through ``charmap`` overrides (/Encoding /Differences) with
# a cp1252 fallback. ``widths`` maps byte code → glyph width in
# 1/1000 em (/FirstChar + /Widths) — ``None`` falls back to the
# average-width model.
class _Font:
    __slots__ = ("cid", "charmap", "widths", "dw", "base")

    def __init__(self, cid: bool = False,
                 charmap: Optional[Dict[int, str]] = None,
                 widths: Optional[Dict[int, float]] = None,
                 dw: Optional[float] = None,
                 base: str = "cp1252"):
        self.cid = cid
        self.charmap = charmap or {}
        self.widths = widths
        self.dw = dw  # CID default width (/DW), 1/1000 em
        self.base = base  # simple-font byte codec (WinAnsi/MacRoman)


# Adobe Glyph List subset for /Differences names the algorithmic
# rules (single char, uniXXXX, uXXXX) don't cover — the high-traffic
# Latin/punctuation names (the full AGL is public; this is the slice
# generated corpora and common documents use).
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "underscore": "_", "braceleft": "{",
    "bar": "|", "braceright": "}", "adieresis": "ä",
    "odieresis": "ö", "udieresis": "ü", "Adieresis": "Ä",
    "Odieresis": "Ö", "Udieresis": "Ü", "germandbls": "ß",
    "eacute": "é", "egrave": "è", "agrave": "à", "ccedilla": "ç",
    "Euro": "€", "sterling": "£", "degree": "°", "twosuperior": "²",
    "bullet": "•", "endash": "–", "emdash": "—",
}


def _glyph_to_char(name: str) -> Optional[str]:
    if len(name) == 1:
        return name
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and len(name) in (5, 7):
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    return None


def _array_value(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                 head: bytes, key: bytes) -> Optional[bytes]:
    """Bytes inside the ``[ ... ]`` under ``key`` — inline or a
    dereferenced indirect array object."""
    m = re.search(key + rb"\s*(\[|\d+\s+\d+\s+R)", head)
    if m is None:
        return None
    if m.group(1) != b"[":
        num = int(m.group(1).split()[0])
        head = objs.get(num, (b"", None))[0]
        m = re.search(rb"\[", head)
        if m is None:
            return None
    close = head.find(b"]", m.end())
    return head[m.end():close if close >= 0 else None]


def _simple_font(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                 fhead: bytes) -> "_Font":
    """Simple (1-byte) font: /FirstChar + /Widths per-glyph metrics
    and /Encoding /Differences overrides (algorithmic + AGL-subset
    glyph names; unknown names keep the cp1252 fallback)."""
    widths: Optional[Dict[int, float]] = None
    fc = re.search(rb"/FirstChar\s+(\d+)", fhead)
    warr = _array_value(objs, fhead, rb"/Widths")
    if fc is not None and warr is not None:
        vals = re.findall(rb"[-+]?[\d.]+", warr)
        widths = {int(fc.group(1)) + k: float(v)
                  for k, v in enumerate(vals)}
    # base byte codec: WinAnsi (cp1252, the default and the dominant
    # real-world case) or MacRoman (/Encoding /MacRomanEncoding as a
    # name, or /BaseEncoding inside an /Encoding dict) — old Mac
    # generators; /Differences then overrides on top
    base = "cp1252"
    enc_probe = re.search(rb"/Encoding\s*/(\w+)", fhead)
    charmap: Dict[int, str] = {}
    enc = _dict_value(objs, fhead, rb"/Encoding")
    if (enc_probe is not None
            and enc_probe.group(1) == b"MacRomanEncoding") or (
            enc is not None and re.search(
                rb"/BaseEncoding\s*/MacRomanEncoding\b", enc)):
        base = "mac_roman"
    if enc is not None:
        darr = _array_value(objs, enc, rb"/Differences")
        if darr is not None:
            code = 0
            for tok in re.finditer(rb"(\d+)|/([^\s/<>\[\]()]+)", darr):
                if tok.group(1) is not None:
                    code = int(tok.group(1))
                else:
                    ch = _glyph_to_char(
                        tok.group(2).decode("latin-1"))
                    if ch is not None:
                        charmap[code] = ch
                    code += 1
    # Type3 widths are in GLYPH SPACE: /FontMatrix maps them to text
    # space (simple fonts use the fixed 1/1000 em). Pre-scale so the
    # downstream 1/1000 width consumer stays uniform.
    if widths is not None and re.search(
            rb"/Subtype\s*/Type3\b", fhead) is not None:
        fmm = re.search(rb"/FontMatrix\s*\[\s*([-+\d.eE]+)", fhead)
        a = float(fmm.group(1)) if fmm is not None else 0.001
        widths = {k: v * a * 1000.0 for k, v in widths.items()}
    return _Font(cid=False, charmap=charmap, widths=widths,
                 base=base)


def _fonts_from_resources(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                          res: Optional[bytes]
                          ) -> Dict[str, "_Font"]:
    """Font-name → resolved :class:`_Font`."""
    if res is None:
        return {}
    fdict = _dict_value(objs, res, rb"/Font")
    if fdict is None:
        return {}
    fonts: Dict[str, _Font] = {}
    for m in _FONT_ENTRY_RE.finditer(fdict):
        name = m.group(1).decode("latin-1")
        fhead = objs.get(int(m.group(2)), (None, None))[0]
        if fhead is None:
            continue
        if (re.search(rb"/Subtype\s*/Type0\b", fhead)
                and re.search(rb"/Encoding\s*/Identity-H\b", fhead)):
            cid_map: Dict[int, str] = {}
            tu = _refs(rb"/ToUnicode", fhead)
            if tu and tu[0] in objs:
                thead, tstream = objs[tu[0]]
                if tstream is not None:
                    cid_map = _parse_tounicode(
                        _decode_stream(thead, tstream))
            if not cid_map:
                # ToUnicode-less font (common in older generators):
                # Identity-H codes are GIDs into the embedded font
                # program — invert its cmap table (Unicode → GID),
                # the pdfminer/pdfium recovery path
                cid_map = _fontfile_cid_map(objs, fhead)
            cw, dw = _cid_widths(objs, fhead)
            fonts[name] = _Font(cid=True, charmap=cid_map,
                                widths=cw, dw=dw)
        else:
            fonts[name] = _simple_font(objs, fhead)
    return fonts


_MATRIX_RE = re.compile(
    rb"/Matrix\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+"
    rb"([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]")


def _xobjects_from_resources(
        objs: Dict[int, Tuple[bytes, Optional[bytes]]],
        res: Optional[bytes],
        parent_fonts: Dict[str, Optional[Dict[int, str]]],
        depth: int = 0) -> Dict[str, Tuple[bytes, dict, dict,
                                           Tuple[float, float,
                                                 float, float]]]:
    """XObject-name → (content, fonts, nested xobjects, matrix) for
    every ``/Subtype /Form`` entry under ``/XObject``. Image XObjects
    carry no text and are skipped. A form's own ``/Resources`` merge
    OVER the caller's fonts (T.32000 §7.8.3: missing resources
    inherit from the invoking context); its ``/Matrix`` reduces to
    (sx, sy, tx, ty) — rotation/skew components are dropped, matching
    the parser's axis-aligned geometry model."""
    out: Dict[str, Tuple[bytes, dict, dict,
                         Tuple[float, float, float, float]]] = {}
    if res is None or depth > 4:
        return out
    xdict = _dict_value(objs, res, rb"/XObject")
    if xdict is None:
        return out
    for m in _FONT_ENTRY_RE.finditer(xdict):
        name = m.group(1).decode("latin-1")
        num = int(m.group(2))
        head, stream = objs.get(num, (None, None))
        if head is None or stream is None \
                or not re.search(rb"/Subtype\s*/Form\b", head):
            continue
        content = _decode_stream(head, stream)
        fres = _dict_value(objs, head, rb"/Resources")
        fonts = dict(parent_fonts)
        fonts.update(_fonts_from_resources(objs, fres))
        nested = _xobjects_from_resources(objs, fres, fonts, depth + 1)
        mm = _MATRIX_RE.search(head)
        if mm is not None:
            try:
                a, _b, _c, d, e, f = (float(mm.group(k))
                                      for k in range(1, 7))
            except ValueError:
                a, d, e, f = 1.0, 1.0, 0.0, 0.0
        else:
            a, d, e, f = 1.0, 1.0, 0.0, 0.0
        out[name] = (content, fonts, nested, (a or 1.0, d or 1.0, e, f))
    return out


# --- scanned pages: image XObjects + OCR ----------------------------------

# image placement: the optional axis-aligned cm immediately preceding
# the Do — the shape every scanner/rasterizer writes
# (``q sx 0 0 sy tx ty cm /Im1 Do Q``)
_IMAGE_DO_RE = re.compile(
    rb"(?:([\d.eE+-]+)\s+[\d.eE+-]+\s+[\d.eE+-]+\s+([\d.eE+-]+)\s+"
    rb"([\d.eE+-]+)\s+([\d.eE+-]+)\s+cm\s+)?/([^\s/<>\[\]()]+)\s+Do\b")

# inline image (ISO 32000 §8.9.7): same optional placement cm, then
# ``BI <params> ID<1 ws byte><data>…EI``; group 5 is the parameter
# dict body, data starts at match end
_INLINE_BI_RE = re.compile(
    rb"(?:([\d.eE+-]+)\s+[\d.eE+-]+\s+[\d.eE+-]+\s+([\d.eE+-]+)\s+"
    rb"([\d.eE+-]+)\s+([\d.eE+-]+)\s+cm\s+)?"
    rb"\bBI\b\s*(.*?)\bID[\x00\t\n\x0c\r ]", re.DOTALL)

_INLINE_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")

# inline-image abbreviated keys/filters → canonical names (ISO 32000
# Table 93); \b keeps /F from eating /Fl and /D from eating /DP//DCT
_INLINE_ABBREVS = (
    (re.compile(rb"/BPC\b"), b"/BitsPerComponent"),
    (re.compile(rb"/CS\b"), b"/ColorSpace"),
    (re.compile(rb"/DP\b"), b"/DecodeParms"),
    (re.compile(rb"/F\b"), b"/Filter"),
    (re.compile(rb"/W\b"), b"/Width"),
    (re.compile(rb"/H\b"), b"/Height"),
    (re.compile(rb"/IM\b"), b"/ImageMask"),
    (re.compile(rb"/D\b"), b"/Decode"),
    (re.compile(rb"/CCF\b"), b"/CCITTFaxDecode"),
    (re.compile(rb"/DCT\b"), b"/DCTDecode"),
    (re.compile(rb"/Fl\b"), b"/FlateDecode"),
    (re.compile(rb"/AHx\b"), b"/ASCIIHexDecode"),
    (re.compile(rb"/A85\b"), b"/ASCII85Decode"),
    (re.compile(rb"/LZW\b"), b"/LZWDecode"),
    (re.compile(rb"/RL\b"), b"/RunLengthDecode"),
    (re.compile(rb"/G\b"), b"/DeviceGray"),
)


def _inline_images(content: bytes) -> list:
    """Decoded inline images with their placements:
    ``(start_pos, cm_match, grey_array)`` per ``BI…ID…EI`` whose
    params/encoding fall inside :func:`_decode_image`'s supported
    subset. Unfiltered data has an exact length (h·ceil(w·bpc/8));
    for filtered data the ``EI`` delimiter is ambiguous (it can occur
    inside the binary), so candidates are tried in order and the
    first payload that actually decodes wins — a truncated Flate/
    JPEG/G4 prefix raises inside ``_decode_image`` and is skipped."""
    out = []
    for m in _INLINE_BI_RE.finditer(content):
        head = m.group(5)
        for pat, full in _INLINE_ABBREVS:
            head = pat.sub(full, head)
        wm = re.search(rb"/Width\s+(\d+)", head)
        hm = re.search(rb"/Height\s+(\d+)", head)
        if wm is None or hm is None \
                or int(wm.group(1)) == 0 or int(hm.group(1)) == 0:
            continue
        data_start = m.end()
        if re.search(rb"/Filter\s*/", head) is None:
            bm = re.search(rb"/BitsPerComponent\s+(\d+)", head)
            bpc = int(bm.group(1)) if bm else 8
            w, hh = int(wm.group(1)), int(hm.group(1))
            ln = hh * ((w * bpc + 7) // 8)
            img = _decode_image(head, content[data_start:
                                              data_start + ln])
            if img is not None:
                out.append((m.start(), m, img))
            continue
        for em in _INLINE_EI_RE.finditer(content, data_start):
            img = _decode_image(head,
                                content[data_start:em.start()])
            if img is not None:
                out.append((m.start(), m, img))
                break
    return out


def _image_xobjects(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                    res: Optional[bytes]
                    ) -> Dict[str, Tuple[bytes, bytes]]:
    """XObject-name → (head, stream) for ``/Subtype /Image`` entries
    (the complement of :func:`_xobjects_from_resources`, which keeps
    only forms)."""
    out: Dict[str, Tuple[bytes, bytes]] = {}
    if res is None:
        return out
    xdict = _dict_value(objs, res, rb"/XObject")
    if xdict is None:
        return out
    for m in _FONT_ENTRY_RE.finditer(xdict):
        name = m.group(1).decode("latin-1")
        head, stream = objs.get(int(m.group(2)), (None, None))
        if head is not None and stream is not None \
                and re.search(rb"/Subtype\s*/Image\b", head):
            out[name] = (head, stream)
    return out


def _decode_image(head: bytes, stream: bytes):
    """Image XObject → greyscale uint8 array, or ``None`` outside the
    supported subset: ``/DeviceGray`` samples at 8 bits or fax-style
    1 bit (raw or Flate; 1-bit rows byte-padded, MSB first, 1=white),
    ``/CCITTFaxDecode`` G4, and ``/DCTDecode`` JPEG (via the
    from-scratch codecs) — the encodings real scanners emit. RGB
    JPEGs reduce to their channel mean. Full byte-level filter
    CHAINS are honored: raw samples behind any
    Flate/LZW/A85/AHx/RL sequence, and the same chain as a prefix
    before the G4/JPEG codec (e.g. ``[/ASCII85Decode /DCTDecode]``).
    Honored sample-mapping parameters: ``/Decode [1 0]`` (inverted
    gray ramp), ``/BlackIs1`` (CCITT black-run polarity; the two
    compose by XOR), and PNG ``/Predictor >= 10`` row predictors via
    each filter's ``/DecodeParms``."""
    wm = re.search(rb"/Width\s+(\d+)", head)
    hm = re.search(rb"/Height\s+(\d+)", head)
    if wm is None or hm is None:
        return None
    w, h = int(wm.group(1)), int(hm.group(1))
    bm = re.search(rb"/BitsPerComponent\s+(\d+)", head)
    bpc = int(bm.group(1)) if bm else 8
    # /Decode [1 0]: inverted sample→gray mapping (scanners that
    # store photometric-min-is-white rasters)
    dm = re.search(rb"/Decode\s*\[\s*([\d.]+)\s+([\d.]+)", head)
    dec_inv = dm is not None and float(dm.group(1)) > float(dm.group(2))
    names = _filter_names(head)
    parms = _decode_parms(head, len(names))
    last = names[-1] if names else None
    try:
        if last in (b"CCITTFaxDecode", b"CCF"):
            # Group 4 only (/K < 0) — what scanners write; 1D and
            # mixed-mode G3 are out of scope and yield None. Any
            # byte-level prefix chain (A85/AHx/Flate/…) runs first.
            import numpy as np
            from .g4 import decode_g4
            km = re.search(rb"/K\s+(-?\d+)", head)
            if km is None or int(km.group(1)) >= 0:
                return None
            data = _apply_filter_chain(names[:-1], parms[:-1],
                                       bytes(stream))
            if data is None:
                return None
            ink = decode_g4(data, w, h)
            # a G4 "black" run emits sample 1 under /BlackIs1 true
            # (else 0); /Decode [1 0] flips the sample→gray map —
            # ink renders black iff the two agree with the default
            blackis1 = re.search(
                rb"/BlackIs1\s+true", head) is not None
            if blackis1 != dec_inv:  # net inversion
                return np.where(ink, np.uint8(255), np.uint8(0))
            return np.where(ink, np.uint8(0), np.uint8(255))
        if last in (b"DCTDecode", b"DCT"):
            import numpy as np
            from .jpeg import decode_jpeg
            data = _apply_filter_chain(names[:-1], parms[:-1],
                                       bytes(stream))
            if data is None:
                return None
            img = decode_jpeg(data)
            if img.ndim == 3:
                img = img.mean(axis=2).astype(np.uint8)
            return (255 - img) if dec_inv else img
        # raw samples behind any byte-level chain (Flate/LZW/A85/AHx/
        # RL, PNG predictors via each filter's /DecodeParms)
        import numpy as np
        data = _apply_filter_chain(names, parms, bytes(stream)) \
            if names else bytes(stream)
        if data is None:
            return None
        if bpc == 1:
            rowbytes = (w + 7) // 8
            if len(data) < h * rowbytes:
                return None
            bits = np.frombuffer(
                data[:h * rowbytes],
                dtype=np.uint8).reshape(h, rowbytes)
            px = np.unpackbits(bits, axis=1)[:, :w]
            if dec_inv:
                px = 1 - px
            return px * np.uint8(255)
        if bpc != 8 or len(data) < w * h:
            return None
        img = np.frombuffer(
            data[:w * h], dtype=np.uint8).reshape(h, w)
        return (255 - img) if dec_inv else img
    except Exception:
        return None


def _ocr_page_images(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                     content: bytes, res: Optional[bytes],
                     page_num: int, page_h: float
                     ) -> List[Dict[str, Any]]:
    """OCR pass for a page with no text layer — the scanned-document
    branch. The reference OCRs every page this way
    (``/root/reference/src/ocr/easyocr_client.py:26-58``); here only
    pages that carry no digital text pay the OCR cost. Each placed
    image is decoded and run through ``kernel/ocr.py``'s recognizer;
    pixel coordinates map to page points through the placement matrix
    so elements land in the same geometry as the digital-text path.
    Without a ``cm``, the scanner convention of one image pixel per
    point is assumed."""
    images = _image_xobjects(objs, res)
    placed: List[tuple] = []
    for m in _IMAGE_DO_RE.finditer(content):
        name = m.group(5).decode("latin-1")
        if name not in images:
            continue
        img = _decode_image(*images[name])
        if img is None:
            continue
        placed.append((m.start(), m, img))
    placed += _inline_images(content)
    if not placed:
        return []
    placed.sort(key=lambda t: t[0])
    from .ocr import GLYPH_ROWS, recognize
    out: List[Dict[str, Any]] = []
    for _pos, m, img in placed:
        tokens, orient = recognize(img, return_orientation=True)
        ih, iw = img.shape
        if orient in (90, 270):  # sideways scan: upright dims swap
            ih, iw = iw, ih
        if m.group(1) is not None:
            try:
                sx, sy, tx, ty = (float(m.group(k))
                                  for k in range(1, 5))
            except ValueError:
                sx, sy, tx, ty = float(iw), float(ih), 0.0, 0.0
        else:
            sx, sy, tx, ty = float(iw), float(ih), 0.0, 0.0
        # upright (content-frame) px → device pt: a rotated scan
        # reports its content's geometry, as an OCR pipeline that
        # re-orients page images would
        kx, ky = sx / iw, sy / ih
        for x_px, top_px, text, ncells, box_h, pitch, conf in \
                tokens:
            fs = 12.0 * (box_h / GLYPH_ROWS) * ky
            x1 = round(tx + x_px * kx, 2)
            x2 = round(tx + (x_px + ncells * pitch) * kx, 2)
            y1 = round(page_h - (ty + sy) + top_px * ky, 2)
            y2 = round(y1 + fs, 2)
            out.append({
                "page_num": page_num,
                "text": text,
                "confidence": conf,
                "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                         "width": round(x2 - x1, 2),
                         "height": round(y2 - y1, 2)},
            })
    return out


# --- content-stream lexer -------------------------------------------------

_DELIMS = b"()<>[]{}/%"
_WS = b"\x00\t\n\x0c\r "


def _parse_literal_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Parse ``(...)`` starting at the ``(``; returns (bytes, next_i)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                val = 0
                k = 0
                while i < n and k < 3 and 0x30 <= data[i] <= 0x37:
                    val = val * 8 + (data[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # \( \) \\ or unknown → the char itself
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _parse_hex_string(data: bytes, i: int) -> Tuple[bytes, int]:
    j = data.find(b">", i + 1)
    if j < 0:
        j = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), j + 1


def _lex(data: bytes):
    """Yield ('num', float) | ('str', bytes) | ('name', str) |
    ('op', str) tokens; dict/array delimiters come through as ops."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:
            s, i = _parse_literal_string(data, i)
            yield ("str", s)
        elif c == 0x3C and i + 1 < n and data[i + 1] == 0x3C:
            yield ("op", "<<")
            i += 2
        elif c == 0x3C:
            s, i = _parse_hex_string(data, i)
            yield ("str", s)
        elif c == 0x3E and i + 1 < n and data[i + 1] == 0x3E:
            yield ("op", ">>")
            i += 2
        elif c in b"[]{}":
            yield ("op", chr(c))
            i += 1
        elif c == 0x2F:  # /Name
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIMS:
                j += 1
            yield ("name", data[i + 1:j].decode("latin-1"))
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and data[j] in b"+-.0123456789eE":
                j += 1
            try:
                yield ("num", float(data[i:j]))
            except ValueError:
                pass
            i = j
        else:
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIMS:
                j += 1
            yield ("op", data[i:j].decode("latin-1"))
            i = j


# --- text-state interpreter ----------------------------------------------

def _extract_page_elements(content: bytes, page_num: int,
                           page_h: float,
                           fonts: Optional[Dict[str, Optional[
                               Dict[int, str]]]] = None,
                           xobjects: Optional[Dict[str, Any]] = None,
                           ctm: Tuple[float, float, float, float]
                           = (1.0, 1.0, 0.0, 0.0),
                           depth: int = 0) -> List[Dict[str, Any]]:
    """Interpret one content stream. ``ctm`` is the inherited
    device transform reduced to (sx, sy, tx, ty) — axis-aligned
    scale + translate, the subset the geometry model can express;
    ``cm`` composes onto it under ``q``/``Q`` save/restore, and a
    form XObject's ``Do`` recurses with the form matrix composed
    (bounded by ``depth``)."""
    fonts = fonts or {}
    xobjects = xobjects or {}
    elements: List[Dict[str, Any]] = []
    base_fs = DEFAULT_FONT_SIZE  # set by Tf
    cur_font: Optional[_Font] = None  # current font (decoder + widths)
    tm_scale = 1.0               # vertical scale of the text matrix
    lx = ly = 0.0      # line-matrix origin (PDF user space)
    cx = cy = 0.0      # cursor
    leading = 0.0
    ctm_cur = list(ctm)          # [sx, sy, tx, ty]
    gstack: List[Tuple[float, float, float, float]] = []
    stack: List[Any] = []
    arr: Optional[List[Any]] = None

    def nums(k: int) -> List[float]:
        vals = [v for v in stack if isinstance(v, float)][-k:]
        return ([0.0] * (k - len(vals))) + vals

    def decode(s: bytes) -> Tuple[str, int]:
        """(text, glyph count): 2-byte Identity-H CIDs through the
        font's ToUnicode map, else 1-byte codes through /Differences
        overrides with a WinAnsi (cp1252) fallback. The width model
        is per GLYPH, so composite and simple fonts land on the same
        CHAR_W grid unless the font carries real /Widths."""
        if cur_font is None or not cur_font.cid:
            base = cur_font.base if cur_font is not None else "cp1252"
            cm = cur_font.charmap if cur_font is not None else {}
            if cm:
                return ("".join(
                    cm.get(b) or s[i:i + 1].decode(
                        base, errors="replace")
                    for i, b in enumerate(s)), len(s))
            return s.decode(base, errors="replace"), len(s)
        n = len(s) - (len(s) % 2)
        codes = [int.from_bytes(s[i:i + 2], "big")
                 for i in range(0, n, 2)]
        return ("".join(cur_font.charmap.get(c, "�") for c in codes),
                len(codes))

    def show(s: bytes, kern: float = 0.0) -> None:
        nonlocal cx
        fs = base_fs * tm_scale
        text, n_units = decode(s)
        if (cur_font is not None and not cur_font.cid
                and cur_font.widths is not None):
            # real per-glyph metrics (1/1000 em); codes outside
            # /FirstChar+/Widths keep the average-width fallback
            default_w = CHAR_W_FRAC * 1000.0
            width = fs * sum(cur_font.widths.get(b, default_w)
                             for b in s) / 1000.0 - kern
        elif (cur_font is not None and cur_font.cid
              and (cur_font.widths is not None
                   or cur_font.dw is not None)):
            # composite font: per-CID /W metrics with the /DW
            # default (1/1000 em, ISO 32000 §9.7.4.3)
            dw = cur_font.dw if cur_font.dw is not None else 1000.0
            wmap = cur_font.widths or {}
            n2 = len(s) - (len(s) % 2)
            width = fs * sum(
                wmap.get(int.from_bytes(s[i:i + 2], "big"), dw)
                for i in range(0, n2, 2)) / 1000.0 - kern
        else:
            width = CHAR_W_FRAC * fs * n_units - kern
        if text.strip():
            # Coordinates round to 2 decimals: sub-centipoint float fuzz
            # (accumulated Td deltas, formatted-number round trips) is
            # noise the approximate width model can't justify, and tidy
            # values keep goldens readable and stable.
            sx, sy, tx, ty = ctm_cur
            ux, uy = cx * sx + tx, cy * sy + ty
            fs_dev = fs * sy
            x1 = round(ux, 2)
            x2 = round(ux + width * sx, 2)
            y1 = round(page_h - uy - ASCENT_FRAC * fs_dev, 2)
            y2 = round(y1 + fs_dev, 2)
            elements.append({
                "page_num": page_num,
                "text": text,
                "confidence": 1.0,
                "bbox": {
                    "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                    "width": round(x2 - x1, 2),
                    "height": round(y2 - y1, 2),
                },
            })
        cx += width

    def newline() -> None:
        nonlocal ly, cx, cy
        ly -= leading
        cx, cy = lx, ly

    for kind, val in _lex(content):
        if kind in ("num", "str", "name"):
            (arr if arr is not None else stack).append(
                val if kind != "name" else ("name", val))
            continue
        op = val
        if op == "[":
            arr = []
        elif op == "]":
            if arr is not None:
                stack.append(arr)
                arr = None
        elif arr is not None:
            continue  # operators inside an array operand: ignore
        elif op == "BT":
            lx = ly = cx = cy = 0.0
            tm_scale = 1.0
            stack.clear()
        elif op == "Tf":
            (base_fs,) = nums(1)
            fname = next(
                (v[1] for v in reversed(stack)
                 if isinstance(v, tuple) and v[0] == "name"), None)
            cur_font = fonts.get(fname) if fname is not None else None
            stack.clear()
        elif op == "Tm":
            a, b, c, d, e, f = nums(6)
            tm_scale = abs(d) or abs(a) or 1.0
            lx, ly = e, f
            cx, cy = lx, ly
            stack.clear()
        elif op == "Td":
            tx, ty = nums(2)
            lx += tx
            ly += ty
            cx, cy = lx, ly
            stack.clear()
        elif op == "TD":
            tx, ty = nums(2)
            leading = -ty
            lx += tx
            ly += ty
            cx, cy = lx, ly
            stack.clear()
        elif op == "TL":
            (leading,) = nums(1)
            stack.clear()
        elif op == "T*":
            newline()
            stack.clear()
        elif op in ("Tj", "'", '"'):
            if op != "Tj":
                newline()
            s = next((v for v in reversed(stack)
                      if isinstance(v, bytes)), b"")
            show(s)
            stack.clear()
        elif op == "TJ":
            items = next((v for v in reversed(stack)
                          if isinstance(v, list)), [])
            parts = [v for v in items if isinstance(v, bytes)]
            kerns = [v for v in items if isinstance(v, float)]
            show(b"".join(parts),
                 kern=sum(kerns) / 1000.0 * base_fs * tm_scale)
            stack.clear()
        elif op == "q":
            gstack.append(tuple(ctm_cur))
            stack.clear()
        elif op == "Q":
            if gstack:
                ctm_cur[:] = gstack.pop()
            stack.clear()
        elif op == "cm":
            a, b, c, d, e, f = nums(6)
            sx, sy, tx, ty = ctm_cur
            # axis-aligned reduction: a/d scale, e/f translate; a
            # rotated frame (a or d == 0) keeps the prior scale so
            # text stays measurable rather than degenerate
            ctm_cur[:] = [sx * (a or 1.0), sy * (d or 1.0),
                          sx * e + tx, sy * f + ty]
            stack.clear()
        elif op == "Do":
            fname = next(
                (v[1] for v in reversed(stack)
                 if isinstance(v, tuple) and v[0] == "name"), None)
            form = xobjects.get(fname) if fname is not None else None
            if form is not None and depth < 8:
                fcontent, ffonts, fnested, (ma, md, me, mf) = form
                sx, sy, tx, ty = ctm_cur
                child_ctm = (sx * ma, sy * md,
                             sx * me + tx, sy * mf + ty)
                merged = dict(xobjects)
                merged.update(fnested)
                elements.extend(_extract_page_elements(
                    fcontent, page_num, page_h, ffonts, merged,
                    child_ctm, depth + 1))
            stack.clear()
        else:
            stack.clear()  # any other operator consumes its operands
    return elements


_RECT_RE = re.compile(
    rb"/Rect\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+"
    rb"([\d.+-]+)\s+([\d.+-]+)\s*\]")


def _annot_string(data: bytes) -> str:
    """PDF text-string bytes → str: UTF-16BE when BOM'd, else
    PDFDocEncoding (≈ cp1252 for the characters that matter here)."""
    if data.startswith(b"\xfe\xff"):
        return data[2:].decode("utf-16-be", errors="replace")
    return data.decode("cp1252", errors="replace")


def _page_annotations(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                      page_obj: int, page_num: int, page_h: float,
                      decrypt=None,
                      from_objstm: Optional[set] = None
                      ) -> List[Dict[str, Any]]:
    """Text carried by page annotations — filled AcroForm field
    values (``/Widget`` ``/V``, string or checkbox-state name) and
    ``/FreeText`` ``/Contents``. Form-based documents (the credit
    applications this engine's reference processes) put their data
    HERE, not in content streams. Strings in encrypted files decrypt
    with the containing object's key (names never encrypt; objects
    expanded from an ObjStm are already plaintext)."""
    out: List[Dict[str, Any]] = []
    for ref in _refs(rb"/Annots", objs[page_obj][0]):
        ahead = objs.get(ref, (None, None))[0]
        if ahead is None:
            continue
        rm = _RECT_RE.search(ahead)
        if rm is None:
            continue
        sub = re.search(rb"/Subtype\s*/(Widget|FreeText)\b", ahead)
        if sub is None:
            continue
        key = rb"/V" if sub.group(1) == b"Widget" else rb"/Contents"
        raw = _enc_string(ahead, key)
        if raw is not None:
            if decrypt is not None and (from_objstm is None
                                        or ref not in from_objstm):
                raw = decrypt(ref, 0, raw)
            text = _annot_string(raw)
        elif sub.group(1) == b"Widget":
            nm = re.search(rb"/V\s*/([^\s/<>\[\]()]+)", ahead)
            if nm is None:
                continue
            text = nm.group(1).decode("latin-1")  # checkbox state
        else:
            continue
        if not text.strip():
            continue
        try:
            rx1, ry1, rx2, ry2 = (float(rm.group(k))
                                  for k in range(1, 5))
        except ValueError:
            continue
        x1 = round(min(rx1, rx2), 2)
        x2 = round(max(rx1, rx2), 2)
        y1 = round(page_h - max(ry1, ry2), 2)
        y2 = round(page_h - min(ry1, ry2), 2)
        out.append({
            "page_num": page_num,
            "text": text,
            "confidence": 1.0,
            "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                     "width": round(x2 - x1, 2),
                     "height": round(y2 - y1, 2)},
        })
    return out


def _page_uri_links(objs: Dict[int, Tuple[bytes, Optional[bytes]]],
                    page_obj: int, decrypt=None,
                    from_objstm: Optional[set] = None) -> List[str]:
    """``/Subtype /Link`` annotations' ``/A /S /URI`` targets, in
    ``/Annots`` array order — the PDF side of the outlink surface
    (ISO 32000-1 §12.5.6.5, §12.6.4.7). Strings in encrypted files
    decrypt with the containing object's key, like annotation text."""
    out: List[str] = []
    for ref in _refs(rb"/Annots", objs[page_obj][0]):
        ahead = objs.get(ref, (None, None))[0]
        if ahead is None or b"/Subtype" not in ahead:
            continue
        if re.search(rb"/Subtype\s*/Link\b", ahead) is None:
            continue
        if re.search(rb"/S\s*/URI\b", ahead) is None:
            continue
        raw = _enc_string(ahead, rb"/URI")
        if raw is None:
            continue
        if decrypt is not None and (from_objstm is None
                                    or ref not in from_objstm):
            raw = decrypt(ref, 0, raw)
        uri = raw.decode("utf-8", errors="replace").strip()
        if uri:
            out.append(uri)
    return out


def parse_real_pdf(payload: bytes,
                   out_links: Optional[List[str]] = None
                   ) -> List[Dict[str, Any]]:
    """``%PDF-1.x`` bytes → layout elements (kernel element schema).

    Tolerant by contract: malformed input yields the elements the
    recognizable subset produced (possibly none) and never raises.
    ``out_links``, when given, receives the document's ``/Link``
    annotation URIs in page order (:func:`_page_uri_links`).
    """
    try:
        decrypt = _make_decryptor(payload)
        from_objstm: set = set()
        objs = _scan_objects(payload, decrypt, from_objstm)
        elements: List[Dict[str, Any]] = []
        for idx, page_obj in enumerate(_page_order(objs), start=1):
            page_h = _media_height(objs, page_obj)
            res = _page_resources(objs, page_obj)
            fonts = _fonts_from_resources(objs, res)
            xobjects = _xobjects_from_resources(objs, res, fonts)
            content = b""
            for ref in _refs(rb"/Contents", objs[page_obj][0]):
                head, stream = objs.get(ref, (b"", None))
                if stream is not None:
                    content += _decode_stream(head, stream) + b"\n"
            page_elems = _extract_page_elements(content, idx, page_h,
                                                fonts, xobjects)
            if not page_elems:
                # no text layer → scanned page: OCR the placed images
                page_elems = _ocr_page_images(objs, content, res, idx,
                                              page_h)
            elements.extend(page_elems)
            elements.extend(
                _page_annotations(objs, page_obj, idx, page_h,
                                  decrypt, from_objstm))
            if out_links is not None:
                out_links.extend(
                    _page_uri_links(objs, page_obj, decrypt,
                                    from_objstm))
        return elements
    except Exception:
        return []
