"""PDF stream-filter chains (``kernel/pdf_text._decode_stream``).

The reference delegates PDF byte handling to pdf2image
(``/root/reference/src/ocr/pdf_preprocessing.py``); this engine parses
content streams directly, so it must handle the filter chains real
writers emit: Flate with PNG predictors (xref/ObjStm), LZW (legacy
writers), ASCIIHex/ASCII85 (mail-safe wrappers), RunLength.
"""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.pdf_text import (  # noqa: E402
    _ascii_85_decode,
    _ascii_hex_decode,
    _decode_parms,
    _decode_stream,
    _lzw_decode,
    _png_unpredict,
    _run_length_decode,
    parse_real_pdf,
)

PAYLOAD = b"BT /F1 12 Tf 40 700 Td (Company Name:) Tj ET"


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Minimal PDF-flavoured LZW compressor (test-only oracle)."""
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

    emit(256)  # clear
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code <= 4095:  # 12-bit cap: never emit a 13-bit code
            table[wc] = next_code
            next_code += 1
        if next_code + early_change > (1 << width) and width < 12:
            width += 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- individual decoders ---------------------------------------------------

def test_ascii_hex():
    assert _ascii_hex_decode(b"48 65 6C6C 6F>") == b"Hello"
    # odd digit count: padded with 0 per spec
    assert _ascii_hex_decode(b"486>") == b"H`"


def test_ascii_85():
    import base64
    enc = base64.a85encode(PAYLOAD)
    assert _ascii_85_decode(enc + b"~>") == PAYLOAD
    assert _ascii_85_decode(b"<~" + enc + b"~>") == PAYLOAD
    # whitespace anywhere is ignored
    ws = b"\n".join(enc[i:i + 10] for i in range(0, len(enc), 10))
    assert _ascii_85_decode(ws + b"~>") == PAYLOAD
    # z short-form for an all-zero group
    assert _ascii_85_decode(b"z~>") == b"\x00\x00\x00\x00"


def test_run_length():
    # literal run (n<128: copy n+1), repeat run (n>128: 257-n copies)
    enc = bytes([2]) + b"abc" + bytes([257 - 5]) + b"x" + bytes([128])
    assert _run_length_decode(enc) == b"abc" + b"x" * 5
    # bytes after EOD are ignored
    assert _run_length_decode(enc + b"junk") == b"abc" + b"x" * 5


def test_lzw_round_trip():
    for data in (PAYLOAD, b"", b"a", b"aaaaaaaaaaaaaaaa",
                 bytes(range(256)) * 40, PAYLOAD * 200):
        assert _lzw_decode(_lzw_encode(data)) == data


def test_lzw_early_change_zero():
    data = PAYLOAD * 50
    assert _lzw_decode(_lzw_encode(data, 0), early_change=0) == data


def test_lzw_known_vector():
    # T.32000 §7.4.4 example input 45 45 45 65 65 65 66 66 66 →
    # codes 256 0x45 258 0x65 260 0x66 262 257, hand-packed at 9 bits
    # (derived independently of _lzw_encode, so this pins the bit
    # order, the code widths, and the CLEAR/EOD framing)
    enc = bytes([0x80, 0x11, 0x60, 0x46, 0x58, 0x21, 0x9A, 0x0D, 0x01])
    assert _lzw_decode(enc) == bytes(
        [0x45, 0x45, 0x45, 0x65, 0x65, 0x65, 0x66, 0x66, 0x66])


def test_png_predictors_round_trip():
    rows = [bytes((r * 37 + c * 11) % 256 for c in range(12))
            for r in range(6)]
    raw = b"".join(rows)
    for ftype in (0, 1, 2, 3, 4):
        enc = bytearray()
        prior = bytes(12)
        for row in rows:
            enc.append(ftype)
            filt = bytearray(row)
            for k in range(11, -1, -1):
                a = row[k - 1] if k >= 1 else 0
                b = prior[k]
                c = prior[k - 1] if k >= 1 else 0
                if ftype == 1:
                    filt[k] = (row[k] - a) & 0xFF
                elif ftype == 2:
                    filt[k] = (row[k] - b) & 0xFF
                elif ftype == 3:
                    filt[k] = (row[k] - (a + b) // 2) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else \
                        (b if pb <= pc else c)
                    filt[k] = (row[k] - pred) & 0xFF
            enc += filt
            prior = row
        assert _png_unpredict(bytes(enc), 12, 1, 8) == raw


# --- chain dispatch --------------------------------------------------------

def test_chain_ascii85_flate():
    import base64
    stream = base64.a85encode(zlib.compress(PAYLOAD)) + b"~>"
    head = b"<< /Filter [/ASCII85Decode /FlateDecode] /Length 99 >>"
    assert _decode_stream(head, stream) == PAYLOAD


def test_flate_with_png_up_predictor():
    cols = 4
    rows = [PAYLOAD[i:i + cols] for i in range(0, 40, cols)]
    enc = bytearray()
    prior = bytes(cols)
    for row in rows:
        enc.append(2)
        enc += bytes((row[k] - prior[k]) & 0xFF for k in range(cols))
        prior = row
    head = (b"<< /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor 12 /Columns 4 >> >>")
    assert _decode_stream(head, zlib.compress(bytes(enc))) == PAYLOAD[:40]


def test_decode_parms_null_alignment():
    head = (b"<< /Filter [/ASCII85Decode /FlateDecode] "
            b"/DecodeParms [null << /Predictor 1 /Columns 7 >>] >>")
    parms = _decode_parms(head, 2)
    assert parms[0][b"Columns"] == 1       # defaults for the null slot
    assert parms[1][b"Columns"] == 7


def test_unsupported_filter_contributes_nothing():
    head = b"<< /Filter /DCTDecode /Length 3 >>"
    assert _decode_stream(head, b"\xff\xd8\xff") == b""
    head = b"<< /Filter [/FlateDecode /Crypt] >>"
    assert _decode_stream(head, zlib.compress(PAYLOAD)) == b""


def test_corrupt_stream_contributes_nothing():
    assert _decode_stream(b"<< /Filter /FlateDecode >>", b"nonsense") == b""
    assert _decode_stream(b"<< /Filter /ASCII85Decode >>", b"\xff\xff~>") == b""


# --- end-to-end: a full PDF whose content stream uses each filter ----------

def _one_page_pdf(stream: bytes, filter_entry: bytes) -> bytes:
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< " + filter_entry + b" /Length "
        + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream\nendobj\n",
    ]
    return b"%PDF-1.5\n" + b"".join(objs) + b"%%EOF\n"


def test_end_to_end_each_filter_matches_plain():
    import base64
    content = PAYLOAD
    plain = parse_real_pdf(_one_page_pdf(content, b""))
    assert plain and plain[0]["text"] == "Company Name:"
    variants = [
        (zlib.compress(content), b"/Filter /FlateDecode"),
        (_lzw_encode(content), b"/Filter /LZWDecode"),
        (content.hex().encode() + b">", b"/Filter /ASCIIHexDecode"),
        (base64.a85encode(content) + b"~>", b"/Filter /ASCII85Decode"),
        (base64.a85encode(zlib.compress(content)) + b"~>",
         b"/Filter [/ASCII85Decode /FlateDecode]"),
    ]
    for stream, entry in variants:
        assert parse_real_pdf(_one_page_pdf(stream, entry)) == plain, entry
