"""RC4-encrypted PDFs (standard security handler, empty user password).

Fixtures are built with the real T.32000 §7.6.3.4 owner-key algorithm
(Algorithm 3) so the parser's Algorithm-2 key derivation is exercised
end-to-end: a wrong key would RC4 the content stream into noise and
extraction would yield nothing, so text equality vs the unencrypted
twin is a strong check of the whole chain.
"""

import hashlib
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.pdf_text import (  # noqa: E402
    _ENC_PAD,
    _rc4,
    parse_real_pdf,
)

CONTENT = b"BT /F1 12 Tf 40 700 Td (Loan Amount:) Tj " \
          b"180 0 Td (1.250.000 EUR) Tj ET"
ID0 = bytes(range(16))
P = -44  # print allowed only; any value works, it feeds the key


def _owner_entry(r: int, nkey: int) -> bytes:
    """Algorithm 3 with empty owner+user passwords."""
    h = hashlib.md5(_ENC_PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4_key = h[:nkey]
    o = _rc4(rc4_key, _ENC_PAD)
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def _file_key(o_entry: bytes, r: int, nkey: int) -> bytes:
    key = hashlib.md5(
        _ENC_PAD + o_entry + (P & 0xFFFFFFFF).to_bytes(4, "little") + ID0
    ).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nkey]).digest()
    return key[:nkey]


def _obj_key(key: bytes, num: int, gen: int = 0) -> bytes:
    return hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()[:min(len(key) + 5, 16)]


def _build_pdf(stream: bytes, encrypt_entry: bytes = b"",
               trailer_extra: bytes = b"") -> bytes:
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream\nendobj\n",
        encrypt_entry,
    ]
    trailer = (b"trailer\n<< /Root 1 0 R /ID [<"
               + ID0.hex().encode() + b"> <" + ID0.hex().encode()
               + b">] " + trailer_extra + b">>\n")
    return b"%PDF-1.4\n" + b"".join(objs) + trailer + b"%%EOF\n"


def _encrypted_pdf(r: int, nkey: int, v: int) -> bytes:
    o_entry = _owner_entry(r, nkey)
    key = _file_key(o_entry, r, nkey)
    enc_stream = _rc4(_obj_key(key, 4), zlib.compress(CONTENT))
    # /O with binary bytes goes in hex-string form (escape-free)
    enc_obj = (b"5 0 obj\n<< /Filter /Standard /V " + str(v).encode()
               + b" /R " + str(r).encode()
               + b" /Length " + str(nkey * 8).encode()
               + b" /O <" + o_entry.hex().encode() + b">"
               + b" /U <" + (b"\x00" * 32).hex().encode() + b">"
               + b" /P " + str(P).encode() + b" >>\nendobj\n")
    return _build_pdf(enc_stream, enc_obj,
                      trailer_extra=b"/Encrypt 5 0 R ")


def test_plain_twin_extracts():
    els = parse_real_pdf(_build_pdf(zlib.compress(CONTENT)))
    assert [e["text"] for e in els] == ["Loan Amount:", "1.250.000 EUR"]


def test_rc4_40bit_r2():
    els = parse_real_pdf(_encrypted_pdf(r=2, nkey=5, v=1))
    assert [e["text"] for e in els] == ["Loan Amount:", "1.250.000 EUR"]


def test_rc4_128bit_r3():
    els = parse_real_pdf(_encrypted_pdf(r=3, nkey=16, v=2))
    assert [e["text"] for e in els] == ["Loan Amount:", "1.250.000 EUR"]


def test_positions_match_unencrypted_twin():
    plain = parse_real_pdf(_build_pdf(zlib.compress(CONTENT)))
    enc = parse_real_pdf(_encrypted_pdf(r=3, nkey=16, v=2))
    assert enc == plain


def test_v4_without_crypt_filter_contributes_nothing():
    # /V 4 with no /CF crypt-filter dict is malformed: the file must
    # yield zero elements, never mojibake from misapplied RC4
    pdf = _encrypted_pdf(r=3, nkey=16, v=2)
    pdf = pdf.replace(b"/V 2 /R 3", b"/V 4 /R 4")
    assert parse_real_pdf(pdf) == []


def test_missing_encrypt_object_is_tolerated():
    pdf = _build_pdf(zlib.compress(CONTENT),
                     trailer_extra=b"/Encrypt 9 0 R ")
    assert parse_real_pdf(pdf) == []  # undecryptable, no crash


def test_wrong_o_entry_decodes_to_nothing():
    # Corrupt /O → wrong file key → RC4 noise → zlib fails → no text.
    pdf = _encrypted_pdf(r=3, nkey=16, v=2)
    o_hex = _owner_entry(3, 16).hex().encode()
    bad = bytes.fromhex((b"00" * 32).decode())
    pdf = pdf.replace(b"/O <" + o_hex + b">",
                      b"/O <" + bad.hex().encode() + b">")
    assert parse_real_pdf(pdf) == []


# --- AES (writer-built AESV2 / AESV3 files) ---------------------------------

def _aes_pdf(mode: str, **kw) -> bytes:
    from credit_ocr_system_spark.sources.pdf_write import (
        FONT_SIZE, build_pdf)
    toks = [[(40.0, 20.0, "Grünbau & (Söhne) GmbH", 16.0),
             (40.0, 60.0, "Loan Amount:", FONT_SIZE),
             (300.0, 60.0, "1.250.000 €", FONT_SIZE)]]
    return build_pdf(toks, encrypt=mode, **kw)


def _plain_pdf(**kw) -> bytes:
    from credit_ocr_system_spark.sources.pdf_write import (
        FONT_SIZE, build_pdf)
    toks = [[(40.0, 20.0, "Grünbau & (Söhne) GmbH", 16.0),
             (40.0, 60.0, "Loan Amount:", FONT_SIZE),
             (300.0, 60.0, "1.250.000 €", FONT_SIZE)]]
    return build_pdf(toks, **kw)


def test_aesv2_extracts_identical_to_plain():
    plain = parse_real_pdf(_plain_pdf(compress=True))
    assert plain
    enc = _aes_pdf("aesv2", compress=True)
    assert b"/CFM /AESV2" in enc
    assert parse_real_pdf(enc) == plain


def test_aes256_r6_extracts_identical_to_plain():
    plain = parse_real_pdf(_plain_pdf(compress=True))
    enc = _aes_pdf("aes256", compress=True)
    assert b"/V 5 /R 6" in enc
    assert parse_real_pdf(enc) == plain


def test_aes_composes_with_objstm_cid_and_forms():
    plain = parse_real_pdf(_plain_pdf(compress=True, font="cid"))
    enc = _aes_pdf("aes256", compress=True, font="cid", objstm=True,
                   form_xobject=True)
    assert parse_real_pdf(enc) == plain


def test_aes256_wrong_user_password_contributes_nothing():
    # corrupt the /U validation hash: the empty-password check must
    # fail and the file must yield nothing, never garbage
    enc = bytearray(_aes_pdf("aes256", compress=True))
    at = enc.index(b"/U <") + 4
    enc[at:at + 2] = b"00" if enc[at:at + 2] != b"00" else b"ff"
    assert parse_real_pdf(bytes(enc)) == []


def test_aesv2_positions_match_plain_twin():
    plain = parse_real_pdf(_plain_pdf(stream_filter="lzw"))
    enc = parse_real_pdf(_aes_pdf("aesv2", stream_filter="lzw"))
    assert enc == plain
