"""Real ``%PDF-1.x`` extraction: writer↔parser round trip, checked-in
binary fixture, exotic text operators, and malformed-input tolerance.

The reference OCRs rasterized real PDFs
(``/root/reference/src/ocr/easyocr_client.py:26-58``); this engine's
digital-text fallback (``kernel/pdf_text.py``) must make genuine
``%PDF-1.x`` payloads flow through the same layout kernel instead of
silently yielding zero elements. Regenerate the fixture after an
*intentional* writer/parser change: ``python tests/test_real_pdf.py``.
"""

import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.extract import extract_document  # noqa: E402
from credit_ocr_system_spark.kernel.pdf_layout import parse_pdf_tokens  # noqa: E402
from credit_ocr_system_spark.kernel.pdf_text import parse_real_pdf  # noqa: E402
from credit_ocr_system_spark.sources.pdf_write import (  # noqa: E402
    CHAR_W,
    FONT_SIZE,
    build_pdf,
)

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")
FIXTURE_PDF = os.path.join(FIXTURE_DIR, "real_text.pdf")
FIXTURE_GOLDEN = os.path.join(FIXTURE_DIR, "real_text_elements.json")

# Two pages; exercises escapes (parens, backslash), WinAnsi bytes
# (€, umlauts, ²), a split label on the CHAR_W grid, a 3-element row,
# and the second-page restart.
FIXTURE_TOKENS = [
    [
        (40.0, 20.0, "Grünbau & (Söhne) GmbH Application 1", 16.0),
        (40.0, 60.0, "Company Name:", FONT_SIZE),
        (300.0, 60.0, r"Grünbau & (Söhne) GmbH \ Co.", FONT_SIZE),
        (40.0, 88.0, "Loan", FONT_SIZE),
        (40.0 + CHAR_W * 4 + 6.0, 88.0, "Amount:", FONT_SIZE),
        (280.0, 88.0, "1.250.000 €", FONT_SIZE),
        (40.0, 116.0, "Total Area:", FONT_SIZE),
        (300.0, 116.0, "1,200", FONT_SIZE),
        (300.0 + CHAR_W * 5 + 40.0, 116.0, "m²", FONT_SIZE),
    ],
    [
        (40.0, 60.0, "Term:", FONT_SIZE),
        (300.0, 60.0, "15 Jahre", FONT_SIZE),
    ],
]


FIXTURE_CID_PDF = os.path.join(FIXTURE_DIR, "cid_text.pdf")
FIXTURE_CID_GOLDEN = os.path.join(FIXTURE_DIR, "cid_text_elements.json")

# AES-256/R6 encrypted twin of the simple fixture: checked-in binary
# evidence that the full decrypt chain (Algorithm 2.B KDF, /U
# validation, file-key recovery from /UE, per-stream CBC) reproduces
# the plain parse byte-for-byte
FIXTURE_AES_PDF = os.path.join(FIXTURE_DIR, "aes256_text.pdf")

# scanned (image-only) twin: the same layout rasterized with the
# kernel/ocr.py atlas into a FlateDecode image XObject — no text
# layer; extraction must OCR. Title at 18 pt (the raster grid needs
# fontsize a multiple of 6).
FIXTURE_SCAN_PDF = os.path.join(FIXTURE_DIR, "scanned_text.pdf")
FIXTURE_SCAN_GOLDEN = os.path.join(FIXTURE_DIR,
                                   "scanned_text_elements.json")
FIXTURE_SCAN_TOKENS = [
    [(x, y, t, 18.0 if fs == 16.0 else fs) for x, y, t, fs in page]
    for page in FIXTURE_TOKENS
]
# CCITT Group 4 twin (with tilt + dust): byte-pins kernel/g4.py's
# MH tables and 2D mode coding; extraction must equal the clean scan
FIXTURE_G4_PDF = os.path.join(FIXTURE_DIR, "scanned_g4_text.pdf")


def make_fixture() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    pdf = build_pdf(FIXTURE_TOKENS, compress=True, style="tm")
    with open(FIXTURE_PDF, "wb") as fh:
        fh.write(pdf)
    with open(FIXTURE_GOLDEN, "w", encoding="utf-8") as fh:
        json.dump(parse_real_pdf(pdf), fh, indent=2, ensure_ascii=False)
    cid = build_pdf(FIXTURE_TOKENS, compress=True, style="tm",
                    font="cid")
    with open(FIXTURE_CID_PDF, "wb") as fh:
        fh.write(cid)
    with open(FIXTURE_CID_GOLDEN, "w", encoding="utf-8") as fh:
        json.dump(parse_real_pdf(cid), fh, indent=2, ensure_ascii=False)
    aes = build_pdf(FIXTURE_TOKENS, compress=True, style="tm",
                    encrypt="aes256")
    with open(FIXTURE_AES_PDF, "wb") as fh:
        fh.write(aes)  # golden: the PLAIN fixture's — must be equal
    scan = build_pdf(FIXTURE_SCAN_TOKENS, scanned="flate")
    with open(FIXTURE_SCAN_PDF, "wb") as fh:
        fh.write(scan)
    with open(FIXTURE_SCAN_GOLDEN, "w", encoding="utf-8") as fh:
        json.dump(parse_real_pdf(scan), fh, indent=2,
                  ensure_ascii=False)
    # G4 twin: pins the from-scratch CCITT codec's bit stream (the
    # modified-Huffman tables and 2D mode coding) byte-for-byte
    g4 = build_pdf(FIXTURE_SCAN_TOKENS, scanned="g4",
                   scan_skew=-0.012, scan_specks=30)
    with open(FIXTURE_G4_PDF, "wb") as fh:
        fh.write(g4)  # golden: the plain scan fixture's elements


def _fixture_bytes() -> bytes:
    with open(FIXTURE_PDF, "rb") as fh:
        return fh.read()


def test_writer_is_byte_stable_vs_fixture():
    assert build_pdf(FIXTURE_TOKENS, compress=True,
                     style="tm") == _fixture_bytes()


def test_parser_matches_checked_in_golden():
    with open(FIXTURE_GOLDEN, encoding="utf-8") as fh:
        want = json.load(fh)
    got = parse_real_pdf(_fixture_bytes())
    assert got == want
    texts = [e["text"] for e in got]
    assert r"Grünbau & (Söhne) GmbH \ Co." in texts
    assert "1.250.000 €" in texts
    assert "m²" in texts
    assert {e["page_num"] for e in got} == {1, 2}
    assert all(e["confidence"] == 1.0 for e in got)


def test_fixture_through_full_kernel():
    res = extract_document("u", _fixture_bytes())
    assert res["doc_kind"] == "pdf"
    assert res["page_count"] == 2
    labels = {p["label"] for p in res["pairs"]}
    # split fragments merged on the CHAR_W grid → "Loan / Amount"
    assert "Loan / Amount" in labels
    assert res["extracted_text"].startswith(
        "Grünbau & (Söhne) GmbH Application 1")


def test_all_writer_styles_round_trip():
    for style in ("tm", "td", "tj"):
        for compress in (False, True):
            pdf = build_pdf(FIXTURE_TOKENS, compress=compress, style=style)
            got = parse_real_pdf(pdf)
            assert [(e["page_num"], e["text"],
                     e["bbox"]["x1"], e["bbox"]["y1"]) for e in got] == [
                (p + 1, t, x, y)
                for p, toks in enumerate(FIXTURE_TOKENS)
                for x, y, t, _ in toks]


# --- object streams (/ObjStm, PDF >=1.5) ------------------------------------


def test_objstm_round_trips_identically():
    """Packing the dict objects (catalog, page tree, fonts, pages)
    into a /Type /ObjStm container must parse to the identical
    elements as the flat layout — for both fonts, compressed and
    not."""
    for font in ("simple", "cid"):
        for compress in (False, True):
            packed = build_pdf(FIXTURE_TOKENS, compress=compress,
                               style="tm", font=font, objstm=True)
            flat = build_pdf(FIXTURE_TOKENS, compress=compress,
                             style="tm", font=font)
            assert packed.startswith(b"%PDF-1.5")
            assert b"/ObjStm" in packed
            assert b"<< /Type /Catalog" not in packed.split(
                b"stream", 1)[0]  # catalog lives inside the container
            assert parse_real_pdf(packed) == parse_real_pdf(flat)


def test_objstm_handcrafted_minimal():
    """A hand-written ObjStm document (independent of our writer):
    catalog + pages + page dicts in the container, content stream at
    top level."""
    objects = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            b" /MediaBox [0 0 612 792] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    blob, pairs = b"", []
    for num, body in objects:
        pairs.append(b"%d %d" % (num, len(blob)))
        blob += body + b"\n"
    header = b" ".join(pairs) + b"\n"
    data = header + blob
    content = b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (packed text) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        b"4 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(header)).encode() + b" /Length "
        + str(len(data)).encode() + b" >>\nstream\n" + data
        + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    els = parse_real_pdf(pdf)
    assert [e["text"] for e in els] == ["packed text"]
    assert els[0]["page_num"] == 1


def test_objstm_malformed_contributes_nothing():
    # junk Flate bytes / missing /N — parser must not raise
    pdf = (b"%PDF-1.5\n"
           b"4 0 obj\n<< /Type /ObjStm /N 2 /First 10 /Length 5"
           b" /Filter /FlateDecode >>\nstream\njunk!\nendstream\n"
           b"endobj\n%%EOF\n")
    assert parse_real_pdf(pdf) == []


# --- composite (Identity-H + ToUnicode) fonts ------------------------------


def _cid_fixture_bytes() -> bytes:
    with open(FIXTURE_CID_PDF, "rb") as fh:
        return fh.read()


def test_cid_writer_is_byte_stable_vs_fixture():
    assert build_pdf(FIXTURE_TOKENS, compress=True, style="tm",
                     font="cid") == _cid_fixture_bytes()


def test_cid_parser_matches_checked_in_golden():
    with open(FIXTURE_CID_GOLDEN, encoding="utf-8") as fh:
        want = json.load(fh)
    got = parse_real_pdf(_cid_fixture_bytes())
    assert got == want
    texts = [e["text"] for e in got]
    assert r"Grünbau & (Söhne) GmbH \ Co." in texts
    assert "1.250.000 €" in texts and "m²" in texts


def test_cid_elements_equal_simple_font_elements():
    """The Identity-H path must land on the identical element records
    as the WinAnsi path — same text, same CHAR_W geometry — so the
    downstream kernel can't tell the encodings apart."""
    assert parse_real_pdf(_cid_fixture_bytes()) == parse_real_pdf(
        _fixture_bytes())


def test_cid_fixture_through_full_kernel():
    res = extract_document("u", _cid_fixture_bytes())
    assert res["doc_kind"] == "pdf"
    assert res["page_count"] == 2
    assert "Loan / Amount" in {p["label"] for p in res["pairs"]}
    assert res["extracted_text"].startswith(
        "Grünbau & (Söhne) GmbH Application 1")


def test_cid_all_styles_round_trip():
    for style in ("tm", "td", "tj"):
        for compress in (False, True):
            pdf = build_pdf(FIXTURE_TOKENS, compress=compress,
                            style=style, font="cid")
            got = parse_real_pdf(pdf)
            assert [(e["page_num"], e["text"],
                     e["bbox"]["x1"], e["bbox"]["y1"]) for e in got] == [
                (p + 1, t, x, y)
                for p, toks in enumerate(FIXTURE_TOKENS)
                for x, y, t, _ in toks]


def test_tounicode_cmap_forms_and_unmapped_cids():
    from credit_ocr_system_spark.kernel.pdf_text import (
        _parse_tounicode,
    )

    cmap = _parse_tounicode(
        b"2 beginbfchar\n<0041> <0058>\n<00FC> <00FC>\nendbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"            # increment form: a b c
        b"<0020> <0022> [<0041> <0042 0043> <20AC>]\n"  # array form
        b"endbfrange\n")
    assert cmap[0x41] == "X" and cmap[0xFC] == "ü"
    assert (cmap[0x10], cmap[0x11], cmap[0x12]) == ("a", "b", "c")
    assert cmap[0x20] == "A" and cmap[0x21] == "BC"
    assert cmap[0x22] == "€"
    # a CID the CMap doesn't cover decodes to U+FFFD, never raises
    pdf = build_pdf([[(40.0, 20.0, "AB", 12.0)]], style="tm",
                    font="cid")
    broken = pdf.replace(b"<00410042>", b"<F0F10042>")
    els = parse_real_pdf(broken)
    assert els[0]["text"] == "�B"


def _wrap_stream(content: bytes, n_pages: int = 1,
                 media: bytes = b"/MediaBox [0 0 612 792]") -> bytes:
    """One-page PDF around a raw content stream (uncompressed)."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 " + media
        + b" >>\nendobj\n"
        b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" >>\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\n"
        b"endobj\n"
        b"5 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")


def test_quote_tstar_and_leading_operators():
    content = (b"BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm\n"
               b"(line one) Tj\n"
               b"(line two) '\n"          # ' = T* + show
               b"1 2 (line three) \"\n"   # " = aw ac T* + show
               b"T* (line four) Tj\nET")
    els = parse_real_pdf(_wrap_stream(content))
    assert [e["text"] for e in els] == [
        "line one", "line two", "line three", "line four"]
    ys = [e["bbox"]["y1"] for e in els]
    # each line drops by the 14pt leading (top-down y grows)
    assert all(b - a == 14.0 for a, b in zip(ys, ys[1:]))
    # ' and " reset x to the line start
    assert {e["bbox"]["x1"] for e in els} == {50.0}


def test_hex_strings_and_octal_escapes():
    content = (b"BT /F1 12 Tf 1 0 0 1 10 700 Tm "
               b"<48656C 6C6F> Tj "
               b"1 0 0 1 10 650 Tm (A\\101\\56 \\n B) Tj ET")
    els = parse_real_pdf(_wrap_stream(content))
    assert els[0]["text"] == "Hello"
    assert els[1]["text"] == "AA. \n B"


def test_tj_kerning_narrows_width():
    plain = b"BT /F1 10 Tf 1 0 0 1 0 700 Tm [(ab) (cd)] TJ ET"
    kerned = b"BT /F1 10 Tf 1 0 0 1 0 700 Tm [(ab) 100 (cd)] TJ ET"
    w_plain = parse_real_pdf(_wrap_stream(plain))[0]["bbox"]["width"]
    w_kern = parse_real_pdf(_wrap_stream(kerned))[0]["bbox"]["width"]
    assert parse_real_pdf(_wrap_stream(kerned))[0]["text"] == "abcd"
    assert w_plain - w_kern == 1.0  # 100/1000 * fs 10


def test_mediabox_inheritance_and_override():
    content = b"BT /F1 12 Tf 1 0 0 1 0 100 Tm (x) Tj ET"
    # inherited 612x792: y_top = 792 - 100 - 9.6
    els = parse_real_pdf(_wrap_stream(content))
    assert els[0]["bbox"]["y1"] == 682.4
    # page-level MediaBox overrides the inherited one
    pdf = _wrap_stream(content).replace(
        b"/Contents 5 0 R",
        b"/Contents 5 0 R /MediaBox [0 0 400 500]")
    els = parse_real_pdf(pdf)
    assert els[0]["bbox"]["y1"] == 390.4


def test_contents_array_concatenates_streams():
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT /F1 12 Tf 1 0 0 1 0 700 Tm (a) Tj ET\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT /F1 12 Tf 1 0 0 1 0 600 Tm (b) Tj ET\nendstream\nendobj\n"
        b"%%EOF\n")
    assert [e["text"] for e in parse_real_pdf(pdf)] == ["a", "b"]


def test_malformed_inputs_never_raise():
    cases = [
        b"%PDF",                                  # bare magic
        b"%PDF-1.7\nnothing here",                # no objects
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n",  # no pages
        # declared FlateDecode but junk bytes
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 5 /Filter /FlateDecode >>\nstream\n"
        b"junk!\nendstream\nendobj\n",
        # unsupported filter
        b"%PDF-1.4\n3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 3 /Filter /DCTDecode >>\nstream\n"
        b"\xff\xd8\xff\nendstream\nendobj\n",
        # cyclic page tree must not loop forever
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n",
        b"\x00" * 64,
        b"",
    ]
    for payload in cases:
        assert parse_real_pdf(payload) == []
        # dispatch through the kernel never raises either
        res = extract_document("u", b"%PDF-1.4\n" + payload)
        assert res["doc_kind"] == "pdf"


def test_compressed_stream_containing_pdf_keywords():
    """Flate bytes that happen to contain ``endobj``/``N 0 obj``
    patterns must not derail the sequential object scan."""
    # craft content whose compressed form we then scan for patterns;
    # regardless of whether the patterns occur, parsing must succeed
    content = b"BT /F1 12 Tf 1 0 0 1 0 700 Tm (needle text) Tj ET"
    raw = zlib.compress(b"endobj\n7 0 obj\nstream\n" * 30, 0)[2:-4]
    # wrap: legit flate stream whose body embeds stored-mode zlib bytes
    data = zlib.compress(content + b"% " + raw[:64], 6)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + data
        + b"\nendstream\nendobj\n%%EOF\n")
    els = parse_real_pdf(pdf)
    assert [e["text"] for e in els] == ["needle text"]


def test_graft_payloads_unaffected():
    graft = (b"%PDF-GRAFT 1\n"
             b"E\t1\t40.0\t60.0\t120.0\t80.0\t0.95\tCompany Name:\n"
             b"E\t1\t300.0\t60.0\t400.0\t80.0\t0.9\tAcme GmbH\n")
    els = parse_pdf_tokens(graft)
    assert [e["text"] for e in els] == ["Company Name:", "Acme GmbH"]
    assert els[0]["confidence"] == 0.95


if __name__ == "__main__":
    make_fixture()
    print(f"wrote {FIXTURE_PDF} and {FIXTURE_GOLDEN}")


def test_incremental_update_newest_revision_wins():
    """A PDF incremental update appends the new revision of an object
    after the original; the scanner resolves duplicate numbers by
    file order (last wins), so the UPDATED content extracts."""
    base = _wrap_stream(
        b"BT /F1 12 Tf 1 0 0 1 50 700 Tm (original text) Tj ET")
    new_content = (b"BT /F1 12 Tf 1 0 0 1 50 700 Tm "
                   b"(updated text) Tj ET")
    updated = (base
               + b"5 0 obj\n<< /Length "
               + str(len(new_content)).encode()
               + b" >>\nstream\n" + new_content
               + b"\nendstream\nendobj\n"
               b"trailer\n<< /Size 6 /Root 1 0 R /Prev 9 >>\n%%EOF\n")
    assert [e["text"] for e in parse_real_pdf(base)] == ["original text"]
    assert [e["text"] for e in parse_real_pdf(updated)] == [
        "updated text"]


def test_aes256_writer_is_byte_stable_vs_fixture():
    assert build_pdf(FIXTURE_TOKENS, compress=True, style="tm",
                     encrypt="aes256") == open(FIXTURE_AES_PDF,
                                               "rb").read()


def test_aes256_fixture_matches_plain_golden():
    # the encrypted twin must extract EXACTLY the plain fixture's
    # checked-in golden elements
    with open(FIXTURE_GOLDEN, encoding="utf-8") as fh:
        golden = json.load(fh)
    with open(FIXTURE_AES_PDF, "rb") as fh:
        assert parse_real_pdf(fh.read()) == golden


def test_scanned_writer_is_byte_stable_vs_fixture():
    assert build_pdf(FIXTURE_SCAN_TOKENS, scanned="flate") == open(
        FIXTURE_SCAN_PDF, "rb").read()


def test_scanned_fixture_matches_checked_in_golden():
    with open(FIXTURE_SCAN_GOLDEN, encoding="utf-8") as fh:
        want = json.load(fh)
    with open(FIXTURE_SCAN_PDF, "rb") as fh:
        got = parse_real_pdf(fh.read())
    assert got == want
    texts = [e["text"] for e in got]
    # OCR merges the 6-pt split fragments into one spaced token
    assert "Loan Amount:" in texts
    assert "1.250.000 €" in texts
    assert {e["page_num"] for e in got} == {1, 2}


def test_scanned_fixture_through_full_kernel():
    with open(FIXTURE_SCAN_PDF, "rb") as fh:
        res = extract_document("u", fh.read())
    assert res["doc_kind"] == "pdf"
    assert res["page_count"] == 2
    values = {p["label"]: p["value"] for p in res["pairs"]}
    assert values.get("Loan Amount") == "1.250.000 €"
    assert res["extracted_text"].startswith(
        "Grünbau & (Söhne) GmbH Application 1")


def test_g4_fixture_byte_stable_and_matches_scan_golden():
    assert build_pdf(FIXTURE_SCAN_TOKENS, scanned="g4",
                     scan_skew=-0.012, scan_specks=30) == open(
        FIXTURE_G4_PDF, "rb").read()
    with open(FIXTURE_SCAN_GOLDEN, encoding="utf-8") as fh:
        want = json.load(fh)
    with open(FIXTURE_G4_PDF, "rb") as fh:
        assert parse_real_pdf(fh.read()) == want


def test_inline_image_scans_equal_xobject_scans():
    # BI…ID…EI inline images (ISO 32000 §8.9.7, the fax-to-PDF
    # shape) must extract identically to the same raster placed as
    # an image XObject, across every scan encoding and under
    # encryption/objstm packaging
    for mode in ("flate", "bilevel", "g4", "dct"):
        want = parse_real_pdf(
            build_pdf(FIXTURE_SCAN_TOKENS, scanned=mode))
        got = parse_real_pdf(
            build_pdf(FIXTURE_SCAN_TOKENS, scanned=mode,
                      scan_inline=True))
        assert got == want and len(got) > 0, mode
    want = parse_real_pdf(
        build_pdf(FIXTURE_SCAN_TOKENS, scanned="flate",
                  scan_skew=-0.012, scan_specks=30))
    for kw in ({"encrypt": "rc4-128"}, {"objstm": True}):
        got = parse_real_pdf(
            build_pdf(FIXTURE_SCAN_TOKENS, scanned="flate",
                      scan_skew=-0.012, scan_specks=30,
                      scan_inline=True, **kw))
        assert got == want, kw


def test_inline_image_unfiltered_exact_length():
    # no /F: the data length is exact (h * ceil(w*bpc/8)) — the EI
    # scan must not be fooled by 'EI'-looking bytes inside raw data
    import numpy as np
    from credit_ocr_system_spark.kernel.pdf_text import _inline_images
    img = np.full((16, 24), 255, np.uint8)
    img[4:8, 4:20] = 0
    raw = img.tobytes().replace(b"\xff\xff\xff\xff", b" EI ", 1)
    img2 = np.frombuffer(raw, np.uint8).reshape(16, 24)
    content = (b"q 24 0 0 16 0 0 cm BI /W 24 /H 16 /CS /G /BPC 8"
               b" ID\n" + raw + b"\nEI Q")
    placed = _inline_images(content)
    assert len(placed) == 1
    assert (placed[0][2] == img2).all()


def test_inline_image_corrupt_inputs_are_skipped():
    # adversarial/corrupt BI sequences must be skipped, never raise
    from credit_ocr_system_spark.kernel.pdf_text import _inline_images
    cases = [
        b"q 10 0 0 10 0 0 cm BI /W 4 /H 4 /CS /G /BPC 8 /F /Fl ID\n\x01",
        b"BI /W 4 /H 4 /CS /G /BPC 8",        # no ID
        b"BI /W 0 /H 5 /CS /G /BPC 8 ID\n\nEI ",   # zero width
        b"BI /W 5 /H 0 /CS /G /BPC 8 ID\n\nEI ",   # zero height
        b"BI /W 999999 /H 999999 /CS /G /BPC 8 ID\nxx\nEI ",
        b"BI /W 4 /H 4 /CS /G /BPC 8 /F /Fl ID\nnotflate\nEI ",
        b"BI /W 8 /H 8 /CS /G /BPC 8 ID\nab",  # truncated raw
        b"BI /H 4 /CS /G ID\nxxxx\nEI ",       # missing /W
    ]
    for c in cases:
        assert _inline_images(c) == [], c[:30]


def test_decode_image_inversion_and_predictors():
    # /Decode [1 0], /BlackIs1, and PNG predictors on image samples
    import numpy as np
    from credit_ocr_system_spark.kernel.g4 import encode_g4
    from credit_ocr_system_spark.kernel.pdf_text import _decode_image
    ink = np.zeros((10, 16), bool)
    ink[3:7, 2:14] = True
    grey = np.where(ink, np.uint8(0), np.uint8(255))

    # G4: all four BlackIs1 × Decode combinations
    g4 = encode_g4(ink)
    base = rb"/Width 16 /Height 10 /BitsPerComponent 1"
    head = base + rb" /Filter /CCITTFaxDecode /DecodeParms << /K -1 >>"
    assert (_decode_image(head, g4) == grey).all()
    assert (_decode_image(
        head + rb" /BlackIs1 true", g4) == 255 - grey).all()
    assert (_decode_image(
        head + rb" /Decode [1 0]", g4) == 255 - grey).all()
    assert (_decode_image(
        head + rb" /BlackIs1 true /Decode [1 0]", g4) == grey).all()

    # 8-bit Flate with /Decode [1 0]
    import zlib as _z
    data = _z.compress(grey.tobytes())
    head8 = (rb"/Width 16 /Height 10 /BitsPerComponent 8"
             rb" /Filter /FlateDecode")
    assert (_decode_image(head8, data) == grey).all()
    assert (_decode_image(
        head8 + rb" /Decode [1 0]", data) == 255 - grey).all()

    # 1-bit Flate with /Decode [1 0] (1=white default, inverted)
    bits = np.packbits(grey >= 128, axis=1)
    d1 = _z.compress(bits.tobytes())
    head1 = (rb"/Width 16 /Height 10 /BitsPerComponent 1"
             rb" /Filter /FlateDecode")
    assert (_decode_image(head1, d1) == grey).all()
    assert (_decode_image(
        head1 + rb" /Decode [1 0]", d1) == 255 - grey).all()

    # PNG Up-predictor (type 2) rows on 8-bit samples
    rows = []
    prior = bytes(16)
    for r in range(10):
        raw = grey[r].tobytes()
        rows.append(bytes([2]) + bytes(
            (raw[k] - prior[k]) & 0xFF for k in range(16)))
        prior = raw
    pred = _z.compress(b"".join(rows))
    headp = head8 + rb" /DecodeParms << /Predictor 12 /Columns 16 >>"
    assert (_decode_image(headp, pred) == grey).all()


def test_decode_image_filter_chains():
    # full byte-level chains on image streams: raw samples behind
    # LZW / A85+Flate, and a chain prefix before the G4/JPEG codec
    import numpy as np
    import zlib as _z
    import base64
    from credit_ocr_system_spark.kernel.g4 import encode_g4
    from credit_ocr_system_spark.kernel.pdf_text import _decode_image
    ink = np.zeros((10, 16), bool)
    ink[3:7, 2:14] = True
    grey = np.where(ink, np.uint8(0), np.uint8(255))

    def a85(data: bytes) -> bytes:
        return base64.a85encode(data) + b"~>"

    # [/ASCII85Decode /FlateDecode] on raw 8-bit samples
    head = (rb"/Width 16 /Height 10 /BitsPerComponent 8"
            rb" /Filter [/ASCII85Decode /FlateDecode]")
    assert (_decode_image(head, a85(_z.compress(grey.tobytes())))
            == grey).all()

    # A85 prefix before CCITT G4
    g4 = encode_g4(ink)
    headg = (rb"/Width 16 /Height 10 /BitsPerComponent 1"
             rb" /Filter [/ASCII85Decode /CCITTFaxDecode]"
             rb" /DecodeParms [null << /K -1 >>]")
    assert (_decode_image(headg, a85(g4)) == grey).all()

    # Flate prefix before DCT (JPEG-in-Flate: some optimizers do this)
    from credit_ocr_system_spark.kernel.jpeg import encode_jpeg
    rgb = np.stack([grey, grey, grey], axis=-1)
    jpg = encode_jpeg(rgb, 95)
    headd = (rb"/Width 16 /Height 10 /BitsPerComponent 8"
             rb" /Filter [/FlateDecode /DCTDecode]")
    out = _decode_image(headd, _z.compress(jpg))
    assert out is not None and out.shape == (10, 16)

    # unsupported member in the chain -> None, never an exception
    headu = (rb"/Width 16 /Height 10 /BitsPerComponent 8"
             rb" /Filter [/JPXDecode /FlateDecode]")
    assert _decode_image(headu, b"whatever") is None


def test_type3_font_round_trips_like_simple():
    # Type3: /CharProcs glyph streams, /Encoding /Differences with
    # uniXXXX names, GLYPH-SPACE /Widths mapped through /FontMatrix
    # [0.01 ...] (width 50 = 0.5 em). A parser that ignored the
    # matrix would compute 0.05-em advances and shift every bbox.
    want = parse_real_pdf(build_pdf(FIXTURE_TOKENS))
    for kw in ({}, {"compress": True}, {"objstm": True},
               {"encrypt": "rc4-128"}):
        got = parse_real_pdf(build_pdf(FIXTURE_TOKENS, font="type3",
                                       **kw))
        assert got == want and len(got) > 0, kw


def test_type3_fontmatrix_scales_detuned_widths():
    # hand-build a Type3 with width 80 under FontMatrix 0.01: the
    # advance must be 0.8 em, not 80/1000 em
    pdf = build_pdf([[(40.0, 60.0, "AB", 10.0)]], font="type3")
    wide = pdf.replace(b"/Widths [50 50]", b"/Widths [80 80]")
    assert wide != pdf
    e_narrow = parse_real_pdf(pdf)[0]
    e_wide = parse_real_pdf(wide)[0]
    assert e_narrow["text"] == e_wide["text"] == "AB"
    # two glyphs at 10 pt: 0.5 em -> 10 wide, 0.8 em -> 16 wide
    assert round(e_narrow["bbox"]["width"], 2) == 10.0
    assert round(e_wide["bbox"]["width"], 2) == 16.0


def test_cid_w_array_drives_advances():
    # composite-font /W per-CID metrics (ISO 32000 §9.7.4.3): both
    # array forms must drive the advance; unlisted CIDs use /DW
    pdf = build_pdf([[(40.0, 60.0, "AB", 10.0)]], font="cid")
    assert b"/DW 500" in pdf
    base = parse_real_pdf(pdf)[0]
    assert base["text"] == "AB"
    assert round(base["bbox"]["width"], 2) == 10.0  # 2 × 0.5 em @10pt
    # form 1: c [w1 w2 ...] — A(65)→800, B(66)→300
    wide = pdf.replace(b"/DW 500 >>", b"/DW 500 /W [65 [800 300]] >>")
    assert wide != pdf
    e = parse_real_pdf(wide)[0]
    assert e["text"] == "AB"
    assert round(e["bbox"]["width"], 2) == 11.0  # (0.8 + 0.3) em @10pt
    # form 2: cFirst cLast w — 65..66 → 700
    rng = pdf.replace(b"/DW 500 >>", b"/DW 500 /W [65 66 700] >>")
    e2 = parse_real_pdf(rng)[0]
    assert round(e2["bbox"]["width"], 2) == 14.0
    # /DW honored for unlisted CIDs
    dw = pdf.replace(b"/DW 500 >>", b"/DW 600 /W [65 [800]] >>")
    e3 = parse_real_pdf(dw)[0]
    assert round(e3["bbox"]["width"], 2) == 14.0  # 0.8 + 0.6 em @10pt


def test_tounicode_less_cid_recovers_text_via_ttf_cmap():
    # Type0/Identity-H with NO /ToUnicode (common in older
    # generators): codes are GIDs into the embedded /FontFile2; text
    # must be recovered by inverting the TTF's cmap. The writer
    # assigns NON-identity GIDs (1..n in char order), so reading
    # codes as codepoints would yield control-character garbage.
    want = parse_real_pdf(build_pdf(FIXTURE_TOKENS))
    for kw in ({}, {"compress": True}, {"objstm": True},
               {"style": "tj"}):
        pdf = build_pdf(FIXTURE_TOKENS, font="cid",
                        cid_tounicode=False, **kw)
        assert b"/ToUnicode" not in pdf and b"/FontFile2" in pdf
        got = parse_real_pdf(pdf)
        assert got == want and len(got) > 0, kw


def test_ttf_cmap_format12_and_malformed():
    import struct
    from credit_ocr_system_spark.kernel.ttf import gid_to_unicode
    # hand-built sfnt with a format-12 subtable: two groups, one
    # supplementary-plane (emoji) — format 4 cannot express it
    groups = [(0x41, 0x43, 10), (0x1F600, 0x1F601, 99)]
    sub = struct.pack(">HHIII", 12, 0, 0, 16 + 12 * len(groups),
                      len(groups))
    for s, e, g in groups:
        sub += struct.pack(">III", s, e, g)
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 10, 12) \
        + sub
    font = (struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
            + b"cmap" + struct.pack(">III", 0, 28, len(cmap)) + cmap)
    inv = gid_to_unicode(font)
    assert inv[10] == "A" and inv[12] == "C"
    assert inv[99] == "😀" and inv[100] == "😁"
    # malformed inputs: never raise, just {}
    for bad in (b"", b"\x00\x01\x00\x00", font[:20], b"x" * 64,
                font.replace(b"cmap", b"xxxx")):
        assert gid_to_unicode(bad) == {}


def test_macroman_encoded_simple_font():
    # /Encoding /MacRomanEncoding: umlauts/accents live at different
    # byte positions than WinAnsi — the emitted bytes differ, the
    # parsed text must not. Tokens restricted to MacRoman's
    # repertoire (² for instance does not exist there).
    toks = [[(40.0, 20.0, "Grünbau & (Söhne) GmbH — café", 16.0),
             (40.0, 60.0, "Darlehenssumme:", 12.0),
             (300.0, 60.0, "1.250.000 ÷ 2 ≈ 625.000", 12.0)]]
    want = [t for _x, _y, t, _fs in toks[0]]
    pdf = build_pdf(toks, font="macroman")
    assert b"/MacRomanEncoding" in pdf
    # the umlaut/accent/math bytes genuinely differ from WinAnsi
    # (≈ does not even exist in cp1252)
    assert pdf.replace(b" /Encoding /MacRomanEncoding", b"") \
        != build_pdf(toks)
    for kw in ({}, {"compress": True}, {"style": "tj"},
               {"objstm": True}):
        got = parse_real_pdf(build_pdf(toks, font="macroman", **kw))
        assert [e["text"] for e in got] == want, kw


def test_truncated_pdfs_degrade_gracefully():
    # crawl data is full of cut-off downloads: a truncated PDF must
    # never raise, and whatever objects survived the cut must still
    # extract (monotone degradation, not all-or-nothing)
    pdf = build_pdf(FIXTURE_TOKENS, compress=True)
    full = parse_real_pdf(pdf)
    assert len(full) > 0
    prev = len(full)
    for frac in (0.95, 0.8, 0.6, 0.4, 0.2, 0.05):
        got = parse_real_pdf(pdf[:int(len(pdf) * frac)])
        texts_full = {(e["page_num"], e["text"]) for e in full}
        for e in got:  # anything recovered matches the full parse
            assert (e["page_num"], e["text"]) in texts_full
        assert len(got) <= prev  # monotone with deeper cuts
        prev = len(got)


def test_font_packaging_equivalence_property():
    # one layout, every font representation and packaging: the parsed
    # elements must be IDENTICAL — fonts and containers are encoding,
    # never semantics. Alphabet restricted to the intersection of
    # WinAnsi and MacRoman repertoires so every variant can carry it.
    from hypothesis import given, settings, strategies as st

    alphabet = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                "0123456789 .,:;()&%/-äöüÄÖÜßéèàç")
    token = st.tuples(
        st.integers(2, 28), st.integers(1, 25),
        st.text(alphabet, min_size=1, max_size=18),
        st.sampled_from([10.0, 12.0, 16.0]))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(token, min_size=1, max_size=8))
    def check(raw):
        toks = [[(20.0 * gx, 28.0 * gy, t.strip() or "x", fs)
                 for gx, gy, t, fs in raw]]
        variants = [
            dict(font="simple"),
            dict(font="simple", style="td"),
            dict(font="simple", style="tj", compress=True),
            dict(font="cid"),
            dict(font="cid", cid_tounicode=False),
            dict(font="cid", objstm=True),
            dict(font="type3"),
            dict(font="macroman"),
            dict(font="widths"),
        ]
        parses = [parse_real_pdf(build_pdf(toks, **kw))
                  for kw in variants]
        texts0 = [(e["page_num"], e["text"]) for e in parses[0]]
        for kw, p in zip(variants, parses):
            assert [(e["page_num"], e["text"]) for e in p] == texts0, kw
        # geometry additionally identical for the fixed-metrics fonts
        # (widths/detuned fonts legitimately differ in x2)
        for kw, p in zip(variants[:8], parses[:8]):
            assert [(e["bbox"]["x1"], e["bbox"]["y1"]) for e in p] \
                == [(e["bbox"]["x1"], e["bbox"]["y1"])
                    for e in parses[0]], kw

    check()
