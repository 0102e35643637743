"""AcroForm / annotation text: filled form fields carry their values
in /Widget annotations' /V (and FreeText notes in /Contents), not in
content streams — the document shape of the reference's credit
applications. The extraction contract: a widget value lands at its
/Rect exactly like the same text drawn as a content token, through
every payload variant (encryption encrypts strings too, ObjStm packs
the dicts, forms wrap the page).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.pdf_layout import parse_pdf_tokens  # noqa: E402
from credit_ocr_system_spark.kernel.pdf_text import parse_real_pdf  # noqa: E402
from credit_ocr_system_spark.sources.pdf_write import (  # noqa: E402
    CHAR_W,
    FONT_SIZE,
    build_pdf,
)

VAL = "Quantum Foundry GmbH"
TOKS = [[(40.0, 60.0, "Company Name:", FONT_SIZE)]]
ANNOTS = [[(300.0, 60.0, CHAR_W * len(VAL), FONT_SIZE, VAL)]]
REF_TOKS = [[(40.0, 60.0, "Company Name:", FONT_SIZE),
             (300.0, 60.0, VAL, FONT_SIZE)]]


def _geom(pdf: bytes):
    return [(e["text"], e["bbox"]["x1"], e["bbox"]["y1"],
             e["bbox"]["x2"]) for e in parse_pdf_tokens(pdf)]


def test_widget_value_equals_content_token():
    a = build_pdf(TOKS, annots=ANNOTS, compress=True)
    b = build_pdf(REF_TOKS, compress=True)
    assert _geom(a) == _geom(b)


def test_widget_under_every_variant():
    for kw in [dict(encrypt="rc4-40"), dict(encrypt="rc4-128"),
               dict(encrypt="aesv2"), dict(encrypt="aes256"),
               dict(objstm=True), dict(objstm=True, encrypt="aesv2"),
               dict(form_xobject=True, encrypt="rc4-128"),
               dict(stream_filter="lzw")]:
        a = build_pdf(TOKS, annots=ANNOTS, compress=True, **kw)
        b = build_pdf(REF_TOKS, compress=True, **kw)
        assert _geom(a) == _geom(b), kw


def test_widget_pairs_with_printed_label_through_kernel():
    from credit_ocr_system_spark.kernel.extract import extract_document
    pdf = build_pdf(TOKS, annots=ANNOTS, compress=True)
    res = extract_document("u", pdf)
    assert res["doc_kind"] == "pdf"
    pairs = {p["label"]: p["value"] for p in res["pairs"]}
    assert pairs.get("Company Name") == VAL


def test_handcrafted_annotations():
    # hand-built, independent of the writer: FreeText /Contents,
    # Widget string /V, Widget checkbox name /V, empty /V skipped
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Annots [5 0 R 6 0 R 7 0 R 8 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 0 >>\nstream\n\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Annot /Subtype /FreeText"
        b" /Rect [50 700 200 712] /Contents (a sticky note) >>\nendobj\n"
        b"6 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx"
        b" /Rect [50 650 200 662] /V (filled value) >>\nendobj\n"
        b"7 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Btn"
        b" /Rect [50 600 62 612] /V /Yes >>\nendobj\n"
        b"8 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx"
        b" /Rect [50 550 200 562] /V () >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    els = parse_real_pdf(pdf)
    assert [(e["text"], e["bbox"]["y1"]) for e in els] == [
        ("a sticky note", 80.0),     # 792 - 712
        ("filled value", 130.0),
        ("Yes", 180.0),
    ]


def test_utf16_annotation_string():
    val = "Grünbau — ÄÖÜ"
    raw = b"\xfe\xff" + val.encode("utf-16-be")
    esc = raw.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
             .replace(b")", rb"\)")
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Annots [5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 0 >>\nstream\n\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx"
        b" /Rect [50 650 200 662] /V (" + esc + b") >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    els = parse_real_pdf(pdf)
    assert [e["text"] for e in els] == [val]
