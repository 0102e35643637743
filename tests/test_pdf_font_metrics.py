"""Simple-font /Widths metrics and /Encoding /Differences overrides —
real-world PDFs carry per-glyph advances and custom encodings that
the average-width/WinAnsi model alone would misplace or misdecode.
"""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.pdf_text import (  # noqa: E402
    _glyph_to_char,
    parse_real_pdf,
)


def _pdf(content: bytes, font_extra: bytes = b"",
         extra_objects: bytes = b"") -> bytes:
    stream = zlib.compress(content)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R"
        b" /MediaBox [0 0 612 792]"
        b" /Resources << /Font << /F1 5 0 R >> >>"
        b" /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1"
        b" /BaseFont /Helvetica " + font_extra + b">>\nendobj\n"
        + extra_objects
        + b"%%EOF\n")


CONTENT = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (AB) Tj (CD) Tj ET"


def test_widths_drive_the_advance():
    # A=600, B=400 units -> "AB" advances 10*(600+400)/1000 = 10pt;
    # without /Widths the average model gives 2*5 = 10pt too, so use
    # asymmetric values that differ from it
    pdf = _pdf(CONTENT, b"/FirstChar 65 /Widths [600 400 800 200] ")
    els = parse_real_pdf(pdf)
    assert [e["text"] for e in els] == ["AB", "CD"]
    ab, cd = els
    assert ab["bbox"]["width"] == 10.0          # (600+400)/1000*10
    assert cd["bbox"]["x1"] == ab["bbox"]["x2"]  # cursor advanced
    assert cd["bbox"]["width"] == 10.0          # (800+200)/1000*10
    # and the default model (no /Widths) gives the same TOTAL here,
    # but different glyph split: check an asymmetric case end-to-end
    plain = parse_real_pdf(_pdf(CONTENT))
    assert plain[1]["bbox"]["x1"] == plain[0]["bbox"]["x2"]


def test_widths_change_positions_vs_average_model():
    pdf = _pdf(CONTENT, b"/FirstChar 65 /Widths [900 900 900 900] ")
    wide = parse_real_pdf(pdf)
    plain = parse_real_pdf(_pdf(CONTENT))
    assert wide[0]["bbox"]["width"] == 18.0     # 2 * 0.9em * 10pt
    assert plain[0]["bbox"]["width"] == 10.0    # 2 * 0.5em * 10pt
    assert wide[1]["bbox"]["x1"] > plain[1]["bbox"]["x1"]


def test_widths_indirect_array():
    pdf = _pdf(CONTENT,
               b"/FirstChar 65 /Widths 6 0 R ",
               b"6 0 obj\n[600 400 800 200]\nendobj\n")
    els = parse_real_pdf(pdf)
    assert els[0]["bbox"]["width"] == 10.0
    assert els[1]["bbox"]["x1"] == els[0]["bbox"]["x2"]


def test_codes_outside_widths_use_average_fallback():
    pdf = _pdf(b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (AZ) Tj ET",
               b"/FirstChar 65 /Widths [800] ")
    (el,) = parse_real_pdf(pdf)
    assert el["bbox"]["width"] == 13.0          # 800/1000*10 + 0.5*10


def test_differences_remap_decoding():
    # code 65 ('A' in cp1252) remapped to 'adieresis', 66 to /uni20AC
    pdf = _pdf(CONTENT,
               b"/Encoding << /Differences"
               b" [65 /adieresis /uni20AC] >> ")
    els = parse_real_pdf(pdf)
    assert els[0]["text"] == "ä€"
    assert els[1]["text"] == "CD"   # unmapped codes stay WinAnsi


def test_differences_with_gaps_and_unknown_names():
    pdf = _pdf(CONTENT,
               b"/Encoding << /Differences"
               b" [66 /germandbls 68 /gUnknownGlyph] >> ")
    els = parse_real_pdf(pdf)
    assert els[0]["text"] == "Aß"   # 65 untouched, 66 remapped
    assert els[1]["text"] == "CD"   # unknown name: cp1252 fallback


def test_glyph_name_rules():
    assert _glyph_to_char("a") == "a"
    assert _glyph_to_char("Z") == "Z"
    assert _glyph_to_char("seven") == "7"
    assert _glyph_to_char("uni00E9") == "é"
    assert _glyph_to_char("u20AC") == "€"
    assert _glyph_to_char("Euro") == "€"
    assert _glyph_to_char("notarealname") is None


def test_differences_and_widths_compose():
    pdf = _pdf(CONTENT,
               b"/FirstChar 65 /Widths [600 400 800 200]"
               b" /Encoding << /Differences [65 /odieresis] >> ")
    els = parse_real_pdf(pdf)
    assert els[0]["text"] == "öB"
    assert els[0]["bbox"]["width"] == 10.0      # metrics still apply
