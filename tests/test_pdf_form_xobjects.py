"""Form XObjects (``Do``), graphics state (``q``/``Q``/``cm``), and
the form ``/Matrix`` — letterheads, stamps, and OCR-layer wrappers
put real document text inside forms, so ``parse_real_pdf`` must
follow ``Do`` instead of dropping that text.
"""

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.pdf_text import parse_real_pdf  # noqa: E402


def _pdf(objects: list) -> bytes:
    return b"%PDF-1.5\n" + b"".join(objects) + b"%%EOF\n"


def _stream_obj(num: int, head_extra: bytes, data: bytes,
                compress: bool = True) -> bytes:
    if compress:
        data = zlib.compress(data)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""
    return (str(num).encode() + b" 0 obj\n<< " + head_extra + filt
            + b"/Length " + str(len(data)).encode() + b" >>\nstream\n"
            + data + b"\nendstream\nendobj\n")


def _doc(page_content: bytes, extra_objects: list,
         page_res: bytes) -> bytes:
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/MediaBox [0 0 612 792] /Resources << " + page_res
        + b" >> /Contents 4 0 R >>\nendobj\n",
        _stream_obj(4, b"", page_content),
    ] + extra_objects
    return _pdf(objs)


def _texts(pdf: bytes):
    return [(e["text"], e["bbox"]["x1"], e["bbox"]["y1"])
            for e in parse_real_pdf(pdf)]


def test_do_executes_form_content():
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 200 50] ",
        b"BT /F1 12 Tf 10 20 Td (Inside Form) Tj ET")
    page = b"BT /F1 12 Tf 40 700 Td (On Page) Tj ET /Fm1 Do"
    pdf = _doc(page, [form], b"/XObject << /Fm1 5 0 R >>")
    els = parse_real_pdf(pdf)
    assert [e["text"] for e in els] == ["On Page", "Inside Form"]


def test_form_matrix_translates():
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 200 50] "
           b"/Matrix [1 0 0 1 100 300] ",
        b"BT /F1 12 Tf 10 20 Td (Stamp) Tj ET")
    plain = _stream_obj(
        6, b"/Type /XObject /Subtype /Form /BBox [0 0 200 50] ",
        b"BT /F1 12 Tf 110 320 Td (Stamp) Tj ET")
    via_matrix = _doc(b"/Fm1 Do", [form],
                      b"/XObject << /Fm1 5 0 R >>")
    via_coords = _doc(b"/Fm1 Do", [plain],
                      b"/XObject << /Fm1 6 0 R >>")
    assert _texts(via_matrix) == _texts(via_coords)


def test_cm_translate_under_q_Q_positions_form():
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 200 50] ",
        b"BT /F1 12 Tf 0 0 Td (Moved) Tj ET")
    page = (b"q 1 0 0 1 50 600 cm /Fm1 Do Q "
            b"BT /F1 12 Tf 50 600 Td (Anchor) Tj ET")
    pdf = _doc(page, [form], b"/XObject << /Fm1 5 0 R >>")
    els = {e["text"]: e["bbox"] for e in parse_real_pdf(pdf)}
    # the cm-translated form origin coincides with the Td anchor
    assert els["Moved"]["x1"] == els["Anchor"]["x1"]
    assert els["Moved"]["y1"] == els["Anchor"]["y1"]


def test_cm_scale_scales_glyph_box():
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 200 50] ",
        b"BT /F1 12 Tf 0 0 Td (Big) Tj ET")
    pdf = _doc(b"q 2 0 0 2 0 0 cm /Fm1 Do Q", [form],
               b"/XObject << /Fm1 5 0 R >>")
    ref = _doc(b"/Fm1 Do", [form], b"/XObject << /Fm1 5 0 R >>")
    big = parse_real_pdf(pdf)[0]["bbox"]
    normal = parse_real_pdf(ref)[0]["bbox"]
    assert big["width"] == 2 * normal["width"]
    assert big["height"] == 2 * normal["height"]


def test_q_Q_restores_ctm_for_following_text():
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 10 10] ", b"")
    with_gs = _doc(
        b"q 3 0 0 3 100 100 cm /Fm1 Do Q "
        b"BT /F1 12 Tf 40 700 Td (After) Tj ET",
        [form], b"/XObject << /Fm1 5 0 R >>")
    without = _doc(b"BT /F1 12 Tf 40 700 Td (After) Tj ET",
                   [form], b"/XObject << /Fm1 5 0 R >>")
    assert _texts(with_gs) == _texts(without)


def test_form_own_fonts_merge_over_page_fonts():
    # the form's /Resources define a CID font the page doesn't have
    cmap = (b"beginbfchar <0041> <0058> endbfchar")  # CID 0x41 -> 'X'
    tounicode = _stream_obj(7, b"", cmap, compress=False)
    font = (b"6 0 obj\n<< /Type /Font /Subtype /Type0 "
            b"/Encoding /Identity-H /ToUnicode 7 0 R >>\nendobj\n")
    form = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 100 20] "
           b"/Resources << /Font << /F9 6 0 R >> >> ",
        b"BT /F9 12 Tf 0 0 Td <0041> Tj ET")
    pdf = _doc(b"/Fm1 Do", [form, font, tounicode],
               b"/XObject << /Fm1 5 0 R >>")
    assert [e["text"] for e in parse_real_pdf(pdf)] == ["X"]


def test_nested_forms_and_recursion_guard():
    inner = _stream_obj(
        6, b"/Type /XObject /Subtype /Form /BBox [0 0 50 20] ",
        b"BT /F1 12 Tf 0 0 Td (Deep) Tj ET")
    outer = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 100 40] "
           b"/Resources << /XObject << /In 6 0 R >> >> ",
        b"/In Do")
    pdf = _doc(b"/Fm1 Do", [outer, inner],
               b"/XObject << /Fm1 5 0 R >>")
    assert [e["text"] for e in parse_real_pdf(pdf)] == ["Deep"]
    # self-referential form must terminate, not recurse forever
    loop = _stream_obj(
        5, b"/Type /XObject /Subtype /Form /BBox [0 0 100 40] "
           b"/Resources << /XObject << /Fm1 5 0 R >> >> ",
        b"BT /F1 12 Tf 0 0 Td (Loop) Tj ET /Fm1 Do")
    pdf = _doc(b"/Fm1 Do", [loop], b"/XObject << /Fm1 5 0 R >>")
    els = parse_real_pdf(pdf)
    assert 1 <= len(els) <= 16
    assert all(e["text"] == "Loop" for e in els)


def test_image_xobject_is_skipped():
    img = _stream_obj(
        5, b"/Type /XObject /Subtype /Image /Width 2 /Height 2 "
           b"/ColorSpace /DeviceGray /BitsPerComponent 8 ",
        b"\x00\x01\x02\x03", compress=False)
    pdf = _doc(b"/Im1 Do BT /F1 12 Tf 40 700 Td (Caption) Tj ET",
               [img], b"/XObject << /Im1 5 0 R >>")
    assert [e["text"] for e in parse_real_pdf(pdf)] == ["Caption"]
