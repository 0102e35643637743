"""CCITT Group 4 (T.6 MMR) codec: round trips, mode coverage, and the
scanned-PDF path (``/Filter /CCITTFaxDecode /K -1``)."""

import numpy as np
import pytest

from credit_ocr_system_spark.kernel import ocr
from credit_ocr_system_spark.kernel.g4 import decode_g4, encode_g4
from credit_ocr_system_spark.kernel.pdf_text import parse_real_pdf
from credit_ocr_system_spark.sources.pdf_write import build_pdf


def _roundtrip(ink):
    ink = np.asarray(ink, bool)
    return decode_g4(encode_g4(ink), ink.shape[1], ink.shape[0])


def test_random_bitmaps_round_trip():
    rng = np.random.default_rng(7)
    for _ in range(60):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 150))
        ink = rng.random((h, w)) < rng.uniform(0.02, 0.95)
        assert np.array_equal(_roundtrip(ink), ink)


def test_degenerate_rows():
    for row in ([], [0], [1], [0, 1], [1, 0], [1] * 9, [0] * 9):
        if not row:
            continue
        ink = np.array([row], bool)
        assert np.array_equal(_roundtrip(ink), ink)
    # all-white and all-black full pages
    assert not _roundtrip(np.zeros((20, 100), bool)).any()
    assert _roundtrip(np.ones((20, 100), bool)).all()


def test_long_runs_use_makeup_chains():
    # white and black runs beyond 2560 exercise the extended makeup
    # chain in both colors
    w = 6000
    ink = np.zeros((3, w), bool)
    ink[1, 100:5900] = True          # black run of 5800
    ink[2, :] = True
    ink[2, 2970:2990] = False
    assert np.array_equal(_roundtrip(ink), ink)


def test_vertical_pass_and_horizontal_modes_all_fire():
    # stair-stepped and offset shapes force V±1..3, pass, and
    # horizontal modes across rows
    ink = np.zeros((12, 64), bool)
    for y in range(12):
        ink[y, 5 + y:25 + 2 * y] = True   # drifting edges (V modes)
    ink[6, 40:44] = True                  # appears (horizontal)
    ink[7, :] = False                     # vanishes (pass on next)
    ink[8, 50:52] = True
    assert np.array_equal(_roundtrip(ink), ink)


def test_page_raster_round_trip():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7",
             18.0),
            (40.0, 60.0, "Loan Amount:", 12.0),
            (300.0, 60.0, "1.234 €", 12.0)]
    ink = ocr.render_tokens(toks, 612.0, 792.0) < 128
    assert np.array_equal(_roundtrip(ink), ink)


_PAGES = [[(40.0, 20.0, "DemoTech Solutions GmbH Application 7",
            18.0),
           (40.0, 60.0, "Loan Amount:", 12.0),
           (300.0, 60.0, "1.234 €", 12.0),
           (40.0, 88.0, "HRB 123 / München Local Court", 12.0)]]


def _strip_conf(elements):
    return [{k: v for k, v in e.items() if k != "confidence"}
            for e in elements]


def test_g4_scanned_pdf_matches_digital():
    digital = parse_real_pdf(build_pdf(_PAGES))
    for skew, specks in ((0.0, 0), (-0.012, 45)):
        scanned = parse_real_pdf(build_pdf(
            _PAGES, scanned="g4", scan_skew=skew,
            scan_specks=specks))
        assert _strip_conf(scanned) == _strip_conf(digital)


def test_g4_scanned_pdf_shape():
    pdf = build_pdf(_PAGES, scanned="g4")
    assert b"/CCITTFaxDecode" in pdf and b"/K -1" in pdf
    assert b"/BitsPerComponent 1" in pdf


def test_g3_modes_stay_out_of_scope():
    from credit_ocr_system_spark.kernel.pdf_text import _decode_image
    head = (b"<< /Subtype /Image /Width 8 /Height 1"
            b" /BitsPerComponent 1 /Filter /CCITTFaxDecode"
            b" /DecodeParms << /K 0 /Columns 8 /Rows 1 >> >>")
    assert _decode_image(head, b"\x00") is None
