"""From-scratch OCR for scanned pages (``kernel/ocr.py``) and the
image-only PDF round trip (``pdf_write scanned=`` → ``pdf_text`` OCR
dispatch).

The contract under test: a scanned (image-only) variant of a page
yields EXACTLY the element records the digital-text variant of the
same token layout yields — text, bbox, page — so downstream layout /
pairing / field extraction cannot tell the two apart (the reference
OCRs everything: ``src/ocr/easyocr_client.py:26-58``)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from credit_ocr_system_spark.kernel import ocr
from credit_ocr_system_spark.kernel.jpeg import decode_jpeg, encode_jpeg
from credit_ocr_system_spark.kernel.pdf_text import parse_real_pdf
from credit_ocr_system_spark.sources.pdf_write import build_pdf

ATLAS_CHARS = sorted(ocr.FONT)


# --- atlas properties ------------------------------------------------------

def test_atlas_glyphs_are_7x5_nonblank_and_distinct():
    seen = {}
    for ch, rows in ocr.FONT.items():
        assert len(rows) == 7 and all(len(r) == 5 for r in rows), ch
        bm = ocr._BITMAPS[ch]
        # left-aligned: ink in column 0
        assert bm[:, 0].any(), ch
        ys = np.flatnonzero(bm.any(axis=1))
        xs = np.flatnonzero(bm.any(axis=0))
        box = bm[ys[0]:ys[-1] + 1, :xs[-1] + 1]
        key = ocr._pattern_key(box)
        assert key not in seen, f"{ch!r} collides with {seen[key]!r}"
        seen[key] = ch


def test_atlas_covers_generator_charset():
    # every character the synthetic corpus can put in a PDF token
    corpus = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789 .,:/?%()[]&-²§€äöüÄÖÜß'\"!+=;_"
    )
    missing = [c for c in corpus if c != " " and c not in ocr.FONT]
    assert not missing, missing


# --- render / recognize round trip -----------------------------------------

def _tok_texts(result):
    return [t[2] for t in result]


def test_round_trip_exact_png_clean():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
            (40.0, 60.0, "Loan Amount:", 12.0),
            (300.0, 60.0, "1.234 €", 12.0),
            (40.0, 88.0, "HRB 123 / München Local Court", 12.0),
            (40.0, 116.0, "[x] yes größe Straße ÄÖÜ äöü ß 1,5%", 12.0)]
    img = ocr.render_tokens(toks, 612.0, 792.0)
    got = ocr.recognize(img)
    assert _tok_texts(got) == [t[2] for t in toks]
    for (x, y, text, fs), (x_px, top_px, _t, ncells, box_h, pitch,
                           conf) in zip(toks, got):
        assert x_px == 2 * x and top_px == 2 * y
        assert box_h == 7 * fs * 2 / 12 * 1  # 7 dots of size fs/6*2
        assert pitch == fs  # 6 dots == fs px at 2 px/pt
        assert ncells == len(text)
        assert conf == 1.0


def test_six_point_gap_reads_as_single_space():
    # the split-label layout: two fragments 6 pt apart merge into one
    # token with a space — the same text the layout kernel's G3 merge
    # produces from the digital variant's two fragments
    toks = [(40.0, 60.0, "Commercial", 12.0),
            (106.0, 60.0, "Register:", 12.0)]
    got = ocr.recognize(ocr.render_tokens(toks, 612.0, 792.0))
    assert _tok_texts(got) == ["Commercial Register:"]


def test_distant_tokens_stay_separate():
    toks = [(40.0, 60.0, "Term:", 12.0),
            (300.0, 60.0, "15", 12.0),
            (352.0, 60.0, "Jahre", 12.0)]
    got = ocr.recognize(ocr.render_tokens(toks, 612.0, 792.0))
    assert _tok_texts(got) == ["Term:", "15", "Jahre"]


def test_jpeg_noise_round_trip():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
            (40.0, 60.0, "Loan Amount:", 12.0),
            (300.0, 60.0, "1.234 €", 12.0),
            (40.0, 88.0, "[x] yes größe Straße 1,5%", 12.0)]
    img = ocr.render_tokens(toks, 612.0, 792.0)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    if dec.ndim == 3:
        dec = dec[:, :, 0]
    got = ocr.recognize(dec)
    assert _tok_texts(got) == [t[2] for t in toks]
    assert all(t[6] >= 0.9 for t in got)


def test_empty_page_and_unknown_glyph():
    assert ocr.recognize(np.full((100, 100), 255, np.uint8)) == []
    with pytest.raises(ValueError, match="no glyph"):
        ocr.render_tokens([(10.0, 10.0, "☃", 12.0)], 612.0, 792.0)
    with pytest.raises(ValueError, match="dot size"):
        ocr.render_tokens([(10.0, 10.0, "A", 13.0)], 612.0, 792.0)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_round_trip_random_layouts(data):
    # arbitrary atlas text on the generator's layout grid
    alphabet = [c for c in ATLAS_CHARS]
    n_rows = data.draw(st.integers(1, 6))
    toks = []
    for i in range(n_rows):
        text = data.draw(st.text(
            alphabet=alphabet, min_size=1, max_size=12).map(str.strip)
            .filter(lambda s: s and "  " not in s))
        fs = data.draw(st.sampled_from([12.0, 18.0]))
        x = float(data.draw(st.integers(20, 300)))
        toks.append((x, 40.0 + 32.0 * i, text, fs))
    img = ocr.render_tokens(toks, 612.0, 792.0)
    got = ocr.recognize(img)
    assert _tok_texts(got) == [t[2] for t in toks]
    assert [(t[0], t[1]) for t in got] == \
        [(2 * x, 2 * y) for x, y, _t, _f in toks]


# --- scanned PDFs end to end ------------------------------------------------

_PAGES = [[(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
           (40.0, 60.0, "Loan Amount:", 12.0),
           (300.0, 60.0, "1.234 €", 12.0),
           (40.0, 88.0, "HRB 123 / München Local Court", 12.0)],
          [(40.0, 60.0, "Total Area:", 12.0),
           (300.0, 60.0, "1,234 m²", 12.0)]]


def _strip_conf(elements):
    return [{k: v for k, v in e.items() if k != "confidence"}
            for e in elements]


@pytest.mark.parametrize("mode", ["flate", "dct"])
def test_scanned_pdf_matches_digital_elements(mode):
    digital = parse_real_pdf(build_pdf(_PAGES))
    scanned = parse_real_pdf(build_pdf(_PAGES, scanned=mode))
    assert _strip_conf(scanned) == _strip_conf(digital)
    assert all(e["confidence"] == 1.0 for e in scanned)


def test_scanned_pdf_survives_encryption():
    for enc in ("rc4-128", "aesv2"):
        scanned = parse_real_pdf(
            build_pdf(_PAGES, scanned="flate", encrypt=enc))
        assert _strip_conf(scanned) == _strip_conf(
            parse_real_pdf(build_pdf(_PAGES)))


def test_scanned_pdf_has_no_text_layer():
    pdf = build_pdf(_PAGES, scanned="flate")
    assert b"BT" not in pdf.split(b"stream", 1)[0]
    assert b"/Subtype /Image" in pdf
    # and the digital build has no image
    assert b"/Subtype /Image" not in build_pdf(_PAGES)


def test_scanned_rejects_form_xobject_combo():
    with pytest.raises(ValueError, match="form XObjects"):
        build_pdf(_PAGES, scanned="flate", form_xobject=True)
    with pytest.raises(ValueError, match="scanned mode"):
        build_pdf(_PAGES, scanned="tiff")


# --- scanner artifacts: skew + dust ------------------------------------------

def test_artifacted_rasters_recognize_identically():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
            (40.0, 60.0, "Loan Amount:", 12.0),
            (300.0, 60.0, "1.234 €", 12.0),
            (40.0, 88.0, "HRB 123 / München Local Court", 12.0)]
    clean = ocr.recognize(ocr.render_tokens(toks, 612.0, 792.0))
    for skew in (0.002, -0.012, 0.03):
        for specks in (0, 60):
            img = ocr.render_tokens(toks, 612.0, 792.0, skew=skew,
                                    specks=specks, speck_seed=3)
            assert ocr.recognize(img) == clean, (skew, specks)


def test_despeckle_only_removes_isolated_pixels():
    toks = [(40.0, 60.0, "Total Area: 1,234 m²", 12.0)]
    clean = ocr.recognize(ocr.render_tokens(toks, 612.0, 792.0))
    noisy = ocr.render_tokens(toks, 612.0, 792.0, specks=150,
                              speck_seed=11)
    assert (noisy < 128).sum() > (
        ocr.render_tokens(toks, 612.0, 792.0) < 128).sum()
    assert ocr.recognize(noisy) == clean


def test_skew_estimator_validated_not_trusted():
    # a sparse page where projection profiles are unreliable must
    # come back unmodified because the unsheared parse is perfect
    one = ocr.recognize(ocr.render_tokens(
        [(40.0, 80.0, "6", 12.0)], 612.0, 792.0))
    assert [(t[0], t[1], t[2]) for t in one] == [(80.0, 160.0, "6")]


def test_scanned_pdf_with_artifacts_matches_digital():
    digital = parse_real_pdf(build_pdf(_PAGES))
    for mode in ("flate", "dct"):
        scanned = parse_real_pdf(build_pdf(
            _PAGES, scanned=mode, scan_skew=-0.012, scan_specks=45))
        assert _strip_conf(scanned) == _strip_conf(digital), mode


def test_jpeg_artifacts_round_trip():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
            (40.0, 88.0, "[x] yes größe Straße 1,5%", 12.0)]
    clean = [t[2] for t in ocr.recognize(
        ocr.render_tokens(toks, 612.0, 792.0))]
    img = ocr.render_tokens(toks, 612.0, 792.0, skew=0.004,
                            specks=50, speck_seed=7)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    if dec.ndim == 3:
        dec = dec[:, :, 0]
    assert [t[2] for t in ocr.recognize(dec)] == clean


def test_bilevel_scanned_pdf_matches_digital():
    digital = parse_real_pdf(build_pdf(_PAGES))
    for skew, specks in ((0.0, 0), (-0.012, 45)):
        scanned = parse_real_pdf(build_pdf(
            _PAGES, scanned="bilevel", scan_skew=skew,
            scan_specks=specks))
        assert _strip_conf(scanned) == _strip_conf(digital)
    # 1-bit packing beats 8-bit greyscale on size
    assert len(build_pdf(_PAGES, scanned="bilevel")) < \
        len(build_pdf(_PAGES, scanned="flate"))


def test_two_column_scanned_page_reads_through_xy_cut():
    # OCR elements feed the multi-column reading-order path exactly
    # like digital-text elements do: left column fully before right
    from credit_ocr_system_spark.kernel.pdf_layout import xy_cut_order
    pages = [[(40.0, 60.0, "Left one", 12.0),
              (40.0, 88.0, "Left two", 12.0),
              (340.0, 60.0, "Right one", 12.0),
              (340.0, 88.0, "Right two", 12.0)]]
    scanned = parse_real_pdf(build_pdf(pages, scanned="bilevel"))
    ordered = [e["text"] for e in xy_cut_order(scanned)]
    assert ordered == ["Left one", "Left two",
                       "Right one", "Right two"]
    digital = parse_real_pdf(build_pdf(pages))
    assert [e["text"] for e in xy_cut_order(digital)] == ordered


def test_rotated_scans_detect_orientation():
    toks = [(40.0, 20.0, "DemoTech Solutions GmbH Application 7", 18.0),
            (40.0, 60.0, "Loan Amount:", 12.0),
            (300.0, 60.0, "1.234 €", 12.0),
            (40.0, 88.0, "HRB 123 / München Local Court", 12.0)]
    clean = ocr.recognize(ocr.render_tokens(toks, 612.0, 792.0))
    for o in (90, 180, 270):
        img = ocr.render_tokens(toks, 612.0, 792.0, orient=o)
        got, det = ocr.recognize(img, return_orientation=True)
        assert det == o and got == clean
        # composed: rotation over tilt and dust
        img2 = ocr.render_tokens(toks, 612.0, 792.0, skew=-0.012,
                                 specks=40, orient=o)
        got2, det2 = ocr.recognize(img2, return_orientation=True)
        assert det2 == o and got2 == clean


def test_rotated_scanned_pdf_matches_digital():
    digital = parse_real_pdf(build_pdf(_PAGES))
    for mode in ("bilevel", "g4"):
        scanned = parse_real_pdf(build_pdf(
            _PAGES, scanned=mode, scan_orient=90))
        assert _strip_conf(scanned) == _strip_conf(digital), mode
    with pytest.raises(ValueError, match="orient"):
        ocr.render_tokens([(10.0, 10.0, "A", 12.0)], 100.0, 100.0,
                          orient=45)


def test_scan_window_rows_are_image_only():
    # the driver-gate query x_extract_scanned must actually cover the
    # OCR path: every picked row is an image-only document (as an
    # image XObject or an inline BI…ID…EI image), and all four scan
    # encodings plus the inline packaging appear
    from credit_ocr_system_spark import oracle_golden as G
    from credit_ocr_system_spark.sources.pages import gen_page
    kinds = set()
    inline = 0
    for i in G.X_SCAN_ROWS:
        h = gen_page(i)["html"]
        is_inline = b" BI /W" in h
        # image-only ⇔ no page references a font resource (page
        # dicts stay plaintext even in encrypted files, where an
        # encrypted content stream hides the BI/XObject markers)
        assert b"/Resources << /Font" not in h, i
        assert (b"/Subtype /Image" in h or is_inline
                or b"/Encrypt" in h), i
        inline += is_inline
        kinds.add("g4" if b"/CCITTFaxDecode" in h
                  else "dct" if b"DCTDecode" in h
                  else "bilevel" if b"/BitsPerComponent 1" in h
                  or b"/BPC 1" in h
                  else "flate8")
    assert kinds == {"g4", "dct", "bilevel", "flate8"}
    assert inline >= 1  # the fax-to-PDF inline shape is driver-gated
