"""Raster PNG annotation sink (operators/annotate.py, r5).

Parity target: the reference's matplotlib PNG overlays
(``/root/reference/src/visualization/ocr_visualization.py:9-107`` —
bbox rectangle per element colored by the confidence bands of
``:47``, truncated label text per ``:60``), re-expressed through the
engine's own codecs. Pinned here at the pixel level by decoding the
produced PNG back through ``kernel/codecs.py``:

* rectangle borders land at the SVG twin's integer-pixel geometry in
  the right band color (green >= 0.9 / orange >= 0.7 / red below);
* label glyphs render above the box from the shared 5x7 atlas;
* html multi-page geometry rebases like the SVG twin;
* output is deterministic (byte-identical across calls).
"""

import numpy as np

from credit_ocr_system_spark.kernel.codecs import decode_image_rgb
from credit_ocr_system_spark.operators.annotate import (
    BAND_RGB,
    render_annotation_pages,
)


def _elem(text, x1, y1, w, h, conf, page=1):
    return {"page_num": page, "text": text, "confidence": conf,
            "bbox": {"x1": float(x1), "y1": float(y1),
                     "x2": float(x1 + w), "y2": float(y1 + h),
                     "width": float(w), "height": float(h)}}


def test_rect_borders_and_band_colors():
    els = [_elem("Amount:", 20, 30, 40, 12, 0.95),
           _elem("1.234,56", 70, 30, 30, 12, 0.75),
           _elem("??", 20, 60, 20, 10, 0.30)]
    (page, png, n), = render_annotation_pages(els, "pdf")
    assert page == 1 and n == 3
    img = decode_image_rgb(png)
    # borders at ceil coordinates in band colors
    assert tuple(img[30, 40]) == BAND_RGB["high"]   # top edge of #1
    assert tuple(img[42, 40]) == BAND_RGB["high"]   # bottom edge
    assert tuple(img[36, 20]) == BAND_RGB["high"]   # left edge
    assert tuple(img[36, 60]) == BAND_RGB["high"]   # right edge
    assert tuple(img[30, 80]) == BAND_RGB["mid"]    # element 2 top
    assert tuple(img[60, 25]) == BAND_RGB["low"]    # element 3 top
    # canvas is white elsewhere
    assert tuple(img[5, 5]) == (255, 255, 255)


def test_label_glyphs_above_box():
    els = [_elem("AB", 10, 20, 30, 10, 0.95)]
    (_page, png, _n), = render_annotation_pages(els, "pdf")
    img = decode_image_rgb(png)
    # glyph block occupies rows y1-9 .. y1-3 starting at x1
    block = img[11:18, 10:21]
    assert (block == np.array(BAND_RGB["high"])).all(axis=-1).any()
    # and no ink above the glyph block
    assert (img[:10] == 255).all()


def test_html_pages_rebase_like_svg():
    from credit_ocr_system_spark.kernel.html_extract import (
        ROW_PITCH,
        ROWS_PER_PAGE,
    )

    span = float(ROWS_PER_PAGE * ROW_PITCH)
    els = [_elem("same", 10, 40, 30, 10, 0.95, page=1),
           _elem("same", 10, span + 40, 30, 10, 0.95, page=2)]
    pages = render_annotation_pages(els, "html")
    assert [p for p, _png, _n in pages] == [1, 2]
    img1 = decode_image_rgb(pages[0][1])
    img2 = decode_image_rgb(pages[1][1])
    # identical page-local geometry -> identical canvases
    assert img1.shape == img2.shape
    assert np.array_equal(img1, img2)


def test_deterministic_bytes():
    els = [_elem("Straße: 12 m²", 5, 15, 60, 9, 0.8)]
    a = render_annotation_pages(els, "pdf")
    b = render_annotation_pages(els, "pdf")
    assert a == b


def test_registry_has_png_query():
    from credit_ocr_system_spark.queries import (
        _DRIVER_PRIORITY,
        build_oracles,
        build_queries,
    )

    q = build_queries()
    assert "x_annotations_png" in q
    assert set(q) == set(_DRIVER_PRIORITY)
    assert "x_annotations_png" in build_oracles()
