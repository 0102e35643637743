"""XY-cut reading-order reconstruction for multi-column layouts.

The parity default (page, y, x) interleaves side-by-side columns;
`xy_cut_regions` must read the left column fully before the right,
split header/footer bands first, and fall back to (y, x) inside
indivisible regions.
"""

from credit_ocr_system_spark.kernel.pdf_layout import (
    GRAFT_MAGIC,
    extract_pdf,
    parse_pdf_tokens,
    xy_cut_order,
    xy_cut_regions,
)


def el(text, x1, y1, x2, y2, page=1):
    return {
        "page_num": page, "text": text, "confidence": 0.9,
        "bbox": {"x1": float(x1), "y1": float(y1),
                 "x2": float(x2), "y2": float(y2),
                 "width": float(x2 - x1), "height": float(y2 - y1)},
    }


def two_column_page():
    """Full-width header, then two columns with interleaved y bands."""
    header = el("HEADER", 50, 10, 400, 30)
    left = [el(f"L{i}", 50, 60 + 30 * i, 200, 80 + 30 * i)
            for i in range(3)]
    right = [el(f"R{i}", 260, 60 + 30 * i, 410, 80 + 30 * i)
             for i in range(3)]
    return header, left, right


def test_two_columns_read_in_order():
    header, left, right = two_column_page()
    # feed interleaved, the worst case for (y, x)
    elements = [header] + [v for pair in zip(left, right) for v in pair]
    ordered = [e["text"] for e in xy_cut_order(elements)]
    assert ordered == ["HEADER", "L0", "L1", "L2", "R0", "R1", "R2"]


def test_yx_default_interleaves():
    header, left, right = two_column_page()
    elements = [header] + left + right
    yx = sorted(elements,
                key=lambda e: (e["bbox"]["y1"], e["bbox"]["x1"]))
    assert [e["text"] for e in yx] == \
        ["HEADER", "L0", "R0", "L1", "R1", "L2", "R2"]


def test_regions_isolate_columns():
    header, left, right = two_column_page()
    regions = xy_cut_regions([header] + left + right)
    texts = [[e["text"] for e in r] for r in regions]
    assert ["HEADER"] in texts
    assert ["L0", "L1", "L2"] in texts
    assert ["R0", "R1", "R2"] in texts


def test_no_gap_falls_back_to_yx():
    dense = [el("A", 0, 0, 100, 20), el("B", 105, 2, 200, 22),
             el("C", 0, 25, 100, 45)]
    regions = xy_cut_regions(dense)
    assert len(regions) == 1
    assert [e["text"] for e in regions[0]] == ["A", "B", "C"]


def test_pages_stay_separate():
    a = el("P1", 0, 0, 50, 20, page=1)
    b = el("P2", 0, 0, 50, 20, page=2)
    regions = xy_cut_regions([b, a])
    assert [[e["text"] for e in r] for r in regions] == [["P1"], ["P2"]]


def _graft_payload(elements):
    lines = [GRAFT_MAGIC.decode() + " 1"]
    for e in elements:
        bb = e["bbox"]
        lines.append(
            f"E\t{e['page_num']}\t{bb['x1']}\t{bb['y1']}\t{bb['x2']}"
            f"\t{bb['y2']}\t{e['confidence']}\t{e['text']}")
    return "\n".join(lines).encode()


def test_extract_pdf_xy_cut_text_keeps_columns_whole():
    header, left, right = two_column_page()
    payload = _graft_payload([header] + left + right)
    default = extract_pdf(payload)
    cut = extract_pdf(payload, reading_order="xy_cut")
    # default y-band rows interleave the columns...
    assert "L0 R0" in default["extracted_text"]
    # ...xy_cut reads the left column before the right, never mixing
    assert cut["extracted_text"] == "HEADER\nL0\nL1\nL2\nR0\nR1\nR2"
    # parity default untouched by the new option
    assert default["extracted_text"].splitlines()[0] == "HEADER"
    # both see identical element sets
    key = lambda e: e["text"]
    assert sorted(default["elements"], key=key) == \
        sorted(cut["elements"], key=key)
