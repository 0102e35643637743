"""PDF-style token-layout parsing with reading-order reconstruction.

Stands in for the reference's pdf2image@dpi150 + EasyOCR front end
(``/root/reference/src/ocr/easyocr_client.py:26-58``): real OCR models
aren't in this container, so binary PDF payloads carry a deterministic
token-layout serialization (produced by our page generator and by any
upstream rasterizer that emits positioned tokens):

    %PDF-GRAFT 1
    E\tpage\tx1\ty1\tx2\ty2\tconfidence\ttext
    ...

Each ``E`` line is one recognized token: the same
``(4-corner bbox → x1/y1/x2/y2/width/height, text, confidence)``
record the reference builds at ``easyocr_client.py:60-83``.

Genuine ``%PDF-1.x`` payloads (no GRAFT token index) route to the
digital-text content-stream parser (``kernel/pdf_text.py``): BT…ET
show-text runs with their ``Tm``/``Td`` coordinates become the same
element records, so real PDFs flow through the identical
row/merge/pair kernel. Unparseable PDF bytes yield zero elements
rather than failing the batch.

Reading-order reconstruction: stable sort by (page, y1, x1) — top-to-
bottom, left-to-right, with the input order as tiebreak — before the
row/merge/pair kernel runs.
"""

from __future__ import annotations

from typing import Any, Dict, List

from .layout import cluster_rows
from .pdf_text import parse_real_pdf

PDF_MAGIC = b"%PDF"
GRAFT_MAGIC = b"%PDF-GRAFT"


def parse_pdf_tokens(payload: bytes,
                     out_links: List[str] | None = None
                     ) -> List[Dict[str, Any]]:
    """%PDF payload → layout elements in reading order.

    ``%PDF-GRAFT`` token streams parse directly; any other ``%PDF``
    magic goes through the real content-stream parser. ``out_links``
    (real-PDF branch only) receives ``/Link`` annotation URIs.
    """
    if payload.startswith(GRAFT_MAGIC):
        elements = _parse_graft_tokens(payload)
    elif payload.startswith(PDF_MAGIC):
        elements = parse_real_pdf(payload, out_links=out_links)
    else:
        return []
    # Reading order: page, then top-to-bottom, then left-to-right.
    elements.sort(key=lambda e: (e["page_num"], e["bbox"]["y1"],
                                 e["bbox"]["x1"]))
    return elements


def _parse_graft_tokens(payload: bytes) -> List[Dict[str, Any]]:
    """Parse a %PDF-GRAFT token stream into layout elements."""
    elements: List[Dict[str, Any]] = []
    text = payload.decode("utf-8", errors="replace")
    for line in text.split("\n")[1:]:
        if not line.startswith("E\t"):
            continue
        parts = line.split("\t", 7)
        if len(parts) != 8:
            continue
        _, page_s, x1_s, y1_s, x2_s, y2_s, conf_s, tok = parts
        try:
            page = int(page_s)
            x1, y1 = float(x1_s), float(y1_s)
            x2, y2 = float(x2_s), float(y2_s)
            conf = float(conf_s)
        except ValueError:
            continue
        elements.append({
            "page_num": page,
            "text": tok,
            "confidence": conf,
            "bbox": {
                "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                "width": x2 - x1, "height": y2 - y1,
            },
        })
    return elements


XY_MIN_X_GAP = 40.0   # min horizontal whitespace to call a column cut
XY_MIN_Y_GAP = 20.0   # min vertical whitespace to call a block cut


def _gap_split(elems: List[Dict[str, Any]], lo: str, hi: str,
               min_gap: float):
    """Split at the widest projection gap ≥ min_gap, else None.

    Scans interval coverage along one axis: a gap exists where the
    running max of ``hi`` ends before the next element's ``lo``.
    """
    items = sorted(elems, key=lambda e: (e["bbox"][lo], e["bbox"][hi]))
    best_gap, best_idx = 0.0, None
    cover = items[0]["bbox"][hi]
    for i in range(1, len(items)):
        gap = items[i]["bbox"][lo] - cover
        if gap > best_gap:
            best_gap, best_idx = gap, i
        b = items[i]["bbox"][hi]
        if b > cover:
            cover = b
    if best_idx is None or best_gap < min_gap:
        return None
    return items[:best_idx], items[best_idx:]


def _xy_cut(elems: List[Dict[str, Any]]) -> List[List[Dict[str, Any]]]:
    """Leaf regions of the recursive cut, in reading order."""
    if len(elems) <= 1:
        return [list(elems)] if elems else []
    split = _gap_split(elems, "y1", "y2", XY_MIN_Y_GAP)
    if split is not None:
        top, bottom = split
        return _xy_cut(top) + _xy_cut(bottom)
    split = _gap_split(elems, "x1", "x2", XY_MIN_X_GAP)
    if split is not None:
        left, right = split
        return _xy_cut(left) + _xy_cut(right)
    return [sorted(elems,
                   key=lambda e: (e["bbox"]["y1"], e["bbox"]["x1"]))]


def xy_cut_regions(
        elements: List[Dict[str, Any]]) -> List[List[Dict[str, Any]]]:
    """Recursive XY-cut page segmentation (multi-column documents).

    The default (page, y, x) sort interleaves the lines of side-by-side
    columns (and the y-band row clustering then merges across columns);
    XY-cut recursively splits each page at its widest horizontal
    whitespace band (blocks), then at its widest vertical band
    (columns — the left column is read fully before the right), falling
    back to (y, x) inside indivisible regions. This is the classic
    recursive XY-cut page-segmentation algorithm (Nagy & Seth),
    published and widely reimplemented. Returns leaf regions in
    reading order; row detection runs per region, so column text never
    interleaves. Opt-in: the parity default stays (page, y, x) because
    the reference's EasyOCR path has no column notion.
    """
    by_page: Dict[int, List[Dict[str, Any]]] = {}
    for el in elements:
        by_page.setdefault(el["page_num"], []).append(el)
    regions: List[List[Dict[str, Any]]] = []
    for page in sorted(by_page):
        regions.extend(_xy_cut(by_page[page]))
    return regions


def xy_cut_order(elements: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Flattened :func:`xy_cut_regions` — elements in reading order."""
    return [el for region in xy_cut_regions(elements) for el in region]


def extract_pdf(payload: bytes,
                reading_order: str = "yx",
                out_links: List[str] | None = None) -> Dict[str, Any]:
    """PDF payload → text, spans, elements (same contract as HTML side).

    ``extracted_text`` is the detected rows in reading order, tokens
    space-joined within a row, rows newline-joined; ``spans`` carry the
    (start, end, page) offsets of each row.

    ``reading_order``: ``"yx"`` (default, reference-parity top-to-
    bottom/left-to-right) or ``"xy_cut"`` (recursive XY-cut for
    multi-column layouts — see :func:`xy_cut_order`).
    """
    elements = parse_pdf_tokens(payload, out_links=out_links)
    if reading_order == "xy_cut":
        regions = xy_cut_regions(elements)
        elements = [el for region in regions for el in region]
        rows = [row for region in regions
                for row in cluster_rows(region)]
    else:
        rows = cluster_rows(elements)
    spans: List[Dict[str, int]] = []
    parts: List[str] = []
    offset = 0
    for row in rows:
        row_text = " ".join(e["text"].strip() for e in row)
        spans.append({
            "start": offset,
            "end": offset + len(row_text),
            "page": row[0]["page_num"],
        })
        parts.append(row_text)
        offset += len(row_text) + 1
    page_count = max((e["page_num"] for e in elements), default=1)
    return {
        "extracted_text": "\n".join(parts),
        "spans": spans,
        "elements": elements,
        "page_count": page_count,
    }
