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

Reading-order reconstruction: stable sort by (page, y1, x1) — top-to-
bottom, left-to-right, with the input order as tiebreak — before the
row/merge/pair kernel runs. Unknown %PDF payloads (a real PDF without
our token index) yield zero elements rather than failing the batch.
"""

from __future__ import annotations

from typing import Any, Dict, List

from .layout import cluster_rows

PDF_MAGIC = b"%PDF"
GRAFT_MAGIC = b"%PDF-GRAFT"


def parse_pdf_tokens(payload: bytes) -> List[Dict[str, Any]]:
    """Parse a %PDF-GRAFT token stream into layout elements."""
    if not payload.startswith(GRAFT_MAGIC):
        return []
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
    # Reading order: page, then top-to-bottom, then left-to-right.
    elements.sort(key=lambda e: (e["page_num"], e["bbox"]["y1"],
                                 e["bbox"]["x1"]))
    return elements


def extract_pdf(payload: bytes) -> Dict[str, Any]:
    """PDF payload → text, spans, elements (same contract as HTML side).

    ``extracted_text`` is the detected rows in reading order, tokens
    space-joined within a row, rows newline-joined; ``spans`` carry the
    (start, end, page) offsets of each row.
    """
    elements = parse_pdf_tokens(payload)
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
