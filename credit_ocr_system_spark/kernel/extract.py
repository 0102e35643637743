"""Single-document extraction: payload bytes → full structured result.

This is the fused equivalent of the reference's per-document pipeline
``integrated_pipeline`` (``/root/reference/src/integration/
orchestration.py:10-65`` → ``pipeline.py:19-165``): rasterize/OCR →
normalize → pair → field-match → validate, executed as one pure
function so the Spark stage touches each document's bytes exactly once
(SURVEY.md §3.2). No I/O, no clock, no randomness.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..config.document_types import CREDIT_REQUEST_FIELDS
from .fields import match_fields
from .html_extract import extract_html
from .layout import pair_rows
from .pdf_layout import PDF_MAGIC, extract_pdf

# The reference pins its processing timestamp rather than reading the
# clock (src/integration/pipeline.py:57,133) — kept for reproducibility.
PROCESSING_TIMESTAMP = "2024-01-01T00:00:00Z"


def extract_document(url: str, payload: Optional[bytes]) -> Dict[str, Any]:
    """Extract one document. Deterministic; never raises on bad input."""
    payload = payload or b""
    if payload.startswith(PDF_MAGIC):
        doc_kind = "pdf"
        base = extract_pdf(payload)
    else:
        doc_kind = "html"
        base = extract_html(payload)

    elements = base["elements"]
    pairs = pair_rows(elements)
    # normalize_elements(elements) would recompute the pairing; its
    # text_line branch is dead (layout.py:normalize_elements), so the
    # normalized view is exactly the pairs re-shaped — build it directly.
    normalized = [
        {
            "type": "label_value",
            "label": p["label"],
            "value": p["value"],
            "page": p["page"],
            "confidence": p["confidence"],
            "bounding_box": p.get("bounding_box"),
        }
        for p in pairs
    ]
    fields = match_fields(pairs, elements, CREDIT_REQUEST_FIELDS)

    return {
        "url": url,
        "doc_kind": doc_kind,
        "extracted_text": base["extracted_text"],
        "spans": base["spans"],
        "elements": elements,
        "pairs": pairs,
        "normalized": normalized,
        "extracted_fields": fields["extracted_fields"],
        "missing_fields": fields["missing_fields"],
        "validation_results": fields["validation_results"],
        "page_count": base["page_count"],
        # indexing directives: HTML <head> carries them; PDFs have no
        # equivalent surface, so the PDF branch reports none
        "link_canonical": base.get("link_canonical", ""),
        "noindex": base.get("noindex", False),
        "title": base.get("title", ""),
        "published": base.get("published", ""),
        "processing_timestamp": PROCESSING_TIMESTAMP,
    }
