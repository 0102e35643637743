"""Single-document extraction: payload bytes → full structured result.

This is the fused equivalent of the reference's per-document pipeline
``integrated_pipeline`` (``/root/reference/src/integration/
orchestration.py:10-65`` → ``pipeline.py:19-165``): rasterize/OCR →
normalize → pair → field-match → validate, executed as one pure
function so the Spark stage touches each document's bytes exactly once
(SURVEY.md §3.2). No I/O, no clock, no randomness.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional
from urllib.parse import urljoin

from ..config.document_types import CREDIT_REQUEST_FIELDS
from .fields import match_fields
from .html_extract import extract_html
from .layout import pair_rows
from .pdf_layout import PDF_MAGIC, extract_pdf

# The reference pins its processing timestamp rather than reading the
# clock (src/integration/pipeline.py:57,133) — kept for reproducibility.
PROCESSING_TIMESTAMP = "2024-01-01T00:00:00Z"

MAX_RESOLVED_URL = 4096  # drop absurd resolved URLs (spider traps)


def _resolve_links(url: str, base_href: str,
                   raw_links: List[Dict[str, Any]]
                   ) -> List[Dict[str, Any]]:
    """RFC 3986 reference resolution of the captured hrefs.

    ``url`` (the fetch URL) is the base; a ``<base href>`` rebases it
    first, itself resolved against the fetch URL (HTML spec). The raw
    href is kept verbatim for WAT fidelity; ``url`` is the resolved
    absolute target, null when the href doesn't resolve to a
    fetchable http(s) URL (``javascript:``/``mailto:``/``data:``
    schemes, unparseable bytes). Fragments are dropped — they are
    never sent on the wire, and the graph edge targets the resource.
    """
    base = url or ""
    if base_href:
        try:
            base = urljoin(base, base_href)
        except ValueError:
            pass
    out: List[Dict[str, Any]] = []
    for idx, ln in enumerate(raw_links):
        resolved: Optional[str] = None
        try:
            r = urljoin(base, ln["href"]).split("#", 1)[0]
            if (r.startswith(("http://", "https://"))
                    and len(r) <= MAX_RESOLVED_URL):
                resolved = r
        except ValueError:
            pass
        out.append({"link_idx": idx, "href": ln["href"],
                    "url": resolved, "anchor": ln["anchor"],
                    "nofollow": ln["nofollow"]})
    return out


def extract_document(url: str, payload: Optional[bytes]) -> Dict[str, Any]:
    """Extract one document. Deterministic; never raises on bad input."""
    payload = payload or b""
    if payload.startswith(PDF_MAGIC):
        doc_kind = "pdf"
        pdf_uris: list = []
        base = extract_pdf(payload, out_links=pdf_uris)
        # /Link annotations carry absolute URIs; no anchor text or
        # rel semantics exist on the PDF side
        raw_links = [{"href": u, "anchor": "", "nofollow": False}
                     for u in pdf_uris]
        base_href = ""
    else:
        doc_kind = "html"
        base = extract_html(payload)
        raw_links = base.get("links", [])
        base_href = base.get("base_href", "")

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
        "base_href": base_href,
        "links": _resolve_links(url, base_href, raw_links),
        "metas": base.get("metas", []),
        "processing_timestamp": PROCESSING_TIMESTAMP,
    }
