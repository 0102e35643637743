"""Single-document extraction: payload bytes → full structured result.

This is the fused equivalent of the reference's per-document pipeline
``integrated_pipeline`` (``/root/reference/src/integration/
orchestration.py:10-65`` → ``pipeline.py:19-165``): rasterize/OCR →
normalize → pair → field-match → validate, executed as one pure
function so the Spark stage touches each document's bytes exactly once
(SURVEY.md §3.2). No I/O, no clock, no randomness.
"""

from __future__ import annotations

import re
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


# Characters whose presence disables the resolved-href fast path:
# '#' (fragment), ';' (params re-split), WHATWG-stripped tab/CR/LF,
# and spaces (urlsplit strips them at the ends). See _resolve_links.
_FAST_SAFE = re.compile(r"[^#;\t\r\n ]*\Z")  # \Z: '$' matches pre-\n

# A base eligible for the RELATIVE-href fast path: plain http(s)
# origin + optional clean path — no query/fragment/params, no
# backslash-in-host, no dot segments (urljoin would normalize those
# out of the merged path).
_FAST_BASE = re.compile(
    r"(https?://[^/?#;\t\r\n \\]+)(/[^?#;\t\r\n ]*)?\Z")


def _has_colon_first_segment(href: str) -> bool:
    """True when a ':' precedes any '/' — the href then carries a
    scheme (``mailto:``, ``javascript:``, ``tel:``) and must take the
    full urljoin path."""
    c = href.find(":")
    if c < 0:
        return False
    s = href.find("/")
    return s < 0 or c < s


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
    # Fast path for the two shapes that dominate real link surfaces
    # (~85% of corpus hrefs): already-absolute http(s) and
    # protocol-relative. ``urljoin`` on these is a parse+unparse
    # round-trip whose only effects are (a) lowercasing an uppercase
    # scheme, (b) dropping an empty trailing query ('?'), and
    # (c) re-splitting a ';' params component — so the fast path
    # applies ONLY when none of those can fire (lowercase scheme
    # matched literally, no '#'/';', no trailing '?'), and is then
    # string-identical to urljoin (pinned by
    # ``tests/test_links.py::test_resolve_fast_path_is_urljoin``).
    # Skipping two urlparse calls per link is ~15% of whole-document
    # kernel time on link-dense pages.
    base_scheme = ("https" if base.startswith("https://") else
                   "http" if base.startswith("http://") else None)
    # urlsplit strips LEADING/TRAILING C0-control-or-space from the
    # whole URL (WHATWG); interior C0 (other than the tab/CR/LF that
    # _FAST_SAFE already rejects anywhere) survives. So the fast
    # paths additionally require clean edge characters.
    _safe = _FAST_SAFE.match

    def safe(h: str) -> bool:
        return (_safe(h) is not None
                and h[0] > " " and h[-1] > " ")
    # Per-document precompute for the relative-href fast path: the
    # origin and the base directory (path up to the last '/'). RFC
    # 3986 §5.3 merge for a dot-free relative path is then pure
    # string concatenation.
    origin = bdir = None
    bm = _FAST_BASE.match(base)
    if bm is not None and "./" not in base:
        origin = bm.group(1)
        bpath = bm.group(2) or "/"
        bdir = origin + bpath[:bpath.rfind("/") + 1]
    out: List[Dict[str, Any]] = []
    for idx, ln in enumerate(raw_links):
        href = ln["href"]
        resolved: Optional[str] = None
        plen = (8 if href.startswith("https://") else
                7 if href.startswith("http://") else 0)
        # non-empty netloc required: 'https://' or 'https:///x'
        # would merge with the base's authority in urljoin
        if (plen and len(href) > plen and href[plen] not in "/?"
                and safe(href) and not href.endswith("?")):
            r = href
        elif (base_scheme is not None and href.startswith("//")
              and len(href) > 2 and href[2] not in "/?\\"
              and safe(href) and not href.endswith("?")):
            r = base_scheme + ":" + href
        elif (origin is not None and href
              # '//…' is authority-relative, never path-relative
              and not href.startswith("//")
              and safe(href) and not href.endswith("?")
              # no scheme (':' in the first segment), no dot segments
              and not _has_colon_first_segment(href)
              and "./" not in href and href not in (".", "..")
              and not href.endswith(("/.", "/.."))):
            if href.startswith("/"):
                r = origin + href
            elif href.startswith("?"):
                r = base + href
            elif "//" in href:
                # the NON-ROOTED relative merge collapses interior
                # empty segments ('img//logo.png' → 'img/logo.png');
                # rooted and absolute paths keep them — slow path
                try:
                    r = urljoin(base, href).split("#", 1)[0]
                except ValueError:
                    r = ""
            else:
                r = bdir + href
        else:
            try:
                r = urljoin(base, href).split("#", 1)[0]
            except ValueError:
                r = ""
        if (r.startswith(("http://", "https://"))
                and len(r) <= MAX_RESOLVED_URL):
            resolved = r
        out.append({"link_idx": idx, "href": href,
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
