"""Boilerpipe-style HTML main-content extraction (stdlib-only).

Replaces the reference's rasterize+EasyOCR front end
(``/root/reference/src/ocr/easyocr_client.py:7-85``) for HTML payloads:
instead of pixels we have a DOM, so "OCR elements" become inline text
segments with deterministic synthetic geometry, and boilerplate removal
plays the role of page cleanup. Heuristics are the published
boilerpipe/readability ones:

* subtree strip of non-content containers (``script``/``style``/
  ``nav``/``header``/``footer``/``aside``) and elements whose
  class/id matches a negative token (readability's "unlikely
  candidates" regex idea);
* per-block link density (anchor chars / total chars) — link-dense
  blocks are navigation, dropped at > 1/3 (boilerpipe's
  densometric rule);
* short non-heading blocks without label punctuation are dropped
  (boilerpipe's min-words rule, relaxed for label rows).

Determinism is total: same bytes in, same blocks/segments/geometry out.
"""

from __future__ import annotations

import os
import re
from html import parser as _hp
from html import unescape
from html.parser import HTMLParser
from typing import Any, Dict, List

from .charset import decode_html

STRIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head",
     "nav", "header", "footer", "aside", "iframe", "form", "button"}
)
BLOCK_TAGS = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li",
     "dt", "dd", "blockquote", "pre", "section", "article", "main",
     "figcaption", "caption", "tr", "table", "ul", "ol", "body"}
)
# Table cells are SEGMENT boundaries inside their <tr> block, not
# blocks of their own: a rendered table row is one visual line with
# its cells at column stops, which is exactly the row/column geometry
# the pairing kernel consumes — so '<tr><td>Label:</td><td>value'
# pairs identically to '<div class="row"><span>Label:</span> value'.
# Cells always start a fresh column (saw_ws forced) regardless of
# inter-tag whitespace, matching how tables actually render.
CELL_TAGS = frozenset({"td", "th"})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# HTML5 void elements (no end tag ever arrives). Strip-depth
# bookkeeping must skip them on BOTH sides: a <wbr> inside a stripped
# nav would otherwise raise the depth with no close to lower it
# (over-strip: the rest of the document vanishes), and a self-closed
# <img/> (stdlib synthesizes starttag+endtag) would decrement a depth
# it never incremented, ending the strip mid-nav and leaking
# boilerplate into content.
VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"})
# Elements whose end tag is OPTIONAL in the HTML spec (parsers imply
# the close): valid real-world markup writes '<ul><li>Home<li>About'
# with no </li> at all. Counting their starts inside a strip region
# would raise the depth with no close to lower it and swallow the
# rest of the document, so depth bookkeeping skips them on both sides
# (symmetric: their end tags, when present, are skipped too).
_OPTIONAL_END = frozenset(
    {"li", "p", "dt", "dd", "tr", "td", "th", "option", "optgroup",
     "thead", "tbody", "tfoot", "caption", "colgroup", "rt", "rp"})
# When a strip region is ROOTED at an optional-end element (a
# negative-class '<li class="menu-item">'), the strip must end where
# a browser would imply the element's close: at a sibling start tag
# that auto-closes it. Maps root tag -> start tags that imply its
# close (HTML spec §13.1.2.4 'optional tags').
_IMPLIES_CLOSE = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "p": BLOCK_TAGS,
    "tr": frozenset({"tr"}),
    "td": frozenset({"td", "th", "tr"}),
    "th": frozenset({"td", "th", "tr"}),
}
# Depth bookkeeping also skips <body>: browsers drop duplicate body
# tags (real crawls contain them), so counting one inside a strip
# region would add depth no end tag ever unwinds and swallow the rest
# of the document. The FIRST body is consumed by the unclosed-head
# rescue before this set is consulted.
_DEPTH_SKIP = VOID_TAGS | _OPTIONAL_END | {"body"}
SEGMENT_TAGS = frozenset({"span", "a", "b", "i", "em", "strong", "label",
                          "code", "u", "small", "sup", "sub"})
_NEGATIVE_RE = re.compile(
    r"nav|menu|sidebar|side-bar|footer|header|comment|promo|advert|"
    r"banner|breadcrumb|share|social|related|widget|cookie|popup",
    re.IGNORECASE,
)
_WS_RE = re.compile(r"\s+")

MAX_LINK_DENSITY = 1.0 / 3.0
MAX_LINKS = 4096           # outlink cap: bounds row size on link farms
MAX_METAS = 256            # meta-tag cap: bounds row size on SEO spam
ROWS_PER_PAGE = 40         # synthetic pagination of the block list
ROW_PITCH = 30.0           # vertical distance between block baselines
ROW_TOP = 10.0
ROW_HEIGHT = 20.0
CHAR_WIDTH = 8.0           # synthetic glyph advance
TIGHT_GAP = 6.0            # adjacent inline tags: contiguous glyph run
COLUMN_GAP = 24.0          # whitespace-separated segments: tab stop
LEFT_MARGIN = 40.0


def _norm(text: str) -> str:
    # identical to _WS_RE.sub(" ", text).strip() — re's \s and
    # str.isspace() match the same codepoint set (verified exhaustively
    # in tests/test_html_fast_parser.py::test_norm_equivalence) and
    # split/join is ~2x faster than regex substitution
    return " ".join(text.split())


class _BlockCollector(HTMLParser):
    """Single-pass collector of candidate content blocks.

    A *block* is the run of inline content under the nearest block-level
    element; inline tag boundaries split it into *segments* (these
    become layout elements). Anchors contribute to the block's
    link-char count for the densometric filter.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Dict[str, Any]] = []
        # indexing directives from <head> (stripped for CONTENT, but
        # its <link>/<meta> carry the corpus's dedup/keep signals):
        # rel=canonical href (first wins, like browsers) and
        # robots-noindex. Captured here so both parser paths agree.
        self.link_canonical: str = ""
        self.noindex: bool = False
        self.title: str = ""
        self.published: str = ""
        # outlink surface (the web-graph / WAT signal): every
        # ``<a href>`` in DOCUMENT order, including anchors inside
        # stripped containers — nav and footer links are real graph
        # edges even though their text is boilerplate for CONTENT.
        # ``<base href>`` (first wins, like browsers) rebases relative
        # hrefs at resolution time (kernel/extract.py).
        self.base_href: str = ""
        self.links: List[Dict[str, Any]] = []
        # every <meta> carrying a name= or property= key, raw and in
        # document order — the WAT ``Metas`` surface (og:*,
        # description, twitter:*, robots, article:*); the typed
        # directive fields above are still parsed out separately
        self.metas: List[Dict[str, str]] = []
        self._link_parts: List[str] | None = None  # active <a href> text
        # _in_title_elem: inside ANY <title> element — its text is
        # never document content, captured or not. _title_capture:
        # this title's text goes into self.title (the head's title,
        # first non-blank one wins).
        self._in_title_elem = False
        self._title_capture = False
        self._title_done = False  # first captured title wins
        self._strip_depth = 0
        self._strip_root = ""  # tag that opened the current strip
        self._anchor_depth = 0
        self._segments: List[Dict[str, Any]] = []
        self._seg_parts: List[str] = []
        self._anchor_chars = 0
        self._block_tag = "body"
        self._saw_ws = True  # whitespace seen since last segment flush

    def _flush_segment(self) -> None:
        if self._seg_parts:
            raw = "".join(self._seg_parts)
            seg = _norm(raw)
            if raw and not seg:
                self._saw_ws = True  # whitespace-only run between tags
            if seg:
                # "tight" = no whitespace separated this run from the
                # previous one (adjacent inline tags): a split glyph
                # run, rendered contiguously. Whitespace between tags
                # = distinct columns at a tab stop.
                self._segments.append(
                    {"text": seg,
                     "tight": not self._saw_ws and not raw[0].isspace()})
                self._saw_ws = raw[-1].isspace()
            self._seg_parts = []

    def _flush_block(self) -> None:
        self._flush_segment()
        if self._segments:
            text = " ".join(s["text"] for s in self._segments)
            self.blocks.append({
                "tag": self._block_tag,
                "segments": self._segments,
                "text": text,
                "anchor_chars": self._anchor_chars,
                "chars": len(text),
            })
        self._segments = []
        self._anchor_chars = 0
        self._saw_ws = True

    def _close_link(self) -> None:
        if self._link_parts is not None:
            self.links[-1]["anchor"] = _norm("".join(self._link_parts))
            self._link_parts = None

    def _open_link(self, attrs) -> None:
        # HTML forbids nested <a>; browsers auto-close the open one.
        self._close_link()
        if len(self.links) >= MAX_LINKS:
            return
        a = {k: (v or "") for k, v in attrs}
        href = a.get("href", "").strip()
        if not href:
            return  # named anchor / JS hook, not a link
        rel = a.get("rel", "").lower().split()
        self.links.append(
            {"href": href, "anchor": "", "nofollow": "nofollow" in rel})
        self._link_parts = []

    def _head_directives(self, tag: str, attrs) -> None:
        a = {k: (v or "") for k, v in attrs}
        if tag == "link":
            rels = a.get("rel", "").lower().split()
            if "canonical" in rels and not self.link_canonical:
                self.link_canonical = a.get("href", "").strip()
        else:  # meta
            key = a.get("name", "") or a.get("property", "")
            if key and len(self.metas) < MAX_METAS:
                self.metas.append(
                    {"name": key, "content": a.get("content", "")})
            if a.get("name", "").lower() == "robots":
                toks = re.split(r"[,\s]+", a.get("content", "").lower())
                if "noindex" in toks:
                    self.noindex = True
            elif a.get("property", "").lower() == \
                    "article:published_time" and not self.published:
                self.published = a.get("content", "").strip()

    def _end_title_capture(self) -> None:
        """Close an active title capture. A non-blank capture marks
        the title done (first wins — later <title> elements, SEO spam
        or duplicated heads, must not concatenate); a blank one is
        discarded so a later real title can still claim the slot."""
        if self._title_capture:
            if _norm(self.title):
                self._title_done = True
            else:
                self.title = ""
        self._title_capture = False

    def handle_starttag(self, tag: str, attrs) -> None:
        # any new tag ends title capture — an unclosed <title> (real
        # crawls have them) must not swallow the document's content.
        self._end_title_capture()
        self._in_title_elem = tag == "title"
        # Capture only the head's title (or a top-level one), once:
        # inline <svg><title> is an accessibility label, not the
        # document title.
        self._title_capture = (self._in_title_elem
                               and not self._title_done
                               and (self._strip_depth == 0
                                    or self._strip_root == "head"))
        if tag == "a":
            # captured BEFORE the strip check: nav/footer/aside links
            # are web-graph edges even though their text is stripped
            # for content
            self._open_link(attrs)
        elif tag in ("link", "meta") and attrs:
            self._head_directives(tag, attrs)
        elif tag == "base" and attrs and not self.base_href:
            self.base_href = next(
                (v.strip() for k, v in attrs if k == "href" and v), "")
        if self._strip_depth:
            # real crawls omit </head> constantly; browsers imply the
            # close at <body>. Without this rescue an unclosed head
            # would swallow the whole document into the strip.
            if tag == "body" and self._strip_root == "head":
                self._strip_depth = 0
            elif (self._strip_depth == 1
                  and self._strip_root in _OPTIONAL_END
                  and tag in _IMPLIES_CLOSE.get(
                      self._strip_root, (self._strip_root,))):
                # a strip rooted at an optional-end element (negative-
                # class <li>/<p>/<td>) ends where a browser implies
                # its close: the sibling start falls through to normal
                # processing (it may itself open a fresh strip)
                self._strip_depth = 0
            else:
                if tag not in _DEPTH_SKIP:
                    self._strip_depth += 1
                return
        if tag in STRIP_TAGS:
            self._strip_depth = 1
            self._strip_root = tag
            return
        if attrs:
            # per-value search ≡ searching the space-joined blob: no
            # negative token contains a space, so none spans a joint
            for k, v in attrs:
                if v and k in ("class", "id", "role") \
                        and _NEGATIVE_RE.search(v):
                    self._strip_depth = 1
                    # without this, a stale root (e.g. 'head') would
                    # let the unclosed-head <body> rescue terminate
                    # THIS strip region on a stray duplicate <body>
                    self._strip_root = tag
                    return
        if tag in BLOCK_TAGS:
            self._flush_block()
            self._block_tag = tag
        elif tag in CELL_TAGS:
            self._flush_segment()
            self._saw_ws = True  # a cell is always a fresh column
        elif tag in SEGMENT_TAGS:
            self._flush_segment()
            if tag == "a":
                self._anchor_depth += 1
        elif tag == "br":
            self._flush_segment()

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._end_title_capture()
            self._in_title_elem = False
        elif tag == "a":
            self._close_link()
        if self._strip_depth:
            if tag not in _DEPTH_SKIP:
                self._strip_depth -= 1
            elif (tag == self._strip_root and self._strip_depth == 1
                  and tag in _OPTIONAL_END):
                # explicit close of an optional-end strip root
                self._strip_depth = 0
            return
        if tag in BLOCK_TAGS:
            self._flush_block()
        elif tag in CELL_TAGS:
            self._flush_segment()
            self._saw_ws = True  # content after a cell: new column
        elif tag in SEGMENT_TAGS:
            self._flush_segment()
            if tag == "a" and self._anchor_depth:
                self._anchor_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._title_capture:
            # title text is metadata, not a content block — captured
            # even though <head> is stripped for content
            self.title += data
            return
        if self._in_title_elem:
            # a NON-captured title (second title, body-level title) is
            # still never-rendered metadata: discard, don't let it
            # leak into extracted_text as a content block
            return
        if self._link_parts is not None:
            # anchor text accumulates even inside stripped containers
            # (it labels the EDGE, not this document's content)
            self._link_parts.append(data)
        if self._strip_depth:
            return
        if self._anchor_depth:
            self._anchor_chars += len(_norm(data))
        self._seg_parts.append(data)

    def close(self) -> None:  # flush trailing content
        super().close()
        self._close_link()
        self._flush_block()


class _FastBail(Exception):
    """Raised when input leaves the well-formed subset the fast
    tokenizer guarantees fidelity for; caller reparses with stdlib."""


# Reuse stdlib's own tolerant regexes so tag/attribute tokenization is
# bit-for-bit the same; if a future CPython renames them, the fast path
# simply disables itself.
_locatestart = getattr(_hp, "locatestarttagend_tolerant", None)
_tagfind = getattr(_hp, "tagfind_tolerant", None)
_attrfind = getattr(_hp, "attrfind_tolerant", None)
_endtagfind = getattr(_hp, "endtagfind", None)
_HAVE_FAST = all(
    r is not None for r in (_locatestart, _tagfind, _attrfind, _endtagfind))
_FORCE_STDLIB = os.environ.get("COS_SPARK_HTML_PARSER", "") == "stdlib"
_CDATA_ELEMS = frozenset(HTMLParser.CDATA_CONTENT_ELEMENTS)
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s" % t, re.IGNORECASE) for t in _CDATA_ELEMS}


# Parsed-tag memo keyed by the exact "<...first '>'" snippet. Web
# corpora repeat a small set of tags millions of times; a hit skips
# all regex work. A snippet is cached only if its canonical parse ends
# exactly at the first '>' AND its quote counts are balanced (both '
# and " appear an even number of times). Safety: a lookup is only
# wrong if the same snippet can be the prefix of a longer tag, which
# requires the first '>' to sit inside a quoted attribute value — but
# then exactly one quote is unclosed, the count is odd, and the prefix
# can never equal a cached (even-count) key. Values:
# ("start", tag, attrs) | ("startend", tag, attrs) | ("end", tag, None).
_TAG_CACHE: dict = {}
_TAG_CACHE_MAX = 8192


def _cacheable(snippet: str) -> bool:
    return snippet.count('"') % 2 == 0 and snippet.count("'") % 2 == 0


def _fast_feed(h: "_BlockCollector", rawdata: str) -> None:
    """Single-pass tokenizer emitting the same handler-event sequence
    (same calls, same arguments, same data chunking) as stdlib
    ``HTMLParser(convert_charrefs=True).feed(rawdata); close()`` for
    well-formed input — minus the per-character position bookkeeping
    and incremental-buffer logic, which is what makes stdlib slow.
    Verified equivalent by ``tests/test_html_fast_parser.py``.
    """
    i, n = 0, len(rawdata)
    cdata_elem = None
    while i < n:
        if cdata_elem is not None:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                # stdlib (HTMLParser.goahead) DISCARDS unterminated
                # CDATA content at EOF — it breaks before emitting —
                # so the fast path must drop this tail too (caught by
                # hypothesis: anchor text inside an unclosed script)
                break
            j = m.start()
            if i < j:
                h.handle_data(rawdata[i:j])  # raw: no charref conversion
            i = j
            em = _endtagfind.match(rawdata, i)
            if em is None:
                gt = rawdata.find(">", i)
                if gt < 0:
                    raise _FastBail
                h.handle_data(rawdata[i:gt + 1])
                i = gt + 1
                continue
            name = em.group(1).lower()
            if name != cdata_elem:
                h.handle_data(rawdata[i:em.end()])
                i = em.end()
                continue
            cdata_elem = None
            h.handle_endtag(name)
            i = em.end()
            continue
        lt = rawdata.find("<", i)
        if lt < 0:
            h.handle_data(unescape(rawdata[i:]))
            break
        if i < lt:
            h.handle_data(unescape(rawdata[i:lt]))
        i = lt
        c = rawdata[i + 1:i + 2]
        if c.isalpha() or c == "/":
            gt = rawdata.find(">", i)
            if gt > 0:
                hit = _TAG_CACHE.get(rawdata[i:gt + 1])
                if hit is not None:
                    kind, tag, attrs = hit
                    if kind == "start":
                        h.handle_starttag(tag, attrs)
                        if tag in _CDATA_ELEMS:
                            cdata_elem = tag
                    elif kind == "startend":
                        h.handle_starttag(tag, attrs)
                        h.handle_endtag(tag)
                    else:
                        h.handle_endtag(tag)
                    i = gt + 1
                    continue
        if c.isalpha():
            m = _locatestart.match(rawdata, i)
            if m is None:
                raise _FastBail
            j = m.end()
            if rawdata.startswith(">", j):
                endpos = j + 1
            elif rawdata.startswith("/>", j):
                endpos = j + 2
            else:
                raise _FastBail  # malformed start tag
            tm = _tagfind.match(rawdata, i + 1)
            if tm is None:
                raise _FastBail
            tag = tm.group(1).lower()
            k = tm.end()
            attrs = []
            while k < endpos:
                am = _attrfind.match(rawdata, k)
                if am is None:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or \
                        attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end == ">":
                h.handle_starttag(tag, attrs)
                if tag in _CDATA_ELEMS:
                    cdata_elem = tag
                kind = "start"
            elif end == "/>":
                h.handle_starttag(tag, attrs)  # handle_startendtag default
                h.handle_endtag(tag)
                kind = "startend"
            else:
                raise _FastBail
            snippet = rawdata[i:endpos]
            if endpos == gt + 1 and _cacheable(snippet):
                if len(_TAG_CACHE) >= _TAG_CACHE_MAX:
                    _TAG_CACHE.clear()
                # tuple, not the live list: a handler that mutated the
                # attrs it receives would otherwise corrupt every
                # subsequent cache hit for this snippet
                _TAG_CACHE[snippet] = (kind, tag, tuple(attrs))
            i = endpos
        elif c == "/":
            em = _endtagfind.match(rawdata, i)
            if em is None:
                raise _FastBail  # tolerant/bogus end-tag branch
            tag = em.group(1).lower()
            h.handle_endtag(tag)
            endpos = em.end()
            snippet = rawdata[i:endpos]
            if endpos == gt + 1 and _cacheable(snippet):
                if len(_TAG_CACHE) >= _TAG_CACHE_MAX:
                    _TAG_CACHE.clear()
                _TAG_CACHE[snippet] = ("end", tag, None)
            i = endpos
        elif rawdata.startswith("<!--", i):
            close = rawdata.find("-->", i + 4)
            if close < 0:
                raise _FastBail
            i = close + 3  # handle_comment: no-op for the collector
        elif c == "?":
            gt = rawdata.find(">", i + 2)
            if gt < 0:
                raise _FastBail
            i = gt + 1  # handle_pi: no-op
        elif c == "!":
            if rawdata.startswith("<![", i):
                raise _FastBail  # marked sections
            gt = rawdata.find(">", i + 2)
            if gt < 0:
                raise _FastBail
            i = gt + 1  # doctype / bogus comment: no-op
        else:
            # stray '<' (incl. trailing at EOF): emitted as its own
            # data chunk, exactly like stdlib goahead
            h.handle_data("<")
            i += 1
    h._close_link()
    h._flush_block()


def _collect_blocks(text: str) -> "_BlockCollector":
    if _HAVE_FAST and not _FORCE_STDLIB:
        parser = _BlockCollector()
        try:
            _fast_feed(parser, text)
            return parser
        except _FastBail:
            pass  # fall through: reparse from scratch with stdlib
    parser = _BlockCollector()
    parser.feed(text)
    parser.close()
    return parser


def _is_content(block: Dict[str, Any]) -> bool:
    if block["chars"] == 0:
        return False
    link_density = block["anchor_chars"] / block["chars"]
    if link_density > MAX_LINK_DENSITY:
        return False
    words = block["text"].count(" ") + 1
    if words < 2 and block["tag"] not in HEADING_TAGS \
            and ":" not in block["text"]:
        return False
    return True


def _segment_confidence(text: str) -> float:
    """Deterministic pseudo-confidence in [0.80, 0.99]."""
    return round(0.80 + (sum(text.encode("utf-8")) % 20) / 100.0, 2)


def extract_html(payload: bytes) -> Dict[str, Any]:
    """HTML bytes → main-content text, spans, and layout elements.

    Returns ``{"extracted_text", "spans", "elements", "page_count"}``.
    ``spans`` carry (start, end, page) character offsets of each kept
    block inside ``extracted_text``; ``elements`` are per-segment with
    synthetic geometry: one row per block (30px pitch — never
    same-row across blocks under the 15px tolerance), segments advance
    8px/char with a single-space gap, so the downstream row/merge/pair
    kernel sees HTML and PDF documents through one interface.
    """
    parsed = _collect_blocks(decode_html(payload))
    kept = [b for b in parsed.blocks if _is_content(b)]

    elements: List[Dict[str, Any]] = []
    spans: List[Dict[str, int]] = []
    text_parts: List[str] = []
    offset = 0
    for row_idx, block in enumerate(kept):
        page = 1 + row_idx // ROWS_PER_PAGE
        # y is MONOTONIC across the whole document, not per-page: the
        # downstream row clusterer intentionally ignores page_num
        # (bug-compatible with the reference's spatial_analysis, which
        # clusters all pages together), so a per-page y reset would
        # give block k and block k+ROWS_PER_PAGE identical centers and
        # merge them into one garbled cross-page row on any document
        # with 41+ blocks.
        y1 = ROW_TOP + row_idx * ROW_PITCH
        x = LEFT_MARGIN
        for seg_idx, seg in enumerate(block["segments"]):
            text = seg["text"]
            if seg_idx > 0:
                x += TIGHT_GAP if seg["tight"] else COLUMN_GAP
            width = CHAR_WIDTH * len(text)
            elements.append({
                "page_num": page,
                "text": text,
                "confidence": _segment_confidence(text),
                "bbox": {
                    "x1": x, "y1": y1,
                    "x2": x + width, "y2": y1 + ROW_HEIGHT,
                    "width": width, "height": ROW_HEIGHT,
                },
            })
            x += width
        spans.append({
            "start": offset,
            "end": offset + len(block["text"]),
            "page": page,
        })
        text_parts.append(block["text"])
        offset += len(block["text"]) + 1  # '\n' joiner
    page_count = max((e["page_num"] for e in elements), default=1)
    return {
        "extracted_text": "\n".join(text_parts),
        "spans": spans,
        "elements": elements,
        "page_count": page_count,
        "link_canonical": parsed.link_canonical,
        "noindex": parsed.noindex,
        "title": _norm(parsed.title),
        "published": parsed.published,
        "base_href": parsed.base_href,
        "links": parsed.links,
        "metas": [{"meta_idx": i, **m}
                  for i, m in enumerate(parsed.metas)],
    }
