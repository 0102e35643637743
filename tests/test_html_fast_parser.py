"""Fast HTML tokenizer ≡ stdlib HTMLParser equivalence.

The fast path (`kernel/html_extract.py::_fast_feed`) must emit the
exact handler-event sequence stdlib emits, because the whole
correctness story is byte-identical extracted text. We compare the
full `extract_html` output (text, spans, elements, geometry) between
both paths on:

* the deterministic synthetic corpus (same generator as bench),
* handwritten adversarial cases (CDATA script content, entities,
  stray '<', self-closing br inside stripped subtrees, attribute
  values containing '>', malformed constructs that force the bail
  path),
* hypothesis-generated tag soup.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from credit_ocr_system_spark.kernel import html_extract as hx
from credit_ocr_system_spark.sources.pages import gen_page


def _stdlib_extract(payload: bytes):
    parser = hx._BlockCollector()
    parser.feed(payload.decode("utf-8", errors="replace"))
    parser.close()
    kept = [b for b in parser.blocks if hx._is_content(b)]
    return parser.blocks, kept


def _fast_extract(payload: bytes):
    parser = hx._BlockCollector()
    hx._fast_feed(parser, payload.decode("utf-8", errors="replace"))
    kept = [b for b in parser.blocks if hx._is_content(b)]
    return parser.blocks, kept


def assert_equivalent(payload: bytes):
    """Fast path output == stdlib output (or fast path bails)."""
    want_blocks, _ = _stdlib_extract(payload)
    try:
        got_blocks, _ = _fast_extract(payload)
    except hx._FastBail:
        return  # fallback path: extract_html would reparse via stdlib
    assert got_blocks == want_blocks
    # and the public entry point end-to-end: _collect_blocks via the
    # fast path vs forced through the stdlib path must agree
    fast_out = hx.extract_html(payload)
    have_fast = hx._HAVE_FAST
    hx._HAVE_FAST = False
    try:
        stdlib_out = hx.extract_html(payload)
    finally:
        hx._HAVE_FAST = have_fast
    assert fast_out == stdlib_out


CASES = [
    b"",
    b"<p>plain</p>",
    b"<P CLASS='X'>upper tags</P>",
    b"<p>a &amp; b &lt;tag&gt; &#65; &#x42; &nosuch; &amp</p>",
    b"<div><span>tight</span><span>run</span> <span>col</span></div>",
    b"<script>if (a<b && c>d) { x = '</div>'; }</script><p>after now</p>",
    b"<style>p > a { color: red; }</style><p>styled block</p>",
    b"<script>no close tag",
    # hypothesis find (r5): unterminated CDATA inside an open <a> —
    # stdlib discards the tail, so anchor text must stay empty
    b"<p><a href='a&amp;b'><p><p><p><script></p>",
    b"<a href='x'><style>p{}",
    b"<p>a < b and c<d</p>",
    b"<p>unterminated <",
    b"<p>text<br/>more text</p>",
    b"<nav><br/><p>stripped</p></nav><p>kept block: 1</p>",
    b"<a href='x>y'>anchor text</a><p>link dense test</p>",
    b'<a href="a&amp;b">amp in attr</a><p>more here</p>',
    b"<!-- comment --><p>after comment</p>",
    b"<!-- unterminated comment <p>x</p>",
    b"<!DOCTYPE html><p>doc typed</p>",
    b"<?php echo 1; ?><p>pi handled</p>",
    b"<![CDATA[raw]]><p>marked section</p>",
    b"<p>empty attr <span class>x</span> ok</p>",
    b"<p class=bare>bare attr value</p>",
    b"<p class = 'spaced' >spaced eq</p>",
    b"<td>Kreditbetrag:</td><td>250.000,00 \xe2\x82\xac</td>",
    b"<div class='sidebar'>nav nav nav</div><p>real content here</p>",
    b"<p>deep <b>bold <i>ital</i> tail</b> end</p>",
    b"<li>item: 1</li><li>item: 2</li>",
    b"</p>end before start<p>then text</p>",
    b"</>weird</><p>after empty endtag</p>",
    b"<p/>self closing block<p>next</p>",
    b"<p>\xc3\xa9l\xc3\xa8ve &eacute;</p>",
    b"<p>tab\tand\nnewline  collapse</p>",
    b"<SCRIPT SRC='x'>var a = 1 </SCRIPT  ><p>tolerant close</p>",
    b"<script></scriptx></script><p>fake close inside cdata</p>",
    b"<br></br><p>br endtag inside strip asymmetry</p>",
    b"<form><br><p>inside form</p></form><p>outside: 3</p>",
    # tag-cache aliasing probes: a complete tag is cached, then a
    # similar tag whose first '>' sits inside a quoted value must NOT
    # resolve to the cached prefix (its quote count is odd)
    b"<a b='x'>first link</a><a b='x>y'>second link</a><p>t: 1</p>",
    b'<a b="it\'s>f">weird</a><a b="it">plain</a><p>tail: 2</p>',
    b"<p class=bare>one: 1</p><p class=bare>two: 2</p>"
    b"<p class=bare>three: 3</p>",  # repeated cache hits
    b"<br/><br/><br/><p>self-closing repeats: 4</p>",
]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(exclude_categories=("Cs",)),
               max_size=60))
def test_norm_equivalence(text):
    """_norm's split/join fast path == the regex definition."""
    assert hx._norm(text) == hx._WS_RE.sub(" ", text).strip()


def test_cache_warm_equals_cold():
    """Feeding the same document repeatedly (warm tag cache) must give
    identical output to the first (cold) parse."""
    payload = (b"<div class='menu'>nav</div><p>real content: 42</p>"
               b"<td>Amount:</td><td>1.234,56 \xe2\x82\xac</td>")
    first = hx.extract_html(payload)
    for _ in range(3):
        assert hx.extract_html(payload) == first


@pytest.mark.parametrize("payload", CASES)
def test_adversarial_cases(payload):
    assert_equivalent(payload)


def test_synthetic_corpus_equivalence():
    """Every generator page (HTML and PDF-magic skipped) parses
    identically under both paths — and the fast path never bails on
    the corpus (it must actually be exercised at bench time)."""
    bailed = 0
    checked = 0
    for row_id in range(600):
        page = gen_page(row_id)
        payload = page["html"]
        if payload is None or payload.startswith(b"%PDF"):
            continue
        want_blocks, _ = _stdlib_extract(payload)
        try:
            got_blocks, _ = _fast_extract(payload)
        except hx._FastBail:
            bailed += 1
            continue
        assert got_blocks == want_blocks, f"divergence at row {row_id}"
        checked += 1
    assert checked > 300
    assert bailed == 0, "fast path must handle the whole corpus"


_tag = st.sampled_from(
    ["p", "div", "span", "a", "b", "nav", "script", "style", "td",
     "li", "br", "h2", "P", "DIV"])
_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)),
    max_size=40)


@st.composite
def _soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            t = draw(_tag)
            attr = draw(st.sampled_from(
                ["", " class='menu'", ' id="main"', " class=bare",
                 " role='nav'", " href='a&amp;b'", " x='v>w'"]))
            parts.append(f"<{t}{attr}>")
        elif kind == 1:
            parts.append(f"</{draw(_tag)}>")
        elif kind == 2:
            parts.append(draw(_text))
        elif kind == 3:
            parts.append(draw(st.sampled_from(
                ["&amp;", "&lt;", "&#65;", "&bogus;", "&", "<", ">",
                 "<!-- c -->", "<!DOCTYPE html>", "<?pi?>", "<br/>"])))
        elif kind == 4:
            parts.append(f"<script>{draw(_text)}</script>")
        else:
            parts.append(draw(_text) + ": 42")
    return "".join(parts).encode("utf-8")


@settings(max_examples=300, deadline=None)
@given(_soup())
def test_hypothesis_soup(payload):
    assert_equivalent(payload)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_hypothesis_raw_bytes(payload):
    assert_equivalent(payload)
