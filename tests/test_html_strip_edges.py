"""Strip-region and title edge cases from the round-4 kernel review.

Each test pins a real-crawl pattern that used to corrupt extraction:
void elements perturbing the strip depth in either direction, stale
strip roots reviving the unclosed-head rescue, inline-SVG/duplicate
titles concatenating, and the per-page y-reset merging rows across
synthetic pages.
"""

from credit_ocr_system_spark.kernel.html_extract import (
    ROWS_PER_PAGE,
    extract_html,
)
from credit_ocr_system_spark.kernel.layout import cluster_rows


def _text(html: bytes) -> str:
    return extract_html(html)["extracted_text"]


def test_self_closed_void_inside_nav_does_not_end_strip():
    # <img/> synthesizes starttag+endtag in both parser paths; the
    # endtag must not decrement a depth the starttag never raised
    html = (b"<html><body>"
            b'<nav><a href="/"><img src="logo.png"/></a>'
            b"Home About Pricing</nav>"
            b"<p>the actual article text stays.</p></body></html>")
    out = _text(html)
    assert "Home About Pricing" not in out
    assert "the actual article text stays." in out


def test_unclosed_void_inside_nav_does_not_overstrip():
    # <wbr> (no end tag ever) must not leave the depth permanently
    # high and swallow the rest of the document
    html = (b"<html><body><nav>Site<wbr>Name menu</nav>"
            b"<p>content after the nav survives.</p></body></html>")
    out = _text(html)
    assert "content after the nav survives." in out
    assert "menu" not in out


def test_stray_body_does_not_revive_negative_class_strip():
    # the unclosed-head rescue must only fire for the HEAD strip: a
    # duplicate <body> inside a class-stripped sidebar used to hit a
    # stale _strip_root == 'head' and leak the sidebar
    html = (b"<html><head><title>T</title></head><body>"
            b'<div class="sidebar">promo<body>links galore</div>'
            b"<p>main content is kept here.</p></body></html>")
    out = _text(html)
    assert "promo" not in out
    assert "links galore" not in out
    assert "main content is kept here." in out


def test_svg_title_is_not_document_title():
    html = (b"<html><head><title>ACME Credit Portal</title></head>"
            b"<body><svg><title>menu icon</title></svg>"
            b"<p>body text here okay.</p></body></html>")
    res = extract_html(html)
    assert res["title"] == "ACME Credit Portal"
    assert "menu icon" not in res["extracted_text"]


def test_second_title_does_not_concatenate():
    html = (b"<html><head><title>Real Title</title></head>"
            b"<body><title>seo spam title</title>"
            b"<p>body text here okay.</p></body></html>")
    assert extract_html(html)["title"] == "Real Title"


def test_blocks_on_later_pages_never_share_rows():
    # y must be monotonic across the whole document: the downstream
    # clusterer ignores page_num (reference bug-compat), so a per-page
    # y reset merged block k with block k+ROWS_PER_PAGE
    n_blocks = ROWS_PER_PAGE + 5
    body = b"".join(
        b"<p>block number %d has plenty of words.</p>" % i
        for i in range(n_blocks))
    res = extract_html(b"<html><body>" + body + b"</body></html>")
    assert res["page_count"] == 2
    rows = cluster_rows(res["elements"])
    assert len(rows) == n_blocks
    assert all(len(r) == 1 for r in rows)


def test_omitted_end_tags_inside_nav_do_not_overstrip():
    # valid HTML omits </li> (and </p>, </td>...) freely; counting
    # those starts desynced the depth and swallowed the document
    html = (b"<html><body><nav><ul><li>Home<li>About</ul></nav>"
            b"<p>the real article content here.</p></body></html>")
    out = _text(html)
    assert "the real article content here." in out
    assert "Home" not in out


def test_negative_class_li_strip_ends_at_sibling():
    # a strip rooted at an optional-end element ends where a browser
    # implies its close: the next <li> sibling
    html = (b"<html><body><ul>"
            b'<li class="menu-item">navigation link words</li>'
            b"<li>real list content stays here okay.</li>"
            b"</ul></body></html>")
    out = _text(html)
    assert "real list content stays here okay." in out
    assert "navigation link words" not in out


def test_negative_class_li_strip_ends_at_parent_close():
    html = (b"<html><body><ul>"
            b'<li class="menu-item">navigation link words</ul>'
            b"<p>paragraph after the list is kept.</p></body></html>")
    out = _text(html)
    assert "paragraph after the list is kept." in out
    assert "navigation link words" not in out


def test_uncaptured_title_text_never_leaks_into_content():
    html = (b"<html><head><title>Real Title</title></head>"
            b"<body><title>seo spam title words</title>"
            b"<p>body text here okay.</p></body></html>")
    res = extract_html(html)
    assert res["title"] == "Real Title"
    assert "seo spam" not in res["extracted_text"]


def test_interrupted_title_still_marks_done():
    # a tag inside <title> ends the capture; the captured text must
    # still claim the slot so a later body title cannot concatenate
    html = (b"<html><head><title>First Part"
            b'<meta name="x" content="y"></head>'
            b"<body><title>Second Title</title>"
            b"<p>body text here okay.</p></body></html>")
    assert extract_html(html)["title"] == "First Part"


def test_blank_title_yields_to_real_title():
    html = (b"<html><head><title> </title>"
            b"<title>Actual Title</title></head>"
            b"<body><p>body text here okay.</p></body></html>")
    assert extract_html(html)["title"] == "Actual Title"
