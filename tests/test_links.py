"""Outlink capture + RFC 3986 resolution (the web-graph / WAT surface).

HTML side: every ``<a href>`` in document order — including anchors in
stripped containers (nav/footer links are graph edges even though
their text is boilerplate) — with anchor text, ``rel=nofollow``, and
``<base href>`` rebasing. PDF side: ``/Link`` annotation ``/URI``
actions (ISO 32000-1 §12.5.6.5 / §12.6.4.7), including in encrypted
files. Resolution: fetch URL ⊕ base ⊕ href per RFC 3986, fragments
dropped, non-http(s) targets yield ``url=None`` with the raw href
kept for WAT fidelity.
"""

from __future__ import annotations

import pytest

from credit_ocr_system_spark.kernel.extract import extract_document
from credit_ocr_system_spark.kernel.html_extract import (
    MAX_LINKS,
    extract_html,
)


def links_of(url: str, html: str) -> list:
    return extract_document(url, html.encode("utf-8"))["links"]


class TestHtmlLinks:
    def test_document_order_and_resolution(self):
        ls = links_of(
            "https://ex.com/a/b",
            "<body><a href='/root'>R</a><a href='rel'>r</a>"
            "<a href='//cdn.ex.com/x'>p</a>"
            "<a href='https://other.example/y'>o</a></body>")
        assert [l["url"] for l in ls] == [
            "https://ex.com/root", "https://ex.com/a/rel",
            "https://cdn.ex.com/x", "https://other.example/y"]
        assert [l["link_idx"] for l in ls] == [0, 1, 2, 3]

    def test_base_href_rebases_relative_only(self):
        ls = links_of(
            "https://ex.com/a/b",
            "<head><base href='/app/'></head>"
            "<body><a href='x.html'>x</a><a href='/abs'>a</a></body>")
        assert ls[0]["url"] == "https://ex.com/app/x.html"
        assert ls[1]["url"] == "https://ex.com/abs"

    def test_first_base_wins(self):
        ls = links_of(
            "https://ex.com/",
            "<head><base href='/one/'><base href='/two/'></head>"
            "<body><a href='x'>x</a></body>")
        assert ls[0]["url"] == "https://ex.com/one/x"

    def test_fragment_dropped_href_kept_verbatim(self):
        ls = links_of("https://ex.com/",
                      "<body><a href='/p#sec'>s</a></body>")
        assert ls[0]["url"] == "https://ex.com/p"
        assert ls[0]["href"] == "/p#sec"

    def test_non_http_schemes_unresolved(self):
        ls = links_of(
            "https://ex.com/",
            "<body><a href='mailto:a@b.c'>m</a>"
            "<a href='javascript:void(0)'>j</a>"
            "<a href='tel:+491234'>t</a>"
            "<a href='ftp://ex.com/f'>f</a></body>")
        assert [l["url"] for l in ls] == [None] * 4
        assert [l["href"] for l in ls] == [
            "mailto:a@b.c", "javascript:void(0)", "tel:+491234",
            "ftp://ex.com/f"]

    def test_nofollow_rel_token(self):
        ls = links_of(
            "https://ex.com/",
            "<body><a href='/a' rel='nofollow'>a</a>"
            "<a href='/b' rel='noopener nofollow'>b</a>"
            "<a href='/c' rel='noopener'>c</a></body>")
        assert [l["nofollow"] for l in ls] == [True, True, False]

    def test_stripped_container_links_counted_text_not_content(self):
        res = extract_document(
            "https://ex.com/",
            b"<body><nav><a href='/s'>Sections here</a></nav>"
            b"<main><p>Real content words for the block filter"
            b" here.</p></main>"
            b"<footer><a href='/i'>Imprint</a></footer></body>")
        assert [l["href"] for l in res["links"]] == ["/s", "/i"]
        assert res["links"][0]["anchor"] == "Sections here"
        assert "Sections here" not in res["extracted_text"]
        assert "Imprint" not in res["extracted_text"]

    def test_anchor_without_href_is_not_a_link(self):
        ls = links_of("https://ex.com/",
                      "<body><a name='top'>T</a><a href='/x'>x</a></body>")
        assert [l["href"] for l in ls] == ["/x"]

    def test_nested_anchor_auto_closes(self):
        # browsers auto-close an open <a> at the next <a>
        ls = links_of("https://ex.com/",
                      "<body><a href='/a'>one<a href='/b'>two</a></body>")
        assert [(l["href"], l["anchor"]) for l in ls] == [
            ("/a", "one"), ("/b", "two")]

    def test_unclosed_trailing_anchor_flushes(self):
        ls = links_of("https://ex.com/",
                      "<body><p><a href='/x'>tail text")
        assert ls[0]["anchor"] == "tail text"

    def test_anchor_text_normalized(self):
        ls = links_of("https://ex.com/",
                      "<body><a href='/x'>  two\n  words </a></body>")
        assert ls[0]["anchor"] == "two words"

    def test_link_cap_bounds_link_farms(self):
        html = "<body>" + "".join(
            f"<a href='/p{i}'>x</a>" for i in range(MAX_LINKS + 50))
        res = extract_html(html.encode())
        assert len(res["links"]) == MAX_LINKS

    def test_parser_paths_agree(self, monkeypatch):
        html = ("<head><base href='/b/'></head><body>"
                "<nav><a href='r1' rel='NOFOLLOW'>N</a></nav>"
                "<p><a href='//h.example/p'>in <b>bold</b></a></p>")
        fast = extract_html(html.encode())
        monkeypatch.setenv("COS_SPARK_HTML_PARSER", "stdlib")
        import importlib

        import credit_ocr_system_spark.kernel.html_extract as he
        importlib.reload(he)
        try:
            slow = he.extract_html(html.encode())
            assert fast["links"] == slow["links"]
            assert fast["base_href"] == slow["base_href"]
        finally:
            monkeypatch.delenv("COS_SPARK_HTML_PARSER")
            importlib.reload(he)


class TestPdfLinks:
    def _pdf(self, uris, **kw):
        from credit_ocr_system_spark.sources.pdf_write import build_pdf

        return build_pdf([[(40.0, 20.0, "Title Words", 16.0)]],
                         links=[list(uris)], **kw)

    def test_uri_annotations_extracted_in_order(self):
        pdf = self._pdf(["https://a.example/1", "https://b.example/2"])
        res = extract_document("https://ex.com/d.pdf", pdf)
        assert [l["href"] for l in res["links"]] == [
            "https://a.example/1", "https://b.example/2"]
        assert [l["url"] for l in res["links"]] == [
            "https://a.example/1", "https://b.example/2"]
        assert all(l["anchor"] == "" for l in res["links"])

    @pytest.mark.parametrize("enc", ["rc4-40", "rc4-128", "aesv2"])
    def test_encrypted_pdf_uri_decrypts(self, enc):
        pdf = self._pdf(["https://sec.example/x"], encrypt=enc)
        res = extract_document("https://ex.com/d.pdf", pdf)
        assert [l["url"] for l in res["links"]] == [
            "https://sec.example/x"]

    def test_objstm_pdf_links(self):
        pdf = self._pdf(["https://o.example/x"], objstm=True)
        res = extract_document("https://ex.com/d.pdf", pdf)
        assert [l["url"] for l in res["links"]] == [
            "https://o.example/x"]

    def test_widget_annots_untouched_by_links(self):
        from credit_ocr_system_spark.sources.pdf_write import build_pdf

        pdf = build_pdf(
            [[(40.0, 20.0, "Name:", 12.0)]],
            annots=[[(300.0, 20.0, 80.0, 12.0, "Acme GmbH")]],
            links=[["https://a.example/1"]])
        res = extract_document("https://ex.com/d.pdf", pdf)
        assert any(e["text"] == "Acme GmbH" for e in res["elements"])
        assert [l["url"] for l in res["links"]] == [
            "https://a.example/1"]


class TestCorpusLinks:
    def test_links_are_text_invariant(self):
        # the linkbox/base decoration may not move a single content
        # byte: regenerate a page with the decoration stripped out
        # and compare extraction output
        import credit_ocr_system_spark.sources.pages as pages

        changed = 0
        for i in range(0, 60):
            p = pages.gen_page(i)
            if p["html"].startswith(b"%PDF"):
                continue
            with_links = extract_document(p["url"], p["html"])
            orig = pages._decorate_links
            try:
                pages._decorate_links = lambda url, html: html
                bare = extract_document(
                    p["url"], pages.gen_page(i)["html"])
            finally:
                pages._decorate_links = orig
            assert with_links["extracted_text"] == bare["extracted_text"]
            assert with_links["spans"] == bare["spans"]
            if with_links["links"] != bare["links"]:
                changed += 1
        assert changed > 0  # the decoration actually adds links

    def test_corpus_links_resolve_and_cross_hosts(self):
        from credit_ocr_system_spark.sources.pages import gen_page

        hosts = set()
        for i in range(120):
            p = gen_page(i)
            res = extract_document(p["url"], p["html"])
            for l in res["links"]:
                if l["url"]:
                    hosts.add(l["url"].split("/")[2])
        assert len(hosts) > 10  # cross-host fan-out exists


def test_resolve_fast_path_is_urljoin():
    # the fast path must be STRING-IDENTICAL to the pure-urljoin
    # reference on every corpus href and on the adversarial shapes
    # that target its guard conditions
    from urllib.parse import urljoin

    from credit_ocr_system_spark.kernel.extract import (
        MAX_RESOLVED_URL,
        _resolve_links,
    )
    from credit_ocr_system_spark.kernel.html_extract import extract_html
    from credit_ocr_system_spark.sources.pages import gen_page

    def reference(url, base_href, raw_links):
        base = url or ""
        if base_href:
            try:
                base = urljoin(base, base_href)
            except ValueError:
                pass
        out = []
        for idx, ln in enumerate(raw_links):
            resolved = None
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

    # full corpus sweep
    n_checked = 0
    for i in range(300):
        p = gen_page(i)
        if p["html"][:4] == b"%PDF":
            continue
        base = extract_html(p["html"])
        raw = base.get("links", [])
        got = _resolve_links(p["url"], base.get("base_href", ""), raw)
        assert got == reference(p["url"], base.get("base_href", ""),
                                raw)
        n_checked += len(raw)
    assert n_checked > 3000

    # adversarial shapes: each guard condition, both branches
    adv = ["https://x/y", "http://x/y?a=1", "https://x", "HTTPS://x/Y",
           "https://x/y?", "https://x/y;p=1", "https://x/y#f",
           "https://x/\ty", "https://x/y ", " https://x/y",
           "https://x/y\n", "//h/p", "//h/p?q", "///p", "//\\h/p",
           "//h", "//", "//h/p;x", "//h/p?", "rel/path", "/abs/path",
           "?query", "#frag", "javascript:alert(1)", "mailto:a@b",
           "https://" , "data:text/plain,x", "ftp://h/p",
           "https://x/%20y", "https://x:8080/y", "https://u:p@x/y",
           "https:///p", "http:///p", "https://?q",
           # relative fast-path guard targets
           "../up", "./same", "x/../y", "x/./y", ".", "..", "x/..",
           "x/.", "..x", ".hidden", "x?a=1", "x?", "tel:123",
           "a:b/c", "a/b:c", "rel;p=1", "rel#f", "rel\npath",
           "rel path", "\\x", "x\\y", "?", "/", "more/info.html",
           "deep/a/b/c?z=1",
           # interior empty segments (non-rooted merge collapses
           # them) and WHATWG edge-control-char stripping
           "img//logo.png", "a//b//c", "/x//y", "x//",
           "\x01foo", "x\x01y", "foo\x01", "https://x/y\x01",
           "\x01https://x/y", "https://h/a//b", "//h/p//q"]
    raw = [{"href": h, "anchor": "", "nofollow": False} for h in adv]
    for base_url, bh in [("https://ex.org/a/b", ""),
                         ("http://ex.org/a/b", "/app/"),
                         ("https://ex.org/a/b", "https://other.example/z/"),
                         ("", "")]:
        assert _resolve_links(base_url, bh, raw) \
            == reference(base_url, bh, raw)
