"""Charset sniffing (kernel/charset.py): WHATWG precedence, label
normalization, the never-raise fallback, and the corpus's
encoding-only variants leaving extraction byte-identical."""

import codecs

import pytest

from credit_ocr_system_spark.kernel.charset import (
    decode_html,
    sniff_charset,
)
from credit_ocr_system_spark.kernel.extract import extract_document
from credit_ocr_system_spark.sources.pages import (
    _encode_html,
    gen_page,
    stable_mod,
)


def test_bom_beats_everything():
    p = codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")
    assert sniff_charset(p, "text/html; charset=shift_jis") \
        == ("utf-16-le", "bom")
    assert decode_html(p, "text/html; charset=shift_jis") == "héllo"
    p8 = codecs.BOM_UTF8 + "héllo".encode("utf-8")
    assert sniff_charset(p8) == ("utf-8", "bom")
    assert decode_html(p8) == "héllo"  # BOM consumed, not emitted


def test_http_beats_meta():
    body = ('<html><head><meta charset="utf-8"></head>'
            "<body>äöü€</body></html>").encode("cp1252")
    codec, src = sniff_charset(body, "text/html; charset=iso-8859-1")
    assert (codec, src) == ("cp1252", "http")
    assert "äöü€" in decode_html(body, "text/html; charset=iso-8859-1")


@pytest.mark.parametrize("label,codec", [
    ("iso-8859-1", "cp1252"),   # the web's latin-1 IS 1252
    ("latin1", "cp1252"),
    ("US-ASCII", "cp1252"),
    ("gb2312", "gbk"),          # WHATWG: gb2312 label means gbk
    ("iso-8859-9", "cp1254"),
    ("Shift-JIS", "shift_jis"),
    ("UTF8", "utf-8"),
])
def test_label_normalization(label, codec):
    assert sniff_charset(b"", f"text/html; charset={label}") \
        == (codec, "http")


def test_meta_charset_both_forms():
    modern = b'<html><head><meta charset="windows-1252"></head>'
    legacy = (b'<html><head><meta http-equiv="Content-Type" '
              b'content="text/html; charset=iso-8859-1"></head>')
    assert sniff_charset(modern) == ("cp1252", "meta")
    assert sniff_charset(legacy) == ("cp1252", "meta")


def test_meta_utf16_read_as_utf8():
    # an ASCII-visible meta cannot be 16-bit; spec maps it to utf-8
    p = b'<meta charset="utf-16">\xc3\xa9'
    assert sniff_charset(p) == ("utf-8", "meta")
    assert decode_html(p).endswith("é")


def test_unknown_label_falls_through():
    p = '<meta charset="x-nonsense">é'.encode("utf-8")
    assert sniff_charset(p) == ("utf-8", "utf-8")  # strict-utf8 step


def test_unlabeled_valid_utf8():
    assert sniff_charset("ßé€".encode("utf-8")) == ("utf-8", "utf-8")


def test_unlabeled_fallback_is_1252():
    p = b"caf\xe9 \x80 euro"  # latin-1-ish bytes, invalid utf-8
    assert sniff_charset(p) == ("cp1252", "fallback")
    assert decode_html(p) == "café € euro"


def test_1252_undefined_bytes_never_raise():
    # 0x81 0x8D 0x8F 0x90 0x9D are undefined in cp1252; the WHATWG
    # index decodes them as their Latin-1 C1 controls
    p = b"\xfe a\x81b\x8db\x8fc\x90d\x9de"
    out = decode_html(p)
    assert "\x81" in out and "\x9d" in out
    # arbitrary garbage with a labeled codec replaces, never raises
    assert decode_html(b"\xff\xfe\xfd",
                       "text/html; charset=shift_jis") != ""


def test_corpus_variants_cover_the_spread():
    srcs = set()
    for i in range(400):
        p = gen_page(i)
        if p["html"][:5] in (b"%PDF-", b"%PDF_"):
            continue
        srcs.add(sniff_charset(bytes(p["html"]))[1])
    assert {"bom", "meta", "utf-8"} <= srcs


def test_encoding_variants_leave_extraction_identical():
    # the invariant the golden suite rests on: every charset variant
    # of a page decodes to text whose extraction equals the plain
    # utf-8 page's (the injected <meta> contributes no text block)
    checked = 0
    for i in range(400):
        p = gen_page(i)
        if p["html"][:4] == b"%PDF":
            continue
        d = stable_mod(p["url"] + "#charset", 12)
        if d > 3:
            continue
        # re-derive the plain utf-8 twin from the decoded text minus
        # the injected meta tag
        import re as _re

        decoded = decode_html(bytes(p["html"]))
        plain = _re.sub(r"<meta [^>]*>", "", decoded, count=1)
        got = extract_document(p["url"], bytes(p["html"]))
        want = extract_document(p["url"], plain.encode("utf-8"))
        assert got["extracted_text"] == want["extracted_text"], p["url"]
        assert got["pairs"] == want["pairs"]
        checked += 1
    assert checked >= 20  # the url-hash spread must actually fire


def test_encode_html_non_1252_char_ships_utf8():
    html = "<html><head><title>x</title></head><body>中</body></html>"
    # find a url whose draw lands on a cp1252 variant
    url = next(u for u in (f"https://ex.org/{i}" for i in range(100))
               if stable_mod(u + "#charset", 12) == 0)
    data = _encode_html(url, html)
    assert data.decode("utf-8") == html  # fell back, no meta injected


# -------------------------------------------- head indexing directives

def test_head_meta_parse_unit():
    from credit_ocr_system_spark.kernel.html_extract import extract_html

    h = (b'<html><head><title>t</title>'
         b'<link rel="canonical" href="https://x/a">'
         b'<meta name="robots" content="NOINDEX, follow"></head>'
         b'<body><p>Label: value body text here</p></body></html>')
    res = extract_html(h)
    assert res["link_canonical"] == "https://x/a"
    assert res["noindex"] is True
    # first canonical wins; robots without noindex stays False
    h2 = (b'<head><link rel=canonical href="https://x/1">'
          b'<link rel=canonical href="https://x/2">'
          b'<meta name=robots content="nofollow"></head>')
    res2 = extract_html(h2)
    assert res2["link_canonical"] == "https://x/1"
    assert res2["noindex"] is False
    # absent entirely → empty/False
    res3 = extract_html(b"<p>Label: value text here</p>")
    assert res3["link_canonical"] == "" and res3["noindex"] is False


def test_corpus_draws_head_directives():
    from credit_ocr_system_spark.kernel.extract import extract_document

    self_c = other_c = noidx = none_c = 0
    for i in range(300):
        p = gen_page(i)
        if p["html"][:4] == b"%PDF":
            continue
        res = extract_document(p["url"], p["html"])
        if res["link_canonical"] == p["url"]:
            self_c += 1
        elif res["link_canonical"]:
            other_c += 1
            assert "/c/" in res["link_canonical"]
        else:
            none_c += 1
        noidx += res["noindex"]
    assert self_c and other_c and noidx and none_c


def test_head_directives_leave_extraction_text_identical():
    # the injected tags live in <head>: zero text blocks, identical
    # extraction — the invariant that keeps checked-in goldens green
    from credit_ocr_system_spark.kernel.html_extract import extract_html
    from credit_ocr_system_spark.sources.pages import _decorate_head

    base = ("<html><head><title>x</title></head>"
            "<body><p>Label: value body text</p></body></html>")
    url = next(u for u in
               (f"https://d.example/credit/{i}" for i in range(5000))
               if stable_mod(u + "#canon", 6) == 1
               and stable_mod(u + "#noindex", 17) == 0)
    dec = _decorate_head(url, base)
    assert dec != base
    a = extract_html(base.encode())
    b = extract_html(dec.encode())
    assert a["extracted_text"] == b["extracted_text"]
    assert a["elements"] == b["elements"]
    assert b["noindex"] and b["link_canonical"].startswith("https://")


def test_title_and_published_capture():
    from credit_ocr_system_spark.kernel.html_extract import extract_html

    h = (b'<html><head><title> My  Page \xe2\x80\x94 Title </title>'
         b'<meta property="article:published_time" '
         b'content="2023-05-04T12:00:00Z"></head>'
         b'<body><p>Label: value body text</p></body></html>')
    res = extract_html(h)
    assert res["title"] == "My Page — Title"  # normalized
    assert res["published"] == "2023-05-04T12:00:00Z"
    # unclosed <title> must not swallow the document
    h2 = (b"<html><head><title>Broken"
          b"<body><p>Label: value body text</p></body></html>")
    res2 = extract_html(h2)
    assert res2["title"] == "Broken"
    assert "value body text" in res2["extracted_text"]


def test_corpus_draws_published_dates():
    from credit_ocr_system_spark.kernel.extract import extract_document
    import re as _re

    n_pub = n_title = n_html = 0
    for i in range(200):
        p = gen_page(i)
        if p["html"][:4] == b"%PDF":
            continue
        n_html += 1
        res = extract_document(p["url"], p["html"])
        if res["published"]:
            n_pub += 1
            assert _re.fullmatch(
                r"\d{4}-\d{2}-\d{2}T\d{2}:00:00Z", res["published"])
        if res["title"]:
            n_title += 1
            assert res["title"] == p["text"]  # generator's title field
    assert n_pub > 0.2 * n_html           # ~1/3 draw actually fires
    assert n_title == n_html              # every page has a title
