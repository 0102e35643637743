"""Robustness fuzzing: the kernel must never raise and stay
deterministic on arbitrary bytes — a 10^12-row crawl contains every
malformed page imaginable, and one uncaught exception fails a whole
partition (and with retries, the job)."""

import time

from hypothesis import given, settings, strategies as st

from credit_ocr_system_spark.kernel.extract import extract_document

_html_fragments = st.sampled_from([
    b"<html>", b"</div>", b"<p>", b"<script>", b"<nav>", b"<span",
    b"<!DOCTYPE html>", b"<a href='x'>", b"&euro;", b"&#x20AC;", b"<!--",
    b"text ", b"Label: value", b"\x00\x01\x02", b"\xff\xfe", b"%PDF",
    b"%PDF-GRAFT 1\n", b"E\t1\t0\t0\t10\t10\t0.5\ttok\n", b"E\tbad\n",
    b"\xc3\xa9", b"\xe2\x82\xac", b"<td>", b"</table>", b"=\"",
])


@settings(max_examples=200, deadline=None)
@given(st.lists(_html_fragments, max_size=30))
def test_never_raises_and_deterministic(fragments):
    payload = b"".join(fragments)
    a = extract_document("u", payload)
    b = extract_document("u", payload)
    assert a == b
    assert isinstance(a["extracted_text"], str)
    # spans are consistent with the text they index
    for s in a["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(a["extracted_text"])


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_raw_binary_never_raises(payload):
    res = extract_document("u", payload)
    assert res["url"] == "u"


def test_large_page_stays_linear():
    # 2 MB page: ~25k blocks; must stay comfortably sub-second-ish and
    # never blow up quadratically.
    blocks = "".join(
        f"<p>paragraph {i} with some words and Label: value {i}</p>"
        for i in range(25_000))
    payload = f"<html><body><main>{blocks}</main></body></html>".encode()
    assert len(payload) > 1_000_000
    t0 = time.time()
    res = extract_document("big", payload)
    elapsed = time.time() - t0
    assert res["elements"]
    assert len(res["spans"]) == 25_000
    assert elapsed < 20.0, f"kernel took {elapsed:.1f}s on a 2MB page"


def test_deep_nesting_no_recursion_error():
    payload = (b"<div>" * 5000) + b"deep text here" + (b"</div>" * 5000)
    res = extract_document("deep", payload)
    assert res["extracted_text"]


_pdf_fragments = st.sampled_from([
    b"%PDF-1.5\n", b"1 0 obj\n", b"<< /Type /Catalog >>", b"endobj\n",
    b"stream\n", b"endstream\n", b"BT /F1 12 Tf (x) Tj ET",
    b"q 612 0 0 792 0 0 cm ", b"BI /W 4 /H 4 /CS /G /BPC 8 ",
    b"BI /W 99999 /H 99999 ", b"ID\n", b"\x00\x01\x02\x03", b"EI ",
    b"/Filter /FlateDecode", b"/F /CCF /DP << /K -1 >>",
    b"/Decode [1 0]", b"/BlackIs1 true", b"xref\n0 1\n",
    b"trailer << /Root 1 0 R >>", b"startxref\n0\n%%EOF",
    b"/Im1 Do ", b"<</Length 3>>",
])


@settings(max_examples=150, deadline=None)
@given(st.lists(_pdf_fragments, max_size=25))
def test_pdf_token_soup_never_raises(fragments):
    # real-PDF magic routes to the full parser: object soup, headless
    # streams, truncated inline images, bad filters — never an
    # exception, always a deterministic (possibly empty) result
    payload = b"%PDF-1.4\n" + b"".join(fragments)
    a = extract_document("u", payload)
    b = extract_document("u", payload)
    assert a == b
    assert a["doc_kind"] == "pdf"
