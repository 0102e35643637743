"""<table> form markup: the kernel's cell geometry must make a table
row pair exactly like its flex-div twin — cells are segments at
column stops inside ONE tr block, never blocks of their own."""
import random

from credit_ocr_system_spark.kernel.extract import extract_document
from credit_ocr_system_spark.kernel.html_extract import extract_html
from credit_ocr_system_spark.sources.pages import (
    _ALL_FIELDS,
    _field_values,
    _html_page,
    gen_page,
)


def test_table_twin_extracts_byte_identical():
    # same rng stream, two renderings: table markup must change
    # NOTHING the engine extracts — text, spans, geometry, pairs,
    # matched fields
    for seed in range(40):
        r1, r2 = random.Random(seed), random.Random(seed)
        v1 = _field_values(r1, seed % 4 == 0)
        v2 = _field_values(r2, seed % 4 == 0)
        f1 = sorted(r1.sample(_ALL_FIELDS, 12), key=_ALL_FIELDS.index)
        f2 = sorted(r2.sample(_ALL_FIELDS, 12), key=_ALL_FIELDS.index)
        h_div = _html_page(r1, v1, f1, "T")
        h_tbl = _html_page(r2, v2, f2, "T", table_form=True)
        assert h_div != h_tbl  # genuinely different markup
        e1 = extract_document("https://x/1", h_div.encode())
        e2 = extract_document("https://x/1", h_tbl.encode())
        for k in ("extracted_text", "spans", "elements", "pairs",
                  "extracted_fields", "missing_fields"):
            assert e1[k] == e2[k], (seed, k)


def test_cells_are_columns_without_whitespace():
    # compact markup (no whitespace between </td><td>) must still put
    # cells at distinct column stops — tables RENDER cells apart
    res = extract_html(
        b"<html><body><table><tr><td>Loan Amount:</td>"
        b"<td>500,000</td></tr></table></body></html>")
    assert res["extracted_text"] == "Loan Amount: 500,000"
    segs = res["elements"]
    assert [e["text"] for e in segs] == ["Loan Amount:", "500,000"]
    assert segs[0]["page_num"] == segs[1]["page_num"]
    assert segs[0]["bbox"]["y1"] == segs[1]["bbox"]["y1"]  # one row
    gap = segs[1]["bbox"]["x1"] - segs[0]["bbox"]["x2"]
    assert gap >= 20  # column stop, not a tight glyph run


def test_rows_are_separate_blocks():
    res = extract_html(
        b"<table><tr><td>Company Name:</td><td>X GmbH</td></tr>"
        b"<tr><td>Legal Form:</td><td>AG</td></tr></table>")
    assert res["extracted_text"] == "Company Name: X GmbH\nLegal Form: AG"
    ys = sorted({e["bbox"]["y1"] for e in res["elements"]})
    assert len(ys) == 2  # two visual rows


def test_th_and_whitespace_variants():
    # th cells, real-world newline-separated markup, header rows
    res = extract_html(
        b"<table>\n <tr>\n  <th>Interest Rate:</th>\n"
        b"  <td>3.5%</td>\n </tr>\n</table>")
    assert res["extracted_text"] == "Interest Rate: 3.5%"
    assert [e["text"] for e in res["elements"]] \
        == ["Interest Rate:", "3.5%"]


def test_corpus_draws_table_pages():
    n = sum(1 for i in range(200) if b"<table>" in gen_page(i)["html"])
    assert 15 <= n <= 45  # ~1/7 of 200, html-only
