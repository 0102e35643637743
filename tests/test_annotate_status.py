"""Annotation SVG sink (S8) and doc_status state mapping (S10/P21)."""

from credit_ocr_system_spark.operators.annotate import annotation_svg
from credit_ocr_system_spark.operators.extraction import extract_pages
from credit_ocr_system_spark.plans.pipeline import doc_status
from credit_ocr_system_spark.sources.pages import pages_df


def test_annotation_svg_shapes(spark):
    ext = extract_pages(pages_df(spark, 30, partitions=2))
    rows = annotation_svg(ext).collect()
    assert rows
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], 0)
        by_url[r["url"]] += r["n_elements"]
        svg = r["svg"]
        assert svg.startswith('<svg xmlns="http://www.w3.org/2000/svg"')
        assert svg.endswith("</svg>")
        assert svg.count("<rect ") == r["n_elements"]
        assert svg.count("<text ") == r["n_elements"]
        # confidence-band colors present
        assert 'stroke="#' in svg
    # per-(url,page) totals reconcile with the extraction output
    ext_counts = {r["url"]: r["n_elements"] for r in ext.collect()}
    assert by_url == {u: n for u, n in ext_counts.items() if n > 0}


def test_doc_status_state_mapping(spark):
    from pyspark.sql import Row

    pages = spark.createDataFrame([
        Row(url="u_ok", warc_ts=None,
            html=b"<html><body><main><p>Amount: <span>42</span></p>"
                 b"</main></body></html>", text="", lang="en"),
        Row(url="u_empty", warc_ts=None, html=b"", text="", lang="en"),
    ], schema="url string, warc_ts timestamp, html binary, text string,"
              " lang string")
    ext = extract_pages(pages)
    status = {r["url"]: r["status"]
              for r in doc_status(ext, "run-x").collect()}
    assert status["u_empty"] == "failed_empty"
    assert status["u_ok"] in ("done", "done_no_pairs")


def test_html_page2_svg_is_page_local(spark):
    """HTML geometry is document-absolute (monotonic y); the overlay
    must rebase each page to local coordinates, so page 2's shapes
    start near the top of its own canvas instead of a blank strip
    ~1200px down."""
    import re

    from pyspark.sql import Row

    from credit_ocr_system_spark.kernel.html_extract import (
        ROW_PITCH,
        ROW_TOP,
        ROWS_PER_PAGE,
    )

    n_blocks = ROWS_PER_PAGE + 3
    body = "".join(
        f"<p>block number {i} has plenty of words.</p>"
        for i in range(n_blocks))
    pages = spark.createDataFrame(
        [Row(url="u_big", warc_ts=None,
             html=f"<html><body>{body}</body></html>".encode(),
             text="", lang="en")],
        schema="url string, warc_ts timestamp, html binary,"
               " text string, lang string")
    svgs = {r["page_num"]: r["svg"]
            for r in annotation_svg(extract_pages(pages)).collect()}
    assert set(svgs) == {1, 2}
    page_span = ROWS_PER_PAGE * ROW_PITCH
    for page_num, svg in svgs.items():
        ys = [int(m) for m in re.findall(r'<rect [^>]*y="(-?\d+)"', svg)]
        assert ys and min(ys) == int(ROW_TOP)
        assert max(ys) < page_span
