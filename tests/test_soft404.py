"""Soft-404 detection (textops.soft404_flags) + the corpus variant.

The oracled query (`x_soft404`) checks the rule end-to-end against
DuckDB; these tests pin the semantics: the corpus's seeded soft-404
pages are caught (including the sneaky variant whose <title> stays
legitimate), long pages that merely DISCUSS 404s are not, and the
operator stays a zero-shuffle projection.
"""

import contextlib
import io

from credit_ocr_system_spark.operators.textops import (
    SOFT404_MAX_CHARS,
    soft404_flags,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, ["url", "title", "extracted_text"])


def test_corpus_soft404s_are_caught(spark):
    from credit_ocr_system_spark.operators.extraction import extract_pages
    from credit_ocr_system_spark.sources.pages import pages_df

    docs = extract_pages(pages_df(spark, 200, partitions=8))
    out = soft404_flags(docs).toPandas()
    flagged = out[out.soft404]
    # ~1/30 of the 200-page corpus's HTML pages are seeded soft 404s
    assert 3 <= len(flagged) <= 12
    # the sneaky variant trips ONLY the body pattern
    assert bool((flagged.body_hit & ~flagged.title_hit).any())
    # every flagged page is short; the corpus's legitimate pages
    # (form pages, PDFs) never trip the phrase rule
    assert (flagged.n_chars < SOFT404_MAX_CHARS).all()
    legit = out[~out.soft404]
    assert len(legit) > 180
    assert not bool((legit.title_hit | legit.body_hit).any())


def test_long_page_discussing_404_not_flagged(spark):
    prose = ("Our guide explains what error 404 means and how servers "
             "emit a page not found response. " * 10)
    assert len(prose) >= SOFT404_MAX_CHARS
    out = soft404_flags(
        _docs(spark, [("u", "HTTP errors explained", prose)])).collect()
    assert bool(out[0].body_hit)
    assert not bool(out[0].soft404)  # length guard holds


def test_short_error_page_flagged(spark):
    out = soft404_flags(
        _docs(spark, [("u", "404 Not Found", "Nothing here.")])).collect()
    assert bool(out[0].title_hit) and bool(out[0].soft404)


def test_null_columns_safe(spark):
    df = spark.createDataFrame(
        [("u", None, None)],
        "url string, title string, extracted_text string")
    out = soft404_flags(df).collect()
    assert not bool(out[0].soft404) and out[0].n_chars == 0


def test_zero_shuffle_plan(spark):
    df = soft404_flags(_docs(spark, [("u", "t", "x")]))
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "Join" not in plan
