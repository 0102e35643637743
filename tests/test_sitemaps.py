"""Sitemap source (sitemaps.org 0.9): generator grammar coverage,
namespace-tolerant parse, index resolution, and the frontier diff
operator's semantics + plan shape."""

import pytest

from credit_ocr_system_spark.sources import sitemaps as SM
from credit_ocr_system_spark.sources.pages import _DOMAINS, stable_mod


def test_parse_urlset_and_index():
    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    xml = (f'<?xml version="1.0"?><urlset {ns}>'
           "<url><loc>https://x/a</loc>"
           "<lastmod>2024-01-02</lastmod></url>"
           "<url><loc> https://x/b </loc></url>"
           "<url><lastmod>2024-01-01</lastmod></url>"  # no loc: drop
           "</urlset>")
    got = SM.parse_sitemap(xml)
    assert got == [
        {"kind": "url", "loc": "https://x/a", "lastmod": "2024-01-02"},
        {"kind": "url", "loc": "https://x/b", "lastmod": None},
    ]
    idx = (f'<sitemapindex {ns}><sitemap>'
           "<loc>https://x/s1.xml</loc></sitemap></sitemapindex>")
    assert SM.parse_sitemap(idx) == [
        {"kind": "sitemap", "loc": "https://x/s1.xml", "lastmod": None}]
    # malformed XML yields [], never raises
    assert SM.parse_sitemap("<urlset><url>") == []
    assert SM.parse_sitemap("") == []


def test_generator_grammar_coverage():
    all_files = SM.sitemap_file_rows()
    hosts = {f["host"] for f in all_files}
    assert hosts < set(_DOMAINS)  # some hosts serve none
    assert any("sitemapindex" in f["xml"] for f in all_files)
    assert any("urlset" in f["xml"] for f in all_files)
    # index children are materialized as their own rows
    idx_hosts = {f["host"] for f in all_files
                 if "sitemapindex" in f["xml"]}
    h = next(iter(idx_hosts))
    mine = [f for f in all_files if f["host"] == h]
    assert len(mine) == 3  # index + 2 children
    kids = {e["loc"] for f in mine if "sitemapindex" in f["xml"]
            for e in SM.parse_sitemap(f["xml"])}
    assert kids == {f["sitemap_url"] for f in mine
                    if "urlset" in f["xml"]}


def test_frontier_diff_semantics(spark):
    from credit_ocr_system_spark.operators.weburl import (
        sitemap_frontier,
        with_canonical,
    )
    from credit_ocr_system_spark.sources.visits import visits_df

    visits = visits_df(spark, 2000, partitions=4)
    sm = SM.sitemap_urls_df(spark)
    out = sitemap_frontier(sm, visits)
    rows = out.collect()
    assert rows
    # every /new/ url is frontier by construction; no frontier url
    # was ever visited
    news = {r["loc"] for r in sm.collect() if "/new/" in r["loc"]}
    got = {r["canonical_url"] for r in rows}
    assert news <= got
    seen = {r["canonical_url"] for r in
            with_canonical(visits).select("canonical_url")
            .distinct().collect()}
    assert not (got & seen)


def test_frontier_plan_no_sort(spark):
    from credit_ocr_system_spark.operators.weburl import sitemap_frontier
    from credit_ocr_system_spark.sources.visits import visits_df

    out = sitemap_frontier(SM.sitemap_urls_df(spark),
                           visits_df(spark, 500, partitions=4))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # date-typed lastmod keeps the collapse in hash aggregation
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan and "LeftAnti" in plan


def test_bloom_frontier_subset_of_exact(spark):
    from credit_ocr_system_spark.operators.weburl import (
        sitemap_frontier,
        sitemap_frontier_bloom,
    )
    from credit_ocr_system_spark.sources.visits import visits_df

    visits = visits_df(spark, 2000, partitions=4)
    sm = SM.sitemap_urls_df(spark)
    exact = {r["canonical_url"]
             for r in sitemap_frontier(sm, visits).collect()}
    bloom = {r["canonical_url"]
             for r in sitemap_frontier_bloom(sm, visits).collect()}
    # no false negatives ever: a url the bloom calls frontier was
    # truly never visited; false positives only DROP candidates
    assert bloom <= exact
    dropped = len(exact) - len(bloom)
    assert dropped <= max(2, len(exact) // 100), \
        f"FP rate too high: {dropped}/{len(exact)}"


def test_bloom_frontier_plan_bounded_exchange(spark):
    from credit_ocr_system_spark.operators.weburl import (
        sitemap_frontier_bloom,
    )
    from credit_ocr_system_spark.sources.visits import visits_df

    out = sitemap_frontier_bloom(SM.sitemap_urls_df(spark),
                                 visits_df(spark, 500, partitions=4))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every slot probe broadcasts; the corpus side is never the build
    # or shuffle side of a join
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # slot dedup happens with map-side partial aggregation (the
    # exchange carries ≤16^width slot strings, not corpus urls)
    assert "partial" in plan.lower()
