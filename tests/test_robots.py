"""robots.txt kernel parser (RFC 9309) + the broadcast robots_gate
operator: grammar paths, precedence rules, ground-truth property
check, and the no-corpus-shuffle plan shape."""

import pytest

from credit_ocr_system_spark.kernel.robots import (
    evaluate,
    parse_robots,
    pattern_to_regex,
)
from credit_ocr_system_spark.sources import robots as RS


def test_grammar_groups_and_case():
    txt = b"""
# comment line
User-Agent: GoogleBot
User-agent: cos-crawler
Disallow: /private/
Allow: /private/pub
USER-AGENT: *
disallow: /tmp/$
Crawl-delay: 7
Sitemap: https://x/sitemap.xml
"""
    rules = parse_robots(txt)
    agents = {r["agent"] for r in rules}
    assert agents == {"googlebot", "cos-crawler", "*"}
    # consecutive UA lines share one group: both get both rules
    gb = [r for r in rules if r["agent"] == "googlebot"]
    assert {(r["allow"], r["pattern"]) for r in gb} == \
        {(False, "/private/"), (True, "/private/pub")}
    star = [r for r in rules if r["agent"] == "*"]
    assert star == [{"agent": "*", "allow": False, "pattern": "/tmp/$",
                     "rx": "^/tmp/$", "rule_len": 6}]


def test_empty_disallow_and_garbage_never_raise():
    assert parse_robots(b"User-agent: *\nDisallow:") == []
    assert parse_robots(b"") == []
    assert parse_robots(b"\xff\xfe garbage ::: lines") == []
    assert parse_robots(b"Disallow: /x") == []  # rule before any UA


def test_pattern_translation():
    assert pattern_to_regex("/a/*.php$") == r"^/a/.*\.php$"
    assert pattern_to_regex("/plain") == "^/plain"
    import re

    rx = pattern_to_regex("/*?sort=")
    assert re.match(rx, "/shop/x?sort=asc")
    assert not re.match(rx, "/shop/x?page=2")


def test_evaluate_precedence():
    rules = parse_robots(
        b"User-agent: *\nDisallow: /credit/\nAllow: /credit/pub\n"
        b"User-agent: cos-crawler\nAllow: /credit/\n")
    # specific group wins entirely over *
    assert evaluate(rules, "cos-crawler", "/credit/x")
    assert not evaluate(rules, "otherbot", "/credit/x")
    # longest match: Allow /credit/pub (11) > Disallow /credit/ (8)
    assert evaluate(rules, "otherbot", "/credit/pub/1")
    # no match → allowed
    assert evaluate(rules, "otherbot", "/news/")
    # allow wins exact ties
    tie = parse_robots(
        b"User-agent: *\nDisallow: /a/\nAllow: /a*\n")
    assert evaluate(tie, "x", "/a/")


def test_generator_covers_grammar():
    rows = RS.robots_rows()
    hosts = {r["host"] for r in rows}
    assert len(hosts) > 20
    assert any(r["agent"] == RS.AGENT for r in rows)
    assert any(r["pattern"].endswith("$") for r in rows)
    assert any("*" in r["pattern"] for r in rows)
    assert any(r["allow"] for r in rows)
    # some hosts have no rules at all (empty robots / no file)
    from credit_ocr_system_spark.sources.pages import _DOMAINS

    assert hosts < set(_DOMAINS)


def test_gate_matches_python_reference(spark):
    from credit_ocr_system_spark.operators.weburl import robots_gate
    from credit_ocr_system_spark.sources.visits import visits_df

    urls = visits_df(spark, 600, partitions=4).select("url").distinct()
    got = {r["url"]: r["allowed"] for r in
           robots_gate(urls, RS.robots_df(spark)).collect()}
    rules_by_host = {}
    for r in RS.robots_rows():
        rules_by_host.setdefault(r["host"], []).append(r)
    import re as _re

    for url, allowed in got.items():
        base = url.split("#", 1)[0]
        rest = _re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://", "", base)
        hostport, _, path = rest.partition("/")
        host = _re.sub(r"^www\.", "",
                       hostport.split(":")[0].lower())
        want = evaluate(rules_by_host.get(host, []),
                        "cos-crawler", "/" + path)
        assert allowed == want, url
    assert got and not all(got.values())  # the gate actually denies


def test_gate_plan_broadcast_no_corpus_shuffle(spark):
    from credit_ocr_system_spark.operators.weburl import robots_gate
    from credit_ocr_system_spark.sources.visits import visits_df

    urls = visits_df(spark, 200, partitions=4).select("url")
    plan = robots_gate(urls, RS.robots_df(spark))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the only exchanges feed the SMALL side's aggregate + broadcast —
    # none repartition the url corpus
    assert "Exchange rangepartitioning" not in plan


def test_parse_sitemaps():
    from credit_ocr_system_spark.kernel.robots import parse_sitemaps

    txt = (b"# c\nUser-agent: *\nDisallow: /x\n"
           b"Sitemap: https://h/s.xml\n"
           b"sitemap : https://h/t.xml # trailing comment\n"
           b"Sitemap: https://h/s.xml\n"   # dupe: keep-first
           b"Sitemap:\n"                    # empty value: skipped
           b"Crawl-delay: 2\n")
    assert parse_sitemaps(txt) == ["https://h/s.xml",
                                   "https://h/t.xml"]
    assert parse_sitemaps(b"") == []
    assert parse_sitemaps(b"\xff\xfe garbage") == []


def test_robots_sitemaps_df_matches_kernel(spark):
    from credit_ocr_system_spark.kernel.robots import parse_sitemaps
    from credit_ocr_system_spark.sources.robots import (
        gen_robots_txt,
        robots_sitemaps_df,
    )
    from credit_ocr_system_spark.sources.pages import _DOMAINS

    got = robots_sitemaps_df(spark).collect()
    want = {}
    for h in _DOMAINS:
        for j, u in enumerate(parse_sitemaps(gen_robots_txt(h))):
            want[(h, j)] = u
    assert {(r["host"], r["sm_idx"]): r["sitemap_url"]
            for r in got} == want
    # the corpus draws multi-sitemap hosts and sitemap-less hosts
    assert any(j == 1 for (_, j) in want)
    assert len({h for (h, _) in want}) < len(_DOMAINS)
