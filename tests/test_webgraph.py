"""Web-graph operator semantics + physical-plan guards.

Semantics run on a hand-built extraction-shaped frame (known edges →
known ranks/counts), independent of the corpus generator; the plan
guards lock in the scale shapes the module docstring claims (map-only
link explode, single-exchange host aggregation, equi-join-only
PageRank iterations, WindowGroupLimit-pruned anchor top-k).
"""

from __future__ import annotations

import pytest

from credit_ocr_system_spark.operators import webgraph as WG


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mklinks(spark, rows):
    """rows: (src_url, [(href, dst_url, anchor, nofollow), ...])"""
    data = [
        (src, [
            {"link_idx": i, "href": h, "url": u, "anchor": a,
             "nofollow": nf}
            for i, (h, u, a, nf) in enumerate(links)])
        for src, links in rows
    ]
    return spark.createDataFrame(
        data,
        "url string, links array<struct<link_idx:int,href:string,"
        "url:string,anchor:string,nofollow:boolean>>")


@pytest.fixture(scope="module")
def toy(spark):
    return _mklinks(spark, [
        ("https://a.example/p1", [
            ("x", "https://b.example/t", "Go B", False),
            ("y", "https://b.example/t?utm_source=z", "go B", False),
            ("z", "https://c.example/u", "See C", True),
            ("bad", None, "dead", False),
        ]),
        ("https://a.example/p2", [
            ("x", "https://b.example/t", "Other B", False),
            ("s", "https://a.example/self", "self nav", False),
        ]),
        ("https://b.example/q", [
            ("x", "https://a.example/p1", "Back A", False),
        ]),
    ])


def test_page_links_canonicalizes_and_drops_unresolved(spark, toy):
    rows = {(r.src_url, r.link_idx): r
            for r in WG.page_links(toy).collect()}
    assert len(rows) == 6  # the null-dst link dropped
    r = rows[("https://a.example/p1", 1)]
    # tracking param collapsed: both b-links share a canonical target
    assert r.dst_canonical == "https://b.example/t"
    assert r.src_host == "a.example" and r.dst_host == "b.example"


def test_host_graph_counts(spark, toy):
    g = {(r.src_host, r.dst_host): r
         for r in WG.host_graph(WG.page_links(toy)).collect()}
    # intra-host a→a excluded
    assert set(g) == {("a.example", "b.example"),
                      ("a.example", "c.example"),
                      ("b.example", "a.example")}
    ab = g[("a.example", "b.example")]
    assert ab.n_links == 3 and ab.n_follow == 3 and ab.n_pages == 2
    ac = g[("a.example", "c.example")]
    assert ac.n_links == 1 and ac.n_follow == 0  # nofollow-only edge


def test_host_pagerank_order_and_conservation(spark, toy):
    ranks = {r.host: r.pagerank
             for r in WG.host_pagerank(WG.page_links(toy)).collect()}
    # follow graph: a→b, b→a (c only reachable via nofollow — excluded)
    assert set(ranks) == {"a.example", "b.example"}
    # symmetric 2-cycle: equal ranks summing to ~1
    assert ranks["a.example"] == ranks["b.example"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_host_pagerank_sink_ranks_higher(spark):
    # star: three hosts point at hub; hub points at one spoke
    df = _mklinks(spark, [
        (f"https://s{i}.example/p",
         [("x", "https://hub.example/", "hub", False)])
        for i in range(3)
    ] + [("https://hub.example/",
          [("x", "https://s0.example/p", "s0", False)])])
    ranks = {r.host: r.pagerank
             for r in WG.host_pagerank(WG.page_links(df)).collect()}
    assert ranks["hub.example"] > ranks["s1.example"]
    assert ranks["s0.example"] > ranks["s1.example"]  # hub endorses s0


def test_anchor_topk_rank_and_normalization(spark, toy):
    top = WG.anchor_topk(WG.page_links(toy), k=2).collect()
    by_dst = {}
    for r in top:
        by_dst.setdefault(r.dst_canonical, []).append(
            (r.rank, r.anchor, r.n))
    b = sorted(by_dst["https://b.example/t"])
    # "Go B" and "go B" collapse under lowercase → count 2 wins rank 1
    assert b[0] == (1, "go b", 2)
    assert b[1][0] == 2 and b[1][2] == 1


# --- physical-plan guards ---------------------------------------------------


def test_page_links_is_map_only(spark, toy):
    # explode + canonicalization are pure per-row work: zero exchanges
    p = _plan(WG.page_links(toy))
    assert "Exchange" not in p
    assert "Generate explode" in p


def test_host_graph_two_level_distinct_no_join(spark, toy):
    # per-edge source-page cardinality is unbounded, so the exact
    # distinct goes through the two-level (edge, src) → edge rewrite
    # (same shape as weburl.domain_stats): two exchanges, hash
    # aggregation throughout, never a join or sort
    p = _plan(WG.host_graph(WG.page_links(toy)))
    assert p.count("Exchange hashpartitioning") == 2
    assert "Join" not in p and "CartesianProduct" not in p
    assert "SortAggregate" not in p
    assert "HashAggregate" in p


def test_host_pagerank_equi_joins_only(spark, toy):
    p = _plan(WG.host_pagerank(WG.page_links(toy)))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_anchor_topk_windowgrouplimit(spark, toy):
    p = _plan(WG.anchor_topk(WG.page_links(toy)))
    assert "WindowGroupLimit" in p  # top-k pruned pre-exchange
    assert "CartesianProduct" not in p
