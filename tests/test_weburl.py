"""URL canonicalization + crawl-log collapse (operators/weburl.py).

The oracle-parity gate cross-checks the full queries against an
independent DuckDB SQL derivation (test_oracle_parity.py); this file
pins the rule on handcrafted edge cases the synthetic log never
draws, the generator's determinism, and the tuned plan shapes.
"""

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import weburl as W
from credit_ocr_system_spark.sources.visits import gen_visit, visits_df

# (raw, canonical) — every rule from the module docstring, including
# cases the generator never emits (http, non-default port, root
# index.html, doubled slashes, params without '=')
CASES = [
    ("HTTPS://WWW.Example.COM:443/a/b/index.html?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com:8443/x/", "https://example.com:8443/x"),
    ("http://example.com:443/x", "http://example.com:443/x"),
    ("https://example.com/index.html", "https://example.com/"),
    ("https://example.com/a//?fbclid=z", "https://example.com/a"),
    ("https://example.com/a?ref=home&page=2",
     "https://example.com/a?page=2"),
    ("https://example.com/a?utm_campaign=s&utm_medium=m",
     "https://example.com/a"),
    ("https://www.example.com/a?z=1&y=2&x=3",
     "https://example.com/a?x=3&y=2&z=1"),
    ("https://example.com/a/index.html/b", "https://example.com/a/index.html/b"),
]


def test_canonicalization_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.canonical_url
           for r in W.with_canonical(df).select("canonical_url").collect()]
    assert got == [c for _, c in CASES]


def test_canonical_host_strips_www_port_case(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Foo.Example:443/a",), ("https://foo.example/b",)],
        "url string")
    hosts = {r.canonical_host
             for r in W.with_canonical(df).select("canonical_host").collect()}
    assert hosts == {"foo.example"}


def test_generator_is_pure_and_messy():
    a = [gen_visit(i, n_pages=50) for i in range(200)]
    b = [gen_visit(i, n_pages=50) for i in range(200)]
    assert a == b
    urls = [r["url"] for r in a]
    assert any("utm_" in u for u in urls)
    assert any("#" in u for u in urls)
    assert any(":443" in u for u in urls)
    assert any("/index.html" in u for u in urls)
    assert any("www." in u for u in urls)
    # strictly increasing timestamps → max_by needs no tie-break
    ts = [r["warc_ts"] for r in a]
    assert all(x < y for x, y in zip(ts, ts[1:]))


def test_collapse_counts_one_page(spark):
    # three renderings + one changed revision of a single page, plus
    # a 404 that must not count
    rows = [
        (1, "https://www.ex.example/a?utm_source=x", "2024-01-01 00:00:01",
         200, "s1"),
        (2, "HTTPS://EX.EXAMPLE/a", "2024-01-01 00:00:02", 200, "s1"),
        (3, "https://ex.example:443/a/", "2024-01-01 00:00:03", 200, "s2"),
        (4, "https://ex.example/a", "2024-01-01 00:00:04", 404, "s3"),
    ]
    df = spark.createDataFrame(
        rows, "visit_id long, url string, warc_ts string, "
              "fetch_status int, content_sha string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = W.canonical_pages(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.canonical_url == "https://ex.example/a"
    assert r.n_visits == 3 and r.n_variants == 3 and r.n_revisions == 2
    assert r.last_sha == "s2"
    assert r.last_raw_url == "https://ex.example:443/a/"


def test_blocklist_filter_drops_hosts(spark):
    v = visits_df(spark, 400, partitions=4)
    kept = W.blocklist_filter(v, W.blocklist_df(spark))
    hosts = {r.canonical_host
             for r in kept.select("canonical_host").distinct().collect()}
    assert hosts and not (hosts & set(W.BLOCKLIST))
    assert not any(h.startswith("www.") for h in hosts)


@pytest.fixture(scope="module")
def small_visits(spark):
    return visits_df(spark, 400, partitions=4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_canonical_pages_plan_single_exchange(spark, small_visits):
    p = _plan(W.canonical_pages(small_visits))
    assert p.count("Exchange hashpartitioning") == 1
    assert "SortAggregate" not in p and "Expand" not in p
    assert "ObjectHashAggregate" in p  # map-side partial set buffers
    assert "Join" not in p and "CartesianProduct" not in p


def test_blocklist_plan_broadcast_anti_before_collapse(spark, small_visits):
    p = _plan(W.blocklist_filter(small_visits, W.blocklist_df(spark)))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_domain_stats_plan_two_level_distinct(spark, small_visits):
    # per-host page cardinality is unbounded, so the exact distinct
    # goes through the two-level (host, url) → host rewrite: two
    # exchanges, hash aggregation throughout, no sorts, no joins
    p = _plan(W.domain_stats(small_visits))
    assert p.count("Exchange hashpartitioning") == 2
    assert "SortAggregate" not in p
    assert "HashAggregate" in p
    assert "Join" not in p and "CartesianProduct" not in p


# ----------------------------------------------- redirect resolution

def test_redirect_rows_in_generator():
    pool = 220  # 400 visits → pool 220
    rows = [gen_visit(i, n_pages=pool) for i in range(400)]
    redir = [r for r in rows if r["fetch_status"] == 301]
    assert redir, "no redirect pages drawn"
    assert all(r["redirect_to"] for r in redir)
    assert all(r["redirect_to"] is None for r in rows
               if r["fetch_status"] != 301)
    # page-keyed: every fetch of a redirecting page agrees
    by_target = {}
    for r in redir:
        by_target.setdefault(r["url"].split("/")[-1], set()) \
            .add(r["redirect_to"])


def test_resolve_redirects_semantics(spark, small_visits):
    res = W.resolve_redirects(small_visits)
    rows = {r["url"]: r for r in res.collect()}
    edges = {r["src"]: r["dst"]
             for r in W.redirect_edges(small_visits).collect()}
    assert rows and edges
    multi = [r for r in rows.values() if r["hops"] >= 2]
    assert multi, "corpus drew no multi-hop chain"
    for r in rows.values():
        # re-derive by walking the edge map
        cur, hops = r["url"], 0
        for _ in range(4):
            if cur in edges:
                cur, hops = edges[cur], hops + 1
        assert (r["final_url"], r["hops"]) == (cur, hops), r["url"]
        assert r["resolved"] == (cur not in edges)
    # no self-loop edges survive extraction
    assert all(s != d for s, d in edges.items())


def test_resolve_redirects_plan_broadcast_hops(spark, small_visits):
    # every hop join broadcasts the edge table; the big side is never
    # shuffled for a join and nothing degenerates to a cartesian
    p = _plan(W.resolve_redirects(small_visits))
    assert p.count("BroadcastHashJoin") == 5  # 4 hops + resolved probe
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


# ------------------------------------------- append-mode collapse

def test_incremental_collapse_equals_batch(spark, small_visits):
    from credit_ocr_system_spark.operators import weburl as WB

    cut = 200
    committed = WB.canonical_state(
        small_visits.filter(F.col("visit_id") < cut))
    merged = WB.merge_canonical_state(
        committed, small_visits.filter(F.col("visit_id") >= cut))
    got = {r["canonical_url"]: r for r in
           WB.state_to_pages(merged).collect()}
    want = {r["canonical_url"]: r for r in
            WB.canonical_pages(small_visits).collect()}
    assert got.keys() == want.keys()
    for k, w in want.items():
        assert got[k].asDict() == w.asDict(), k


def test_incremental_collapse_empty_delta_is_identity(spark, small_visits):
    from credit_ocr_system_spark.operators import weburl as WB

    committed = WB.canonical_state(small_visits)
    merged = WB.merge_canonical_state(
        committed, small_visits.filter(F.col("visit_id") < 0))
    got = {r["canonical_url"]: r["n_visits"]
           for r in WB.state_to_pages(merged).collect()}
    want = {r["canonical_url"]: r["n_visits"]
            for r in WB.canonical_pages(small_visits).collect()}
    assert got == want


def test_incremental_collapse_plan_single_merge_join(spark, small_visits):
    from credit_ocr_system_spark.operators import weburl as WB

    committed = WB.canonical_state(
        small_visits.filter(F.col("visit_id") < 200))
    out = WB.state_to_pages(WB.merge_canonical_state(
        committed, small_visits.filter(F.col("visit_id") >= 200)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "ObjectHashAggregate" in plan  # set buffers, partials


def test_crawl_collapse_job_resume_and_delta_cost(spark, tmp_path):
    from credit_ocr_system_spark.operators import weburl as WB
    from credit_ocr_system_spark.plans.pipeline import (
        read_canonical_pages,
        run_crawl_collapse_job,
    )
    from credit_ocr_system_spark.sources.visits import visits_df

    out = str(tmp_path / "cc")
    # a growing log is a PREFIX of one stream (visits_df(n) sizes its
    # page pool on n, so two different-n logs are different corpora)
    v_full = visits_df(spark, 400, partitions=4)
    v1 = v_full.filter(F.col("visit_id") < 300)
    r1 = run_crawl_collapse_job(spark, v1, out)
    assert not r1["skipped"] and r1["n_pages"] > 0
    # unchanged log: idempotent no-op
    r2 = run_crawl_collapse_job(spark, v1, out)
    assert r2["skipped"]
    # the log grew: only the delta folds, only touched keys rewrite
    v2 = v_full
    r3 = run_crawl_collapse_job(spark, v2, out)
    assert not r3["skipped"]
    delta_keys = (WB.canonical_state(
        v2.filter(F.col("visit_id") >= 300)).count())
    assert r3["n_pages"] == delta_keys  # write scope = touched keys
    assert delta_keys < r1["n_pages"]   # strictly less than a rescan
    # committed view equals the batch collapse over the FULL log
    got = {r["canonical_url"]: r.asDict() for r in
           read_canonical_pages(spark, out).collect()}
    want = {r["canonical_url"]: r.asDict() for r in
            WB.canonical_pages(v2).collect()}
    assert got == want
