"""Web-graph operators over the extraction stage's outlink surface.

Common Crawl publishes exactly this derivation next to its WARC/WET/
WAT triple: a host-level web graph plus host ranks, built from the
links the extraction pass captured. The reference service has no
crawl/link notion (one upload at a time,
``/root/reference/src/dms/service.py``); this family belongs to the
training-data-pipeline surface on top — link-graph centrality is a
standard crawl-prioritization and quality signal (e.g. the harmonic-
centrality ranking Common Crawl ships, the PageRank prior in C4-era
corpus weighting).

Inputs: ``extract_pages`` rows with the ``links`` array
(``kernel/extract.py::_resolve_links`` — already RFC 3986-resolved,
fragment-free, http(s)-only or null). Everything here is DataFrame
expression work on that column:

* :func:`page_links` — one row per resolved outlink, both endpoints
  canonicalized by the weburl rule (pure codegen, no Python);
* :func:`host_graph` — inter-host edge list with link/follow/distinct-
  page counts: ONE hash exchange with map-side partials (the two
  exact COUNT(DISTINCT) columns ride it via Spark's Expand rewrite);
* :func:`host_pagerank` — fixed-iteration directed PageRank over the
  follow-only host graph, bit-exact across engines (ordered
  neighbor-sum folds, shared damping literals — the
  ``textops.candidate_pagerank`` discipline);
* :func:`anchor_topk` — top-k anchor texts per canonical target URL,
  WindowGroupLimit-pruned map-side before the final exchange (the
  anchor-text aggregate is the classic target-page description signal
  search and query-generation pipelines consume).

Scale shape at 10^12 documents: ``page_links`` is map-only on the
extraction output; ``host_graph``/``anchor_topk`` shuffle once on
their (bounded-cardinality) group keys; PageRank's per-iteration cost
is one equi-join + one groupBy on ``host`` keys — the HOST graph is
~10^8 nodes at web scale, orders of magnitude under the page corpus,
so the rank vector and degree table are small enough to co-partition
(or broadcast outright) while the corpus-sized link table never
re-enters after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .portable import pround
from .textops import PAGERANK_BASE, PAGERANK_DAMPING, PAGERANK_ITERS
from .weburl import with_canonical

ANCHOR_TOPK = 3


def page_links(extracted: DataFrame) -> DataFrame:
    """Extraction rows → one row per resolved outlink.

    Endpoints are canonicalized with the weburl rule so tracking-param
    / default-port / fragment variants of the same target collapse
    before any graph aggregation. Unresolved links (``url`` null:
    ``mailto:``/``javascript:`` etc.) are graph non-edges and drop
    here — the WAT sink, not this operator, is the raw-fidelity view.
    """
    l = (extracted
         .select(F.col("url").alias("src_url"),
                 F.explode("links").alias("l"))
         .select("src_url", F.col("l.link_idx").alias("link_idx"),
                 F.col("l.href").alias("href"),
                 F.col("l.url").alias("dst_url"),
                 F.col("l.anchor").alias("anchor"),
                 F.col("l.nofollow").alias("nofollow"))
         .where(F.col("dst_url").isNotNull()))
    c = with_canonical(l, url_col="src_url")
    c = (c.withColumnRenamed("canonical_url", "src_canonical")
          .withColumnRenamed("canonical_host", "src_host"))
    c = with_canonical(c, url_col="dst_url")
    return (c.withColumnRenamed("canonical_url", "dst_canonical")
             .withColumnRenamed("canonical_host", "dst_host"))


def host_graph(links: DataFrame,
               include_internal: bool = False) -> DataFrame:
    """Host-level edge list from :func:`page_links` output.

    One row per (src_host, dst_host) with total link count, follow
    (non-nofollow) count, and the number of distinct source pages —
    the dampener real host-rank pipelines use against single-page
    link farms. Intra-host edges (site navigation) are excluded by
    default, as in Common Crawl's host-level graph.
    """
    e = links if include_internal else links.where(
        F.col("src_host") != F.col("dst_host"))
    return (e.groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links"),
                 F.count_if(~F.col("nofollow")).alias("n_follow"),
                 F.countDistinct("src_canonical").alias("n_pages")))


def _follow_edges(links: DataFrame) -> DataFrame:
    """Distinct directed follow edges between distinct hosts."""
    return (links
            .where((F.col("src_host") != F.col("dst_host"))
                   & ~F.col("nofollow"))
            .select(F.col("src_host").alias("src"),
                    F.col("dst_host").alias("dst"))
            .distinct())


def host_pagerank(links: DataFrame,
                  iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration directed PageRank over the follow-only host
    graph — the crawl-prioritization / corpus-weighting rank.

    Same bit-exactness discipline as ``textops.candidate_pagerank``
    (its docstring carries the full argument): ordered left folds by
    source host for the neighbor sums (float addition isn't
    associative), identical damping literals on both engines, and a
    ``localCheckpoint`` lineage cut per iteration so edge
    construction runs exactly once and the plan stays constant-size.
    Simplified update (dangling mass leaks — ranks are compared
    within one run): ``r'(v) = 0.15/N + 0.85 · Σ_{u→v} r(u)/deg(u)``
    with ``deg`` the out-degree.
    """
    edges = _follow_edges(links)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    hosts = (edges.select(F.col("src").alias("host"))
             .unionAll(edges.select("dst"))
             .distinct())
    n = hosts.agg(F.count("*").alias("n_hosts"))
    nodes = (hosts.crossJoin(F.broadcast(n))
             .localCheckpoint(eager=True))
    ranks = nodes.select(
        "host", (F.lit(1.0) / F.col("n_hosts")).alias("r"))
    for _ in range(iters):
        contrib = (ed.join(ranks, ed.src == ranks.host)
                   .select("dst", "src",
                           (F.col("r") / F.col("deg")).alias("c")))
        folded = contrib.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"]).alias("s"))
        ranks = (nodes.join(folded, nodes.host == folded.dst, "left")
                 .select("host",
                         (F.lit(PAGERANK_BASE) / F.col("n_hosts")
                          + F.lit(PAGERANK_DAMPING)
                          * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("r"))
                 .localCheckpoint(eager=True))
    return ranks.select("host", pround(F.col("r"), 9).alias("pagerank"))


def anchor_topk(links: DataFrame, k: int = ANCHOR_TOPK) -> DataFrame:
    """Top-k anchor texts per canonical target URL.

    Anchors lowercase-normalized; empty anchors (PDF /Link
    annotations, image links) don't describe the target and drop.
    Rank = (count DESC, anchor ASC) — fully deterministic. The
    ``row_number() <= k`` filter compiles to WindowGroupLimit with a
    partial pass BEFORE the rank exchange, so only k rows per
    (target, partition) ever cross the wire.
    """
    counted = (links
               .select("dst_canonical",
                       F.lower(F.col("anchor")).alias("anchor"))
               .where(F.col("anchor") != "")
               .groupBy("dst_canonical", "anchor")
               .agg(F.count("*").alias("n")))
    w = Window.partitionBy("dst_canonical").orderBy(
        F.col("n").desc(), F.col("anchor"))
    return (counted.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("dst_canonical", "anchor", "n",
                    F.col("rank").cast("int").alias("rank")))
