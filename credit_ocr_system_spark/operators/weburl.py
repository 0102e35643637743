"""URL canonicalization and crawl-log collapse operators.

The first stage of every published web-corpus pipeline (C4,
RefinedWeb, Common Crawl's own dedup): 10^12 fetch records collapse
to one row per *canonical* page before any content-level dedup runs.
The reference service has no crawl notion (it ingests one upload at a
time, ``/root/reference/src/dms/service.py``); this family belongs to
the training-data-pipeline surface the builder brief adds on top.

Canonicalization rule (applied identically by the DuckDB oracles in
``queries.py``, which re-derive it with an independent SQL
implementation):

1. drop the ``#fragment``;
2. lowercase scheme and host; strip a leading ``www.``;
3. drop the port when it is the scheme default (``https``/443,
   ``http``/80); keep any other explicit port;
4. path: strip a trailing ``/index.html`` (→ directory), then ALL
   trailing slashes; an emptied path becomes ``/``;
5. query: split on ``&``, drop empty params and tracking params
   (key starts with ``utm_`` or key ∈ :data:`TRACKING_KEYS`), sort
   the survivors lexicographically, rejoin; drop the ``?`` when
   nothing survives.

Scale shape: canonicalization is pure per-row expression work
(whole-stage codegen, no Python), and the collapse is ONE hash
exchange on the canonical key with map-side partial aggregation —
``max_by(url, warc_ts)`` replaces the window-rank idiom, so there is
no sort anywhere. ``warc_ts`` is unique per fetch (strictly
increasing in the generator; dedupe ties upstream in a real log), so
``max_by`` is deterministic under partial aggregation. The two exact
``COUNT(DISTINCT …)`` columns ride the same single shuffle via
Spark's Expand rewrite (3× map output, still one exchange round —
the honest price of exact variant counts; swap to HLL sketches at
10^12 if ±2% is acceptable). Blocklist filtering is a broadcast
LEFT ANTI join applied BEFORE the collapse — a real blocklist is
~10^5 domains, far under the broadcast threshold, and filtering
early means blocked domains never enter the shuffle.

Grammar assumption (holds for WARC-style logs): the authority is
always followed by ``/`` — i.e. every URL carries an explicit path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .portable import pround

# Tracking-param keys dropped by canonicalization (plus any key with
# the ``utm_`` prefix). Shared with the SQL oracle generator so the
# two implementations cannot drift on the list itself.
TRACKING_KEYS = ("fbclid", "gclid", "ref")

# (scheme, default port) pairs — rule 3.
DEFAULT_PORTS = (("https", "443"), ("http", "80"))

# Demo blocklist for the filter operator (a real deployment loads
# ~10^5 registered domains from a table; the JOIN shape is the same).
BLOCKLIST = ("hot-forum.example", "shop-world.example")


def with_canonical(visits: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` and ``canonical_host`` per the module
    rule. Pure per-row built-ins — stays inside whole-stage codegen."""
    df = (visits
          .withColumn("_base", F.substring_index(F.col(url_col), "#", 1))
          .withColumn("_rest", F.regexp_replace(
              F.col("_base"), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""))
          .withColumn("_hostport", F.substring_index(F.col("_rest"),
                                                     "/", 1))
          .withColumn("_pathq",
                      F.expr("substr(_rest, length(_hostport) + 1)")))

    scheme = F.lower(F.regexp_extract(
        F.col("_base"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.regexp_replace(                                     # rule 2
        F.lower(F.substring_index(F.col("_hostport"), ":", 1)),
        r"^www\.", "")
    port = F.regexp_extract(F.col("_hostport"), r":(\d+)$", 1)
    is_default = F.lit(False)
    for sch, prt in DEFAULT_PORTS:                               # rule 3
        is_default = is_default | ((scheme == sch) & (port == prt))
    portc = F.when((port == "") | is_default, "").otherwise(
        F.concat(F.lit(":"), port))

    path0 = F.substring_index(F.col("_pathq"), "?", 1)
    qraw = F.when(F.instr(F.col("_pathq"), "?") > 0,
                  F.expr("substr(_pathq, instr(_pathq, '?') + 1)")
                  ).otherwise(F.lit(""))
    p1 = F.regexp_replace(path0, r"/index\.html$", "/")          # rule 4
    p2 = F.regexp_replace(p1, r"/+$", "")
    path = F.when(p2 == "", F.lit("/")).otherwise(p2)

    def _keep(p):                                                # rule 5
        key = F.split(p, "=")[0]
        return (p != "") & ~key.startswith("utm_") & \
            ~key.isin(*TRACKING_KEYS)

    qcanon = F.array_join(
        F.array_sort(F.filter(F.split(qraw, "&"), _keep)), "&")
    canonical = F.concat(
        scheme, F.lit("://"), host, portc, path,
        F.when(qcanon == "", "").otherwise(F.concat(F.lit("?"), qcanon)))
    return (df.withColumn("canonical_host", host)
              .withColumn("canonical_url", canonical)
              .drop("_base", "_rest", "_hostport", "_pathq"))


def _collapse(canon: DataFrame) -> DataFrame:
    # Distinct counts as size(collect_set(…)), NOT countDistinct: the
    # key is ONE page, so its variant/revision sets are a handful of
    # strings (fetches of a single page per crawl window), and the
    # set-buffer keeps the whole collapse a single exchange with
    # map-side partials (ObjectHashAggregate). countDistinct would
    # trigger the Expand rewrite — 3× map output, a second exchange,
    # and (mixed with max_by) a SortAggregate fallback. That shape is
    # right when per-key cardinality is unbounded (see domain_stats),
    # wrong here. Plan-guarded in tests/test_weburl.py.
    return (canon.groupBy("canonical_url", "canonical_host")
            .agg(F.count("*").alias("n_visits"),
                 F.size(F.collect_set("url")).cast("long")
                  .alias("n_variants"),
                 F.size(F.collect_set("content_sha")).cast("long")
                  .alias("n_revisions"),
                 # epoch seconds, not raw timestamps: bigint compares
                 # identically across engines/timezone configs
                 F.min("warc_ts").cast("long").alias("first_seen_epoch"),
                 F.max("warc_ts").cast("long").alias("last_seen_epoch"),
                 F.max_by("url", "warc_ts").alias("last_raw_url"),
                 F.max_by("content_sha", "warc_ts").alias("last_sha")))


def canonical_pages(visits: DataFrame) -> DataFrame:
    """Collapse a crawl log to one row per canonical page: visit /
    variant / revision counts, first/last seen, and the latest
    snapshot's raw URL + content hash. One exchange, no sort."""
    ok = visits.filter(F.col("fetch_status") == 200)
    return _collapse(with_canonical(ok))


def blocklist_df(spark, domains=BLOCKLIST) -> DataFrame:
    return spark.createDataFrame(
        [(d,) for d in domains], "blocked_host string")


def blocklist_filter(visits: DataFrame, blocked: DataFrame) -> DataFrame:
    """:func:`canonical_pages` over the log minus blocked domains —
    broadcast LEFT ANTI before the collapse, so blocked domains never
    reach the shuffle."""
    ok = visits.filter(F.col("fetch_status") == 200)
    c = with_canonical(ok)
    kept = c.join(F.broadcast(blocked),
                  c.canonical_host == blocked.blocked_host,
                  "left_anti")
    return _collapse(kept)


def canonical_state(visits: DataFrame) -> DataFrame:
    """The MERGEABLE form of the crawl collapse: like
    :func:`canonical_pages` but carrying the variant/revision SETS
    instead of their sizes (distinct counts cannot be merged from
    counts alone; the sets are per-page-small by the same argument as
    ``_collapse``'s set buffers). One exchange, map-side partials."""
    c = with_canonical(visits.filter(F.col("fetch_status") == 200))
    return (c.groupBy("canonical_url", "canonical_host")
            .agg(F.count("*").alias("n_visits"),
                 F.collect_set("url").alias("variant_set"),
                 F.collect_set("content_sha").alias("sha_set"),
                 F.min("warc_ts").cast("long")
                  .alias("first_seen_epoch"),
                 F.max("warc_ts").cast("long")
                  .alias("last_seen_epoch"),
                 F.max_by("url", "warc_ts").alias("last_raw_url"),
                 F.max_by("content_sha", "warc_ts").alias("last_sha")))


def merge_canonical_state(committed: DataFrame,
                          delta_visits: DataFrame) -> DataFrame:
    """Fold a crawl-snapshot DELTA into committed collapse state —
    the append-mode path: a new snapshot costs one collapse of the
    delta plus one equi-join against the state, never a rescan of
    the corpus. Correctness contract (the oracle): merged state
    projected through :func:`state_to_pages` EQUALS the batch
    collapse over all visits — counts add, sets union, last-wins
    resolves by the strictly-later epoch.

    Scale shape: with the state table bucketed/pre-partitioned on
    canonical_url, the full-outer merge shuffles only the delta side
    (committed partitions are already co-located) — the same
    delta-cost argument as incremental_dedup."""
    d = canonical_state(delta_visits)
    ct, dt = committed.alias("ct"), d.alias("dt")
    j = ct.join(dt, ["canonical_url", "canonical_host"],
                "full_outer")

    def pick_last(col: str):
        # strictly-increasing unique warc_ts ⇒ no epoch ties between
        # disjoint visit sets; the side with the later last fetch wins
        return (F.when(F.col("ct.last_seen_epoch").isNull(),
                       F.col(f"dt.{col}"))
                .when(F.col("dt.last_seen_epoch").isNull(),
                      F.col(f"ct.{col}"))
                .when(F.col("dt.last_seen_epoch")
                      > F.col("ct.last_seen_epoch"),
                      F.col(f"dt.{col}"))
                .otherwise(F.col(f"ct.{col}")))

    empty = F.array().cast("array<string>")
    return j.select(
        "canonical_url", "canonical_host",
        (F.coalesce(F.col("ct.n_visits"), F.lit(0))
         + F.coalesce(F.col("dt.n_visits"), F.lit(0)))
        .alias("n_visits"),
        F.array_union(F.coalesce(F.col("ct.variant_set"), empty),
                      F.coalesce(F.col("dt.variant_set"), empty))
        .alias("variant_set"),
        F.array_union(F.coalesce(F.col("ct.sha_set"), empty),
                      F.coalesce(F.col("dt.sha_set"), empty))
        .alias("sha_set"),
        # least/greatest return NULL only when BOTH sides are NULL,
        # which full_outer excludes — but coalesce documents intent
        F.coalesce(F.least("ct.first_seen_epoch",
                           "dt.first_seen_epoch"),
                   "ct.first_seen_epoch", "dt.first_seen_epoch")
        .alias("first_seen_epoch"),
        F.coalesce(F.greatest("ct.last_seen_epoch",
                              "dt.last_seen_epoch"),
                   "ct.last_seen_epoch", "dt.last_seen_epoch")
        .alias("last_seen_epoch"),
        pick_last("last_raw_url").alias("last_raw_url"),
        pick_last("last_sha").alias("last_sha"))


def state_to_pages(state: DataFrame) -> DataFrame:
    """Project mergeable state to the :func:`canonical_pages` output
    shape (set sizes become the distinct counts)."""
    return state.select(
        "canonical_url", "canonical_host", "n_visits",
        F.size("variant_set").cast("long").alias("n_variants"),
        F.size("sha_set").cast("long").alias("n_revisions"),
        "first_seen_epoch", "last_seen_epoch",
        "last_raw_url", "last_sha")


def redirect_edges(visits: DataFrame) -> DataFrame:
    """Distinct canonical redirect edges from the crawl log's 3xx
    rows: both endpoints canonicalized, self-loops dropped, ONE
    deterministic target per source (min dst — a source that answered
    differently across fetches must still resolve reproducibly)."""
    redir = visits.filter(
        F.col("fetch_status").between(300, 399)
        & F.col("redirect_to").isNotNull())
    src = (with_canonical(redir)
           .select(F.col("canonical_url").alias("src"), "redirect_to"))
    both = (with_canonical(src, url_col="redirect_to")
            .select("src", F.col("canonical_url").alias("dst")))
    return (both.filter(F.col("src") != F.col("dst"))
            .groupBy("src").agg(F.min("dst").alias("dst")))


def resolve_redirects(visits: DataFrame,
                      max_hops: int = 4) -> DataFrame:
    """canonical url → ``(final_url, hops, resolved)`` after following
    the crawl's redirect edges up to ``max_hops``.

    Fixed UNROLLED left joins, not a driver loop-until-fixpoint: real
    chains are 1–3 hops (www→apex→https→destination); anything deeper
    is a cycle or misconfiguration and reports ``resolved=false``
    (the final url still has an outgoing edge). hops counts edges
    actually followed.

    Scale shape: the edge table is the 3xx slice of the log collapsed
    to one row per canonical source — orders of magnitude smaller
    than the corpus — so every hop is a broadcast join over the big
    side with zero shuffles and lineage depth fixed at ``max_hops``
    (no iteration-dependent growth, nothing to checkpoint). Drop the
    broadcast hint only for pathological redirect-heavy logs."""
    edges = redirect_edges(visits)
    out = (with_canonical(visits)
           .select(F.col("canonical_url").alias("url")).distinct()
           .select("url", F.col("url").alias("final_url"),
                   F.lit(0).alias("hops")))
    for i in range(max_hops):
        e = F.broadcast(edges.select(
            F.col("src").alias(f"_s{i}"), F.col("dst").alias(f"_d{i}")))
        step = F.col(f"_d{i}")
        out = (out.join(e, out.final_url == F.col(f"_s{i}"), "left")
               .select(out.url,
                       F.coalesce(step, out.final_url)
                        .alias("final_url"),
                       (out.hops + F.when(step.isNotNull(), 1)
                        .otherwise(0)).alias("hops")))
    probe = F.broadcast(edges.select(
        F.col("src").alias("final_url"), F.lit(True).alias("_more")))
    return (out.join(probe, "final_url", "left")
            .select("url", "final_url",
                    F.col("hops").cast("int").alias("hops"),
                    F.col("_more").isNull().alias("resolved")))


def robots_gate(df: DataFrame, robots: DataFrame,
                agent: str = "cos-crawler",
                url_col: str = "url") -> DataFrame:
    """Append ``allowed`` (RFC 9309 verdict for ``agent``) to a URL
    table: group selection (exact agent token beats ``*``), longest
    matched pattern wins, Allow wins length ties, no-match and
    no-robots default to allowed. Matching runs against the raw
    path+query (fragment stripped — it is never sent), while the host
    key is the CANONICAL host so ``WWW.X``/``x:443`` renders hit the
    same robots file.

    Scale shape: the robots table (one row per host×rule, ~10-ish per
    host) collapses to one array-struct row per host and BROADCASTS;
    the corpus side is one left broadcast join plus a pure codegen
    higher-order aggregate over the per-host rule array — zero
    shuffles of the big side, no explode (an explode×rules + groupBy
    would re-shuffle the whole corpus to reduce the match, the shape
    this operator exists to avoid)."""
    a = agent.lower()
    rule = F.struct(F.col("rule_len").alias("len"), "allow", "rx")
    grouped = (robots.filter(F.col("agent").isin(a, "*"))
               .groupBy("host")
               .agg(F.collect_list(
                        F.when(F.col("agent") == a, rule))
                    .alias("_spec"),
                    F.collect_list(
                        F.when(F.col("agent") == "*", rule))
                    .alias("_star")))
    grouped = grouped.select(
        "host",
        F.when(F.size("_spec") > 0, F.col("_spec"))
         .otherwise(F.col("_star")).alias("_rules"))

    c = with_canonical(df, url_col)
    path = F.expr(
        f"substr(regexp_replace(substring_index({url_col}, '#', 1), "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://', ''), "
        f"length(split_part(regexp_replace(substring_index({url_col},"
        f" '#', 1), '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '/', 1)) + 1)")
    c = c.withColumn("_path",
                     F.when(path == "", F.lit("/")).otherwise(path))
    joined = c.join(F.broadcast(grouped),
                    c.canonical_host == grouped.host, "left")
    verdict = F.expr("""
      aggregate(
        filter(coalesce(_rules, array()), r -> _path rlike r.rx),
        named_struct('len', -1, 'allow', true),
        (acc, r) -> IF(r.len > acc.len
                       OR (r.len = acc.len AND r.allow
                           AND NOT acc.allow),
                       named_struct('len', r.len, 'allow', r.allow),
                       acc)
      ).allow""")
    return (joined.withColumn("allowed", verdict)
            .drop("host", "_rules", "_path"))


def sitemap_frontier(sitemap_urls: DataFrame,
                     visits: DataFrame) -> DataFrame:
    """Declared-but-never-crawled pages: canonical sitemap ``loc``s
    LEFT ANTI the crawl log's canonical urls, collapsed to one row
    per frontier url with the latest declared lastmod and the
    declaration count. The discovery half of the crawl loop — what a
    scheduler enqueues next.

    Scale shape: the EXACT diff shuffles both sides on the canonical
    key (sitemap side is tiny; the visited side's distinct is one
    hash exchange with map-side partials). At 10^12 visited urls the
    documented swap is a ``bloom_filter_agg`` sketch of the visited
    keys probed map-side — trades rare false-positive drops for
    never shuffling the big side; the exact operator stays as the
    auditor, same pattern as corpus_percentiles."""
    locs = with_canonical(sitemap_urls, url_col="loc")
    seen = with_canonical(visits).select("canonical_url").distinct()
    fresh = locs.join(seen, "canonical_url", "left_anti")
    # lastmod as DATE, not string: fixed-width agg buffer keeps the
    # collapse in HashAggregate (max(string) degrades to
    # SortAggregate), and date semantics are what "latest" means
    out = (fresh.groupBy("canonical_url", "canonical_host")
           .agg(F.max(F.to_date("lastmod")).alias("_lm"),
                F.count("*").alias("n_declared")))
    # emit ISO string: engine-portable (date objects surface
    # differently across drivers), ordering already settled as DATE
    return out.select("canonical_url", "canonical_host",
                      F.col("_lm").cast("string").alias("lastmod"),
                      "n_declared")


# Bloom slot-space parameters — shared with the SQL oracle generator
# so both engines compute the identical slots.
BLOOM_WIDTH = 5   # hex digits → 16^5 ≈ 1.05M slots
BLOOM_K = 3       # hashes per url


def _bloom_pos(col, i: int, width: int):
    # md5-prefix slot: engine-portable (DuckDB computes the identical
    # string), width hex digits → 16^width slots
    return F.substring(
        F.md5(F.concat(col, F.lit(f"#{i}")).cast("binary")), 1, width)


def sitemap_frontier_bloom(sitemap_urls: DataFrame,
                           visits: DataFrame,
                           width: int = BLOOM_WIDTH,
                           k: int = BLOOM_K) -> DataFrame:
    """The 10^12-scale path of :func:`sitemap_frontier`: instead of
    shuffling every distinct visited URL (wide strings, corpus-sized
    exchange) to anti-join, the visited side collapses to its BLOOM
    POSITION SET — ``k`` md5-prefix slots per url over ``16^width``
    possible slots. The exchange is bounded by the slot space (map
    side partials collapse to ≤ 16^width rows per task no matter the
    corpus size), the position set broadcasts, and the sitemap side
    probes map-side: a url is frontier unless ALL ``k`` of its slots
    are present. False positives (a frontier url whose slots all
    collide) DROP candidates — conservative for a crawl scheduler —
    at rate ≈ (fill_ratio)^k; false negatives are impossible, so
    ``bloom ⊆ exact`` (property-tested). The construction is fully
    deterministic, so unlike a sketch it is EXACTLY oracle-checkable:
    DuckDB rebuilds the same slots and the same verdicts."""
    locs = with_canonical(sitemap_urls, url_col="loc")
    vis = with_canonical(visits).select("canonical_url")
    slots = vis.select(F.explode(F.array(*[
        _bloom_pos(F.col("canonical_url"), i, width)
        for i in range(k)])).alias("pos")).distinct()

    probe = locs
    miss = F.lit(False)
    for i in range(k):
        pi = F.broadcast(slots.select(
            F.col("pos").alias(f"_p{i}"),
            F.lit(True).alias(f"_hit{i}")))
        probe = probe.join(
            pi, _bloom_pos(F.col("canonical_url"), i, width)
            == F.col(f"_p{i}"), "left")
        miss = miss | F.col(f"_hit{i}").isNull()
    fresh = probe.filter(miss)
    out = (fresh.groupBy("canonical_url", "canonical_host")
           .agg(F.max(F.to_date("lastmod")).alias("_lm"),
                F.count("*").alias("n_declared")))
    return out.select("canonical_url", "canonical_host",
                      F.col("_lm").cast("string").alias("lastmod"),
                      "n_declared")


def domain_stats(visits: DataFrame) -> DataFrame:
    """Per registered host: fetch/error volume, distinct canonical
    pages, revisit rate, and the blocklist flag — the domain-prior
    table quality pipelines join against. One exchange (Expand for
    the exact distinct)."""
    c = with_canonical(visits)
    ok_url = F.when(F.col("fetch_status") == 200,
                    F.col("canonical_url"))
    agg = (c.groupBy("canonical_host")
            .agg(F.count("*").alias("n_fetches"),
                 F.sum(F.when(F.col("fetch_status") == 200, 1)
                       .otherwise(0)).alias("n_ok"),
                 F.sum(F.when(F.col("fetch_status") == 404, 1)
                       .otherwise(0)).alias("n_404"),
                 F.countDistinct(ok_url).alias("n_pages")))
    rate = F.col("n_ok").cast("double") / \
        F.nullif(F.col("n_pages"), F.lit(0)).cast("double")
    return (agg.withColumn("fetches_per_page", pround(rate, 6))
               .withColumn("is_blocked",
                           F.col("canonical_host").isin(*BLOCKLIST)))


# --- KMV (theta-family) sketch: cross-snapshot set operations ---------------

# K-minimum-values sketch (Beyer et al. 2007, "On synopses for
# distinct-value estimation under multiset operations" — the
# theta-sketch family): a set's sketch is its K lexicographically
# smallest distinct md5 values. HLL registers
# (relational.approx_user_cardinality) answer only |A|; KMV sketches
# compose under set OPERATIONS: merging two sketches' values and
# re-truncating to K gives the UNION's sketch, and the fraction of
# union-sketch members present in both input sketches estimates
# Jaccard — so intersection and difference ("how much NEW content did
# this crawl window bring vs the committed corpus?") fall out without
# ever shuffling the two full distinct sets against each other.
# Lexicographic order over lowercase md5 hex IS numeric order of the
# 128-bit value, the same engine-portability trick the MinHash family
# uses (no engine-specific hash, no 64-bit parsing in the hot path);
# only the Kth value is ever converted to a number, via the same
# ascii fold every other portable operator uses.
KMV_K = 256
_KMV_HEX_CHARS = 15           # 60-bit prefix: exact in BIGINT; DOUBLE
#                               rounds >2^53 identically in both engines
_KMV_SPACE = float(1 << 60)   # the prefix value space


def _kmv_hexval(col):
    """First ``_KMV_HEX_CHARS`` hex chars -> BIGINT — the 60-bit
    numeric position of the hash in its value space. Delegates to the
    shared portable Horner ascii fold so the KMV estimator and every
    other hash-prefix consumer use one definition (ADVICE r4)."""
    from .portable import hex_prefix_val

    return hex_prefix_val(col, _KMV_HEX_CHARS)


def kmv_sketch(df: DataFrame, col, k: int = KMV_K) -> DataFrame:
    """The K smallest distinct md5 values of ``col``, as ONE row
    holding the sorted array.

    Scale shape: the dedup groupBy is the only corpus-sized exchange
    (bounded by the distinct count, map-side partial — the
    exact_dedup shape), and the top-K prunes to K rows per partition
    before the single-partition tail, so the driver-side state is K
    strings regardless of corpus size. At 10^12 rows the sketch is
    what you persist per crawl snapshot; comparing two snapshots then
    touches only the two K-row sketches."""
    return (df.select(F.md5(col).alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .orderBy("h").limit(k)
            .agg(F.sort_array(F.collect_list("h")).alias("sk")))


def _kmv_estimate(sk, k: int):
    """Distinct-count estimate from a sketch array: exact (the array
    size) while the sketch absorbed the whole set, else the KMV
    estimator (K-1)/U(h_K) with U the unit-interval position of the
    Kth smallest value. The non-taken CASE branch is never evaluated,
    so the element_at stays in bounds by construction."""
    kth = _kmv_hexval(F.element_at(sk, k))
    return F.when(
        F.size(sk) < k, F.size(sk).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / kth.cast("double"))


def kmv_content_overlap(visits: DataFrame, cut_id: int,
                        k: int = KMV_K) -> DataFrame:
    """Cross-snapshot set arithmetic over crawl content: sketch the
    distinct ``content_sha`` sets of two crawl windows (fetch-ok
    visits before/after ``cut_id``; ``warc_ts`` is monotonic in
    ``visit_id``, so this is a time split), then estimate |A|, |B|,
    |A∪B|, Jaccard, |A∩B| and |B\\A| — the "how much genuinely new
    content did the new window bring" number an incremental corpus
    pipeline budgets by — purely from the two K-value sketches.

    The exact counterparts ride along as the in-plan auditor (the
    same pattern as ``approx_user_cardinality``: at 10^12 you drop
    the auditor, here it proves the estimator), plus a 4-sigma bound
    check on the union estimate (RSE of KMV ~ 1/sqrt(K-2)).

    Output (one row): (k, n_sketch_a, n_sketch_b, est_a, est_b,
    est_union, jaccard_est, est_intersection, est_new_in_b, exact_a,
    exact_b, exact_union, exact_intersection, exact_new_in_b,
    union_in_bounds). All estimates pround(6) for hash-stable
    cross-engine comparison.
    """
    ok = visits.where(F.col("fetch_status") == 200)
    a = ok.where(F.col("visit_id") < cut_id)
    b = ok.where(F.col("visit_id") >= cut_id)
    ska = kmv_sketch(a, F.col("content_sha"), k) \
        .select(F.col("sk").alias("ska"))
    skb = kmv_sketch(b, F.col("content_sha"), k) \
        .select(F.col("sk").alias("skb"))
    # exact auditor: one count-distinct pass per window + one over
    # the union (all map-side-combinable aggregates)
    ea = a.agg(F.countDistinct("content_sha").alias("exact_a"))
    eb = b.agg(F.countDistinct("content_sha").alias("exact_b"))
    eu = ok.agg(F.countDistinct("content_sha").alias("exact_union"))

    row = (ska.crossJoin(skb).crossJoin(F.broadcast(ea))
           .crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(eu)))

    merged = F.array_sort(F.array_distinct(F.concat("ska", "skb")))
    union_k = F.slice(merged, 1, k)
    ku = F.size(union_k)
    in_both = F.size(F.filter(
        union_k,
        lambda x: F.array_contains(F.col("ska"), x)
        & F.array_contains(F.col("skb"), x)))
    est_a = _kmv_estimate(F.col("ska"), k)
    est_b = _kmv_estimate(F.col("skb"), k)
    est_union = F.when(
        F.size(merged) < k, F.size(merged).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE)
        / _kmv_hexval(F.element_at(union_k, k)).cast("double"))
    jacc = in_both.cast("double") / ku.cast("double")
    est_inter = jacc * est_union
    exact_inter = (F.col("exact_a") + F.col("exact_b")
                   - F.col("exact_union"))
    # 4-sigma acceptance on the union estimate: RSE ~ 1/sqrt(K-2)
    bound = 4.0 / float((k - 2) ** 0.5)
    return row.select(
        F.lit(k).alias("k"),
        F.size("ska").alias("n_sketch_a"),
        F.size("skb").alias("n_sketch_b"),
        pround(est_a, 6).alias("est_a"),
        pround(est_b, 6).alias("est_b"),
        pround(est_union, 6).alias("est_union"),
        pround(jacc, 6).alias("jaccard_est"),
        pround(est_inter, 6).alias("est_intersection"),
        pround(est_b - est_inter, 6).alias("est_new_in_b"),
        F.col("exact_a"), F.col("exact_b"), F.col("exact_union"),
        exact_inter.alias("exact_intersection"),
        (F.col("exact_union") - F.col("exact_a"))
        .alias("exact_new_in_b"),
        (F.abs(est_union - F.col("exact_union").cast("double"))
         <= F.lit(bound) * F.col("exact_union").cast("double"))
        .alias("union_in_bounds"))
