"""Deterministic synthetic robots.txt per host (seed-free: keyed on
the host name via :func:`stable_mod`, so every process agrees).

One robots.txt file per domain of the shared corpus domain list —
empty files, full-site disallows with carve-outs, wildcard and
``$``-anchored rules, an agent-specific group that overrides ``*``,
and ignorable lines (Crawl-delay, Sitemap, comments) — every grammar
path ``kernel/robots.py`` parses. Hosts without a generated file
simply don't appear in the table: the gate's LEFT join then applies
the RFC default (allowed), which is also the real-world semantics of
a 404 robots fetch.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import pandas as pd

from .pages import _DOMAINS, stable_mod

AGENT = "cos-crawler"  # the pipeline's product token

ROBOTS_SCHEMA = ("host string, agent string, allow boolean, "
                 "pattern string, rx string, rule_len int")


def gen_robots_txt(host: str) -> bytes:
    """robots.txt bytes for one host — pure function of the name."""
    if stable_mod(host + "#robots", 10) == 0:
        return b""  # present but empty: allow everything
    lines = [f"# robots for {host}", "User-agent: *"]
    d = stable_mod(host + "#r1", 4)
    if d == 0:
        lines.append("Disallow: /credit/")
    elif d == 1:
        lines += ["Disallow: /shop/", "Disallow: /*?sort="]
    elif d == 2:
        lines += ["Disallow: /", "Allow: /news/"]
    else:
        lines.append("Disallow: /private$")
    if stable_mod(host + "#r2", 3) == 0:
        # agent-specific group: most-specific match wins over *
        lines += ["User-agent: " + AGENT,
                  "Allow: /credit/00", "Disallow: /credit/"]
    if stable_mod(host + "#r3", 4) == 0:
        lines.append("Crawl-delay: 2")  # ignorable, parser must skip
    lines.append(f"Sitemap: https://{host}/sitemap.xml")
    if stable_mod(host + "#sm2", 3) == 0:
        lines.append(f"Sitemap: https://{host}/sitemap-news.xml")
    if stable_mod(host + "#sm3", 5) == 0:
        # repeated directive: discovery must dedup, keep-first
        lines.append(f"Sitemap: https://{host}/sitemap.xml")
    return "\n".join(lines).encode("ascii")


def robots_rows(hosts: Optional[List[str]] = None
                ) -> List[Dict[str, Any]]:
    """Driver-side parse of every host's file → flat rule rows (the
    golden materializer's path; the Spark source runs the same parse
    distributed)."""
    from ..kernel.robots import parse_robots

    rows = []
    for host in (list(_DOMAINS) if hosts is None else hosts):
        for r in parse_robots(gen_robots_txt(host)):
            rows.append({"host": host, **r})
    return rows


def robots_df(spark, hosts: Optional[List[str]] = None,
              partitions: int = 4):
    """Distributed robots table: one task-batch of hosts → parsed
    rule rows. At web scale this is the parse stage downstream of a
    robots-fetch log (~10^7 hosts — still tiny next to the corpus,
    which is what makes the gate's broadcast join the right shape)."""
    import functools

    hosts = list(_DOMAINS) if hosts is None else hosts

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.robots import parse_robots

        for batch in batches:
            rows = []
            for i in batch["id"]:
                host = hosts[int(i)]
                for r in parse_robots(gen_robots_txt(host)):
                    rows.append({"host": host, **r})
            yield pd.DataFrame(
                rows, columns=["host", "agent", "allow", "pattern",
                               "rx", "rule_len"])

    base = spark.range(0, len(hosts), numPartitions=partitions)
    return base.mapInPandas(functools.partial(gen), ROBOTS_SCHEMA)


SITEMAP_DISCOVERY_SCHEMA = "host string, sm_idx int, sitemap_url string"


def robots_sitemaps_df(spark, hosts: Optional[List[str]] = None,
                       partitions: int = 4):
    """Sitemap discovery: the ``Sitemap:`` directives of every host's
    robots.txt → (host, sm_idx, sitemap_url), file order, first
    occurrence wins. This is how real crawls find the sitemap set the
    frontier diff (``operators/weburl.py::sitemap_frontier``) consumes
    — same distributed shape as :func:`robots_df` (a host-keyed parse
    stage over the robots-fetch log, corpus-independent and tiny)."""
    import functools

    hosts = list(_DOMAINS) if hosts is None else hosts

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.robots import parse_sitemaps

        for batch in batches:
            rows = []
            for i in batch["id"]:
                host = hosts[int(i)]
                for j, u in enumerate(
                        parse_sitemaps(gen_robots_txt(host))):
                    rows.append({"host": host, "sm_idx": j,
                                 "sitemap_url": u})
            yield pd.DataFrame(
                rows, columns=["host", "sm_idx", "sitemap_url"])

    base = spark.range(0, len(hosts), numPartitions=partitions)
    return base.mapInPandas(functools.partial(gen),
                            SITEMAP_DISCOVERY_SCHEMA)
