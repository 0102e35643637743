"""Deterministic synthetic sitemap.xml files per host + parser.

Sitemaps are the discovery side of the crawl loop (robots.txt even
points at them): a corpus pipeline diffs the urls a site DECLARES
against the urls the crawl VISITED to find frontier additions and
stale pages. Files follow the sitemaps.org 0.9 protocol: ``urlset``
files with ``<url><loc/><lastmod/></url>`` entries, and
``sitemapindex`` files pointing at child sitemaps (both grammar paths
generated and parsed).

Generation is keyed on the host name via :func:`stable_mod` (no rng,
process-stable). Each host's declared urls mix shapes the crawl log
also renders (so the frontier diff has real overlap) with
``/new/…`` urls no visit ever fetched (the genuine frontier).

The parser is deliberately simple, namespace-tolerant regex-free
``xml.etree`` work; the DuckDB oracle re-derives the PARSE itself
with regexp block extraction over the same stored XML — so the
frontier query checks both the parse and the diff logic.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional

from .pages import _DOMAINS, stable_mod

SITEMAP_FILES_SCHEMA = "host string, sitemap_url string, xml string"
SITEMAP_URLS_SCHEMA = ("host string, loc string, lastmod string, "
                       "sitemap_url string")


def _lastmod(host: str, i: int) -> str:
    h = stable_mod(f"{host}#lm{i}", 365)
    return f"2024-{1 + h % 12:02d}-{1 + h % 28:02d}"


def _url_entries(host: str, lo: int, n: int) -> List[str]:
    out = []
    for i in range(lo, lo + n):
        kind = stable_mod(f"{host}#sm{i}", 3)
        if kind == 0:
            # a url shape the crawl log also visits (7-digit page ids,
            # same sections as sources/visits.py)
            sec = ("news", "blog", "shop", "docs")[
                stable_mod(f"{host}#sec{i}", 4)]
            loc = f"https://{host}/{sec}/{i:07d}"
        else:
            loc = f"https://{host}/new/{i:05d}"  # never crawled
        lm = (f"<lastmod>{_lastmod(host, i)}</lastmod>"
              if stable_mod(f"{host}#haslm{i}", 3) else "")
        out.append(f"<url><loc>{loc}</loc>{lm}</url>")
    return out


def gen_sitemap_files(host: str) -> List[Dict[str, str]]:
    """All sitemap files one host serves: either a single urlset, or
    a sitemapindex plus two child urlsets. ~1/8 of hosts serve no
    sitemap at all (rows absent — the common case on the real web).
    """
    if stable_mod(host + "#hassm", 8) == 0:
        return []
    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    base = f"https://{host}"
    n = 8 + stable_mod(host + "#smn", 17)
    if stable_mod(host + "#smidx", 3) == 0:
        # index + children
        files = []
        kids = []
        for k in (0, 1):
            u = f"{base}/sitemap-{k}.xml"
            kids.append(f"<sitemap><loc>{u}</loc></sitemap>")
            body = "".join(_url_entries(host, k * 100, n // 2))
            files.append({
                "host": host, "sitemap_url": u,
                "xml": f'<?xml version="1.0"?><urlset {ns}>'
                       f"{body}</urlset>"})
        files.insert(0, {
            "host": host, "sitemap_url": f"{base}/sitemap.xml",
            "xml": f'<?xml version="1.0"?><sitemapindex {ns}>'
                   f'{"".join(kids)}</sitemapindex>'})
        return files
    body = "".join(_url_entries(host, 0, n))
    return [{"host": host, "sitemap_url": f"{base}/sitemap.xml",
             "xml": f'<?xml version="1.0"?><urlset {ns}>'
                    f"{body}</urlset>"}]


def parse_sitemap(xml: str) -> List[Dict[str, Any]]:
    """Entries of one sitemap file: ``{kind: url|sitemap, loc,
    lastmod}``. Namespace-tolerant (matches on the local tag name);
    malformed XML yields [] rather than raising (one broken file
    must not poison the fetch batch)."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    out = []
    for child in root:
        tag = child.tag.rsplit("}", 1)[-1]
        if tag not in ("url", "sitemap"):
            continue
        loc = lastmod = None
        for field in child:
            f = field.tag.rsplit("}", 1)[-1]
            if f == "loc":
                loc = (field.text or "").strip()
            elif f == "lastmod":
                lastmod = (field.text or "").strip() or None
        if loc:
            out.append({"kind": tag, "loc": loc, "lastmod": lastmod})
    return out


def sitemap_file_rows(hosts: Optional[List[str]] = None
                      ) -> List[Dict[str, str]]:
    """Driver-side: every host's sitemap files (golden materializer)."""
    rows = []
    for host in (list(_DOMAINS) if hosts is None else hosts):
        rows.extend(gen_sitemap_files(host))
    return rows


def sitemap_urls_df(spark, hosts: Optional[List[str]] = None,
                    partitions: int = 4):
    """Distributed parse: hosts → files → flattened PAGE urls
    (``url`` entries only; ``sitemapindex`` pointers are resolved by
    construction — the generator returns every file, so children are
    already in the scan, exactly like a fetcher that downloads what
    the index names)."""
    import functools

    import pandas as pd

    hosts = list(_DOMAINS) if hosts is None else hosts

    def gen(batches):
        for batch in batches:
            rows = []
            for i in batch["id"]:
                host = hosts[int(i)]
                for f in gen_sitemap_files(host):
                    for e in parse_sitemap(f["xml"]):
                        if e["kind"] == "url":
                            rows.append({
                                "host": host, "loc": e["loc"],
                                "lastmod": e["lastmod"],
                                "sitemap_url": f["sitemap_url"]})
            yield pd.DataFrame(
                rows, columns=["host", "loc", "lastmod",
                               "sitemap_url"])

    base = spark.range(0, len(hosts), numPartitions=partitions)
    return base.mapInPandas(functools.partial(gen),
                            SITEMAP_URLS_SCHEMA)
