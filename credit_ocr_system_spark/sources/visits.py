"""Deterministic synthetic crawl-log visits (seed=42).

A Common-Crawl-style *fetch log*: one row per fetch attempt, many
fetches per logical page, and the URL rendered differently on every
visit — the raw material for URL canonicalization and revisit dedup
(``operators/weburl.py``). This is the stage a web corpus passes
through BEFORE content dedup: 10^12 fetch records collapse to the
latest snapshot of each canonical page, so the canonicalize +
latest-per-key shape has to be right at full scale (one hash exchange
on the canonical key, reused by both the window and the aggregate —
plan-guarded in ``tests/test_weburl.py``).

Schema: ``(visit_id bigint, url string, warc_ts timestamp,
fetch_status int, content_sha string)``.

Every row is a pure function of ``(seed, visit_id)`` — generation is
distributed (``spark.range(n).mapInPandas``), order- and
partitioning-independent, identical across runs. Two independent
draws per row keep page identity and visit mess separable:

* **page identity** (keyed on ``page_id = visit_rng.randrange(pool)``
  where ``pool ≈ 0.55·n`` — the birthday collisions ARE the
  revisits): host drawn Zipf-style from the shared domain list (hot
  domains dominate, same skew story as ``pages.py``), a section path
  ``/{section}/{page_id:07d}``, and 0–2 *content* query params in a
  page-fixed order. Everything that defines the canonical URL comes
  only from the page draw.
* **visit mess** (keyed on ``visit_id``): the renderings a crawler
  actually sees — UPPERCASED or ``www.``-prefixed host, uppercase
  scheme, an explicit ``:443`` default port, ``index.html`` or a
  trailing slash tacked onto the path, tracking params
  (``utm_*``/``fbclid``/``gclid``/``ref``) shuffled in among the
  content params, and a ``#fragment``. None of these change the page
  a canonicalizer should recover.

``warc_ts = epoch + 13·visit_id`` seconds is strictly increasing, so
"latest visit" is unambiguous; ``content_sha`` hashes
``(page_id, rev)`` with a small per-visit revision draw, so a page's
revisits sometimes (not always) carry changed content — the signal
``revisit`` change-rate operators aggregate. ~6% of fetches are 404s
the operators must drop.

Reference scope note: the reference service ingests one upload at a
time (``/root/reference/src/dms/service.py``) and has no crawl-log
notion; this table exists for the training-data-pipeline operator
family the builder brief adds on top (URL dedup is the first stage of
every published web-corpus pipeline, cf. C4 / RefinedWeb).
"""

from __future__ import annotations

import functools
import hashlib
import random
from datetime import timedelta
from typing import Any, Dict, Iterator

import pandas as pd

from .pages import _DOMAINS, _EPOCH, _row_rng, stable_mod

DEFAULT_SEED = 42

VISITS_SCHEMA = ("visit_id bigint, url string, warc_ts timestamp, "
                 "fetch_status int, content_sha string, "
                 "redirect_to string")

_SECTIONS = ("news", "blog", "shop", "docs")
_CONTENT_PARAMS = (("lang", ("en", "de")), ("sort", ("asc", "desc")),
                   ("page", ("1", "2", "3")))
_TRACKING = (("utm_source", ("tw", "fb", "nl")),
             ("utm_medium", ("social", "email")),
             ("utm_campaign", ("spring", "launch")),
             ("fbclid", ("a1b2", "c3d4")),
             ("gclid", ("x9y8", "z7w6")),
             ("ref", ("home", "sidebar")))
_FRAGMENTS = ("top", "sec1", "comments")


def _page_rng(seed: int, page_id: int) -> random.Random:
    # distinct stream from the visit rng: same integer-mix discipline
    # as pages._row_rng, offset so page_id=k never aliases visit_id=k
    return random.Random(seed * 1_000_003 + 0x5DEECE66D + page_id)


def _page_identity(seed: int, page_id: int) -> Dict[str, Any]:
    rng = _page_rng(seed, page_id)
    rank = min(int(rng.paretovariate(0.8)) - 1, len(_DOMAINS) - 1)
    host = _DOMAINS[rank]
    section = rng.choice(_SECTIONS)
    path = f"/{section}/{page_id:07d}"
    params = []
    if rng.random() < 0.30:
        for key, vals in rng.sample(_CONTENT_PARAMS,
                                    rng.randrange(1, 3)):
            params.append((key, rng.choice(vals)))
    return {"host": host, "path": path, "params": params}


def _page_redirects(seed: int, page_id: int) -> bool:
    """~1/9 of logical pages are server-level redirects — keyed on
    the PAGE (every fetch of it agrees), via :func:`stable_mod` so no
    rng draw shifts and the decision is process-stable."""
    return stable_mod(f"{seed}:redir:{page_id}", 9) == 0


def _redirect_target(seed: int, page_id: int, pool: int) -> str:
    """The canonical URL the page 301s to: another page's identity
    rendered canonically (sorted content params, no mess). Targets
    are themselves pages, so ~1/9 of targets redirect again — real
    chains (and the odd cycle) arise naturally and the resolver has
    something honest to bound."""
    tp = (page_id * 31 + 7) % pool
    ident = _page_identity(seed, tp)
    q = "&".join(sorted(f"{k}={v}" for k, v in ident["params"]))
    return (f"https://{ident['host']}{ident['path']}"
            + (f"?{q}" if q else ""))


def gen_visit(visit_id: int, seed: int = DEFAULT_SEED,
              n_pages: int = 1) -> Dict[str, Any]:
    """Generate one crawl-log row as a plain dict (pure function)."""
    rng = _row_rng(seed, visit_id)
    page_id = rng.randrange(n_pages)
    ident = _page_identity(seed, page_id)

    host = ident["host"]
    hd = rng.random()
    if hd < 0.20:
        host = host.upper()
    elif hd < 0.40:
        host = "www." + host
    scheme = "HTTPS" if rng.random() < 0.15 else "https"
    port = ":443" if rng.random() < 0.20 else ""
    path = ident["path"]
    pd_ = rng.random()
    if pd_ < 0.20:
        path += "/index.html"
    elif pd_ < 0.35:
        path += "/"
    params = list(ident["params"])
    if rng.random() < 0.40:
        for key, vals in rng.sample(_TRACKING, rng.randrange(1, 4)):
            params.append((key, rng.choice(vals)))
    rng.shuffle(params)
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = "#" + rng.choice(_FRAGMENTS) if rng.random() < 0.25 else ""
    url = (f"{scheme}://{host}{port}{path}"
           + (f"?{query}" if query else "") + frag)

    rev = rng.choice((0, 0, 0, 1, 1, 2))
    sha = hashlib.md5(f"{page_id}:{rev}".encode()).hexdigest()
    status = 404 if rng.random() < 0.06 else 200
    redirect_to = None
    if _page_redirects(seed, page_id):
        # server-level: overrides the per-fetch 404 draw (the draws
        # above still happen, so the rng stream is unchanged)
        status = 301
        sha = hashlib.md5(f"{page_id}:redirect".encode()).hexdigest()
        redirect_to = _redirect_target(seed, page_id, n_pages)
    return {
        "visit_id": visit_id,
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=13 * visit_id),
        "fetch_status": status,
        "content_sha": sha,
        "redirect_to": redirect_to,
    }


def _gen_batches(iterator: Iterator[pd.DataFrame], seed: int,
                 n_pages: int) -> Iterator[pd.DataFrame]:
    for batch in iterator:
        rows = [gen_visit(int(i), seed, n_pages) for i in batch["id"]]
        yield pd.DataFrame(rows)


def visit_pool(n_rows: int) -> int:
    """Logical-page pool for an n-row log: ~0.55·n so the average
    page gets ~1.8 fetches (some 1, hot draws 5+) — enough revisit
    mass to exercise latest-per-key without degenerating."""
    return max(1, (n_rows * 11) // 20)


def visits_df(spark, n_rows: int, seed: int = DEFAULT_SEED,
              partitions: int = 32):
    """Distributed deterministic crawl-log DataFrame (no driver-side
    data)."""
    base = spark.range(0, n_rows, numPartitions=partitions)
    return base.mapInPandas(
        functools.partial(_gen_batches, seed=seed,
                          n_pages=visit_pool(n_rows)),
        schema=VISITS_SCHEMA)
