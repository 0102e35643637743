"""Deterministic synthetic Common-Crawl-style pages (seed=42).

Input table per BASELINE.json ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Every page is a pure function of ``(seed, row_id)`` — generation is
distributed (``spark.range(n).mapInPandas``), order- and
partitioning-independent, and identical across runs, so goldens and
benchmarks never depend on external data.

Content design (exercises every kernel path, cf. FIXTURES.md §2):

* domains drawn Zipf-style so a few hot domains dominate — the skew
  the salted repartitioning must defuse;
* ~8% of rows carry a PDF payload instead of HTML (payload dispatch
  on magic bytes, cf. the reference mime whitelist
  ``src/dms/service.py:79-80``): half genuine ``%PDF-1.x`` files with
  digital-text content streams (``.pdf_write`` — mixed filter chains
  (Flate / LZW / ASCIIHex / RunLength / ASCII85+Flate / raw),
  Tm/Td/TJ operator styles, simple WinAnsi AND composite
  Identity-H/ToUnicode CID fonts, object streams, RC4-encrypted
  standard-security files (40- and 128-bit), form-XObject
  letterhead shapes, and ~12% scanned image-only documents (raster
  pages as image XObjects or inline BI…ID…EI images, under packed
  1-bit, CCITT G4, FlateDecode grey, or genuine DCTDecode JPEG,
  recognized by the from-scratch OCR in ``kernel/ocr.py``) — every
  path ``kernel/pdf_text.py`` decodes),
  half ``%PDF-GRAFT`` token layouts (the OCR-shaped path with
  per-token confidences);
* credit-request forms embed a per-page subset of the 21 configured
  fields with value variants that fire every cleaning/validation rule
  (German numbers, bad dates, out-of-range years, OCR'd ``m?`` areas,
  checkbox booleans), plus split-label fragments and 3-element rows
  that exercise the merge and pairing special cases.
"""

from __future__ import annotations

import codecs
import random
from datetime import datetime, timedelta, timezone
from typing import Any, Dict, Iterator, List

import pandas as pd

from .warc import _stable_mod as stable_mod

DEFAULT_SEED = 42

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_DOMAINS = [
    "big-portal.example", "mega-news.example", "hot-forum.example",
    "credit-bank.example", "immo-markt.example", "finanz-blog.example",
    "city-office.example", "tech-wiki.example", "shop-world.example",
    "law-docs.example",
] + [f"site-{i:03d}.example" for i in range(40)]

_COMPANIES = ["DemoTech Solutions", "Nordwind Logistik", "Alpha Immobilien",
              "Schwaben Maschinenbau", "Hanse Trading", "Rhein Energie",
              "BlueSky Ventures", "Quantum Foundry", "GrünBau", "Datenwerk"]
_LEGAL_FORMS = ["GmbH", "AG", "UG", "KG", "GmbH & Co. KG"]
_CITIES = ["Stuttgart", "Berlin", "Hamburg", "München", "Köln",
           "Frankfurt", "Dresden", "Leipzig"]
_STREETS = ["Hauptstraße", "Bahnhofstraße", "Gartenweg", "Marktplatz",
            "Industriestraße", "Schlossallee"]
_PROPERTY_TYPES = ["Office", "Commercial Building", "Residential",
                   "Warehouse", "Mixed Use"]
_PURPOSES = ["Purchase and Renovation", "New Construction", "Refinancing",
             "Expansion", "Modernization"]
_FILLER_WORDS = ("the quick market report shows strong regional demand for "
                 "commercial property while analysts expect stable rates and "
                 "careful lending standards over coming quarters with local "
                 "growth supported by infrastructure investment").split()

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _row_rng(seed: int, row_id: int) -> random.Random:
    # Avoid str hash() (PYTHONHASHSEED-dependent): pure integer mix.
    return random.Random(seed * 1_000_003 + row_id)


def _money(rng: random.Random, german: bool) -> str:
    amount = rng.randrange(50, 5000) * 1000
    s = f"{amount:,}"
    if german:
        return f"{s.replace(',', '.')} €"
    return f"€{s}"


def _field_values(rng: random.Random, german: bool) -> Dict[str, str]:
    """One value per field, with deliberate rule-violating variants."""
    company = f"{rng.choice(_COMPANIES)} {rng.choice(_LEGAL_FORMS)}"
    city = rng.choice(_CITIES)
    good_date = (f"{rng.randrange(1, 29):02d}.{rng.randrange(1, 13):02d}."
                 f"{rng.randrange(1980, 2024)}")
    bad_date = f"{rng.randrange(1980, 2024)}-{rng.randrange(1, 13):02d}-01"
    year = rng.randrange(1850, 2024)
    bad_year = rng.choice([1750, 2150])
    vat_ok = f"DE{rng.randrange(100000000, 999999999)}"
    vat_bad = f"DE{rng.randrange(1000, 99999)}"
    area = f"{rng.randrange(100, 9000):,}"
    return {
        "company_name": company,
        "legal_form": rng.choice(_LEGAL_FORMS),
        "founding_date": good_date if rng.random() > 0.12 else bad_date,
        "business_address": (f"{rng.choice(_STREETS)} "
                             f"{rng.randrange(1, 200)}, "
                             f"{rng.randrange(10000, 99999)} {city}"),
        "commercial_register": (f"HRB {rng.randrange(10000, 999999)} / "
                                f"{city} Local Court"),
        "vat_id": vat_ok if rng.random() > 0.12 else vat_bad,
        "property_type": rng.choice(_PROPERTY_TYPES),
        "property_name": f"{rng.choice(_PURPOSES).split()[0]} Center {city}",
        "property_address": (f"{rng.choice(_STREETS)} "
                             f"{rng.randrange(1, 99)}, {city}"),
        "purchase_price": _money(rng, german),
        "requested_amount": _money(rng, german),
        "purpose": rng.choice(_PURPOSES),
        "equity_share": _money(rng, german),
        "construction_year": str(year if rng.random() > 0.08 else bad_year),
        "total_area": (f"{area} m²" if rng.random() > 0.15
                       else f"{area} m?"),
        "loan_amount": _money(rng, german),
        "term": (f"{rng.randrange(5, 30)} "
                 f"{'Jahre' if german else 'years'}"
                 if rng.random() > 0.1 else "fifteen years"),
        "monthly_payment": f"{_money(rng, german)} per month",
        "interest_rate": (f"{rng.randrange(1, 9)},{rng.randrange(0, 9)}%"
                          if german
                          else f"{rng.randrange(1, 9)}.{rng.randrange(0, 9)}%"
                          ) if rng.random() > 0.1 else "None",
        "early_repayment": "[x] yes" if rng.random() > 0.5 else "[ ] no",
        "public_funding": "[x] yes" if rng.random() > 0.5 else "[ ] no",
    }


# Fields the generator sometimes renders as split fragments; the
# field config carries the matching "a / b" candidates.
_SPLITTABLE = {
    "property_name": ("Property", "Name:"),
    "commercial_register": ("Commercial", "Register:"),
    "loan_amount": ("Loan", "Amount:"),
    "equity_share": ("Equity", "Share:"),
}

_LABELS = {
    "company_name": "Company Name", "legal_form": "Legal Form",
    "founding_date": "Founding Date", "business_address": "Business Address",
    "commercial_register": "Commercial Register", "vat_id": "VAT ID",
    "property_type": "Property Type", "property_name": "Property Name",
    "property_address": "Property Address",
    "purchase_price": "Purchase Price",
    "requested_amount": "Requested Amount", "purpose": "Purpose",
    "equity_share": "Equity Share",
    "construction_year": "Construction Year", "total_area": "Total Area",
    "loan_amount": "Loan Amount", "term": "Term",
    "monthly_payment": "Monthly Payment", "interest_rate": "Interest Rate",
    "early_repayment": "Early Repayment", "public_funding": "Public Funding",
}
_ALL_FIELDS = list(_LABELS)


def _filler(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_FILLER_WORDS) for _ in range(n_words))


def _html_page(rng: random.Random, values: Dict[str, str],
               fields: List[str], title: str,
               table_form: bool = False) -> str:
    """One synthetic page. ``table_form`` renders the form section as
    a real ``<table>`` (cells instead of flex spans) — the OTHER
    markup idiom real sites use for label/value layouts. The rng draw
    sequence is identical in both modes, and the kernel's tr/td
    geometry makes extraction BYTE-IDENTICAL to the div twin
    (``tests/test_table_markup.py``), so the variant costs no golden
    churn while pinning markup robustness."""
    nav_links = "".join(
        f'<a href="/s/{i}">Section {i}</a> ' for i in range(8))
    sidebar = "".join(
        f'<li><a href="/t/{i}">{_filler(rng, 2)}</a></li>' for i in range(6))
    paras = "".join(
        f"<p>{_filler(rng, rng.randrange(12, 40))}.</p>"
        for _ in range(rng.randrange(2, 6)))
    rows = []
    for f in fields:
        val = values[f]
        if f in _SPLITTABLE and rng.random() < 0.4:
            a, b = _SPLITTABLE[f]
            if table_form:
                rows.append(f'<tr><td><span>{a}</span><span>{b}</span>'
                            f'</td><td>{val}</td></tr>')
            else:
                rows.append(f'<div class="row"><span>{a}</span>'
                            f'<span>{b}</span> <span>{val}</span></div>')
        elif table_form:
            rows.append(f'<tr><td>{_LABELS[f]}:</td>'
                        f'<td>{val}</td></tr>')
        else:
            rows.append(f'<div class="row"><span>{_LABELS[f]}:</span> '
                        f'<span>{val}</span></div>')
    comments = "".join(
        f'<div class="comment">{_filler(rng, 8)}</div>' for _ in range(3))
    return (
        "<!DOCTYPE html><html><head><title>"
        f"{title}</title><script>var x=1;</script>"
        "<style>.row{display:flex}</style></head><body>"
        f"<nav>{nav_links}</nav><header><h1>{title}</h1></header>"
        f'<div class="sidebar"><ul>{sidebar}</ul></div>'
        f"<main><h2>Credit Request — {title}</h2>{paras}"
        + (f'<section class="form"><table>{"".join(rows)}</table>'
           '</section>' if table_form
           else f'<section class="form">{"".join(rows)}</section>') +
        f"{paras}</main>{comments}"
        f"<footer><a href='/imprint'>Imprint</a> · "
        f"<a href='/privacy'>Privacy</a></footer></body></html>"
    )


def _soft404_title(url: str, title: str) -> str:
    """The <title> a soft-404 variant serves (the third variant keeps
    the page's legitimate title — the sneaky case)."""
    v = stable_mod(url + "#errv", 3)
    return ("Page not found" if v == 0
            else "404 Not Found" if v == 1 else title)


def _soft404_html(url: str, title: str) -> str:
    """A soft 404: the server answered 200 with a full-chrome page
    whose *content* is an error message — the pages crawl-status
    filtering can't catch (the HTTP envelope says ok) and content
    heuristics must. URL-hash keyed, three phrasings so the detector's
    pattern set is exercised, including the sneaky variant that keeps
    the original <title> and only the body admits the page is gone."""
    v = stable_mod(url + "#errv", 3)
    t = h1 = _soft404_title(url, title)
    if v == 0:
        body = ("<p>The page you requested does not exist or may have "
                "been moved.</p><p>Error 404. Try searching from our "
                "homepage or browse the sections above.</p>")
    elif v == 1:
        body = ("<p>Sorry, this document is no longer available.</p>"
                "<p>It may have been archived or removed by its "
                "owner.</p>")
    else:  # sneaky: original title survives, only the body admits it
        body = ("<p>Error 404: page not found.</p><p>The application "
                "record could not be located on this server.</p>")
    nav_links = "".join(
        f'<a href="/s/{i}">Section {i}</a> ' for i in range(8))
    return (
        "<!DOCTYPE html><html><head><title>"
        f"{t}</title><script>var x=1;</script>"
        "<style>.row{display:flex}</style></head><body>"
        f"<nav>{nav_links}</nav><header><h1>{h1}</h1></header>"
        f"<main>{body}</main>"
        f"<footer><a href='/imprint'>Imprint</a> · "
        f"<a href='/privacy'>Privacy</a></footer></body></html>"
    )


def _real_pdf_page(rng: random.Random, values: Dict[str, str],
                   fields: List[str], title: str,
                   link_uris: List[str] | None = None) -> bytes:
    """Genuine ``%PDF-1.4`` bytes (catalog, page tree, content
    streams) via :mod:`.pdf_write` — same form layout as the GRAFT
    variant, on the writer's ``CHAR_W`` px/char grid so the parser's
    width model reproduces the intended merge gaps."""
    from .pdf_write import CHAR_W, FONT_SIZE, build_pdf

    # scanned (image-only) draw decided first: a scan has no AcroForm
    # and no text layer, so the layout below prints every value and
    # the title lands on the raster grid (fontsize a multiple of 6).
    # DCT (JPEG) scans are kept a small-but-present share for the same
    # reason AES-256/R6 stays out of the corpus: the pure-Python JPEG
    # decode prices the codec, not the engine (natively ~10 ms at the
    # same seam); Flate scans carry the realistic OCR load.
    scan_draw = rng.random()
    scanned = ("bilevel" if scan_draw < 0.04     # packed 1-bit rows
               else "g4" if scan_draw < 0.06     # CCITT Group 4
               else "flate" if scan_draw < 0.11  # 8-bit greyscale
               else "dct" if scan_draw < 0.12 else None)

    pages: List[List] = [[]]
    annots: List[List] = [[]]

    def tok(x: float, y: float, text: str, fs: float = FONT_SIZE) -> None:
        pages[-1].append((x, y, text, fs))

    def widget(x: float, y: float, text: str) -> None:
        # filled AcroForm field: value in /V, box on the token grid
        annots[-1].append((x, y, CHAR_W * len(text), FONT_SIZE, text))

    tok(40.0, 20.0, title, 18.0 if scanned else 16.0)
    y = 60.0
    for f in fields:
        val = values[f]
        style = rng.random()
        if f in _SPLITTABLE and style < 0.35:
            a, b = _SPLITTABLE[f]
            # split label: small gap → merge path (G3) fires
            tok(40.0, y, a)
            tok(40.0 + CHAR_W * len(a) + 6.0, y, b)
            tok(280.0, y, val)
        elif style < 0.50 and " " in val:
            # 3-element row ending in a value → simple_three_element (G6)
            head, tail = val.split(" ", 1)
            tok(40.0, y, _LABELS[f] + ":")
            tok(300.0, y, head)
            tok(300.0 + CHAR_W * len(head) + 40.0, y, tail)
        elif style < 0.62:
            # filled form field: printed label, value in a /Widget
            # annotation (/V) — the AcroForm document shape. A
            # scanned form was printed before scanning: value on the
            # raster instead.
            tok(40.0, y, _LABELS[f] + ":")
            if scanned:
                tok(300.0, y, val)
            else:
                widget(300.0, y, val)
        else:
            tok(40.0, y, _LABELS[f] + ":")
            tok(300.0, y, val)
        y += 28.0
        if y > 760.0:
            y = 60.0
            pages.append([])
            annots.append([])
    if scanned is not None:
        # image-only document: raster pages (optionally inside an
        # encrypted file — scanners that password-protect output),
        # with the scanner's own artifacts: feeder tilt (vertical
        # shear from the deskew grid) and dust specks, both exactly
        # inverted by the recognizer's pre-passes
        skew = (rng.choice([i * 0.002 for i in range(-15, 16) if i])
                if rng.random() < 0.4 else 0.0)
        specks = rng.randrange(20, 90) if rng.random() < 0.4 else 0
        orient = (rng.choice((90, 180, 270))
                  if rng.random() < 0.15 else 0)
        return build_pdf(
            pages, scanned=scanned,
            scan_skew=skew, scan_specks=specks, scan_orient=orient,
            # fax-to-PDF converters embed the raster INLINE
            # (BI…ID…EI) instead of as an XObject; a sub-band of the
            # already-drawn scan_draw decides (no extra rng draw, so
            # every other corpus draw — hence every golden — is
            # unchanged; inline vs XObject is encoding-only)
            scan_inline=0.06 <= scan_draw < 0.085,
            # inverted sample mapping (/Decode [1 0]; G4 adds
            # /BlackIs1): same rendered raster, sub-bands of the
            # existing draws — also encoding-only
            scan_invert=(scan_draw < 0.012          # bilevel band
                         or 0.04 <= scan_draw < 0.048   # G4 band
                         or 0.085 <= scan_draw < 0.0975),  # flate
            encrypt=rng.choices((None, "rc4-128"),
                                weights=(85, 15))[0],
            objstm=rng.random() < 0.2)
    # post-2010 real-world PDFs are mostly CID-encoded; the corpus
    # carries the full font spread so x_extract_pages exercises
    # every text-recovery path. The weight SPLITS are deliberate:
    # the old bins were simple[0,40) cid[40,85) widths[85,100), and
    # the new variants subdivide their extraction-identical parent
    # bin (type3 ⊂ simple, ToUnicode-less ⊂ cid — equivalence pinned
    # by tests/test_real_pdf.py::test_font_packaging_equivalence
    # _property), so every prior draw outcome — hence every golden —
    # is unchanged. rng.choices consumes one uniform draw regardless
    # of the population, so downstream draws don't shift either.
    # rng consumption order must stay exactly (compress, style, font,
    # …) — argument order of the original call — or every downstream
    # draw shifts and the goldens change
    compress_draw = rng.random() < 0.5
    style_draw = rng.choice(("tm", "td", "tj"))
    fdraw = rng.choices(
        ("simple", "type3", "cid", "cid_nototu", "widths"),
        weights=(30, 10, 35, 10, 15))[0]
    return build_pdf(
        pages,
        compress=compress_draw,
        style=style_draw,
        font="cid" if fdraw == "cid_nototu" else fdraw,
        # ToUnicode-less CID: text is only recoverable through the
        # embedded TrueType's cmap (kernel/ttf.py)
        cid_tounicode=fdraw != "cid_nototu",
        # PDF >=1.5 writers pack dict objects into object streams —
        # a third of the genuine PDFs do here too
        objstm=rng.random() < 0.34,
        # real-world filter spread: mostly Flate (None → the compress
        # draw above), with a legacy/wrapper tail
        stream_filter=rng.choices(
            (None, "lzw", "ahx", "rl", "a85+flate"),
            weights=(70, 10, 6, 6, 8))[0],
        # "owner-locked, anyone can read" web PDFs: the standard
        # security handler across its RC4 generations and AESV2
        # (/V 4 crypt filters). AES-256/R6 decodes too
        # (tests/test_pdf_encrypt.py) but stays out of the generated
        # corpus: its password KDF (ISO 32000-2 Algorithm 2.B, 64+
        # chained AES-CBC/SHA rounds — deliberately expensive) costs
        # ~0.5 s/doc in pure Python, which would price the KDF, not
        # the engine, into every bench number; a production kernel
        # runs that KDF in native code at the same seam.
        encrypt=rng.choices((None, "rc4-40", "rc4-128", "aesv2"),
                            weights=(76, 6, 10, 8))[0],
        # letterhead/stamp shape: text inside a form XObject
        form_xobject=rng.random() < 0.25,
        annots=annots,
        # /Link URI annotations (first page): the PDF outlink surface.
        # stable_mod-keyed by the caller, never an rng draw — zero
        # impact on the golden-pinned draw stream
        links=[link_uris] if link_uris else None,
    )


def _pdf_page(rng: random.Random, values: Dict[str, str],
              fields: List[str], title: str) -> str:
    """%PDF-GRAFT token layout; one form row per line, 8px/char glyphs."""
    lines = ["%PDF-GRAFT 1"]

    def tok(page: int, x: float, y: float, text: str, conf: float) -> None:
        x2 = x + 8.0 * len(text)
        lines.append(f"E\t{page}\t{x}\t{y}\t{x2}\t{y + 20.0}\t{conf}\t{text}")

    tok(1, 40.0, 20.0, title, 0.97)
    y = 60.0
    page = 1
    for f in fields:
        val = values[f]
        conf = round(0.70 + rng.random() * 0.29, 2)
        vconf = round(0.70 + rng.random() * 0.29, 2)
        style = rng.random()
        if f in _SPLITTABLE and style < 0.35:
            a, b = _SPLITTABLE[f]
            # split label: small gap → merge path (G3) fires
            tok(page, 40.0, y, a, conf)
            tok(page, 40.0 + 8.0 * len(a) + 6.0, y, b, conf)
            tok(page, 280.0, y, val, vconf)
        elif style < 0.50 and " " in val:
            # 3-element row ending in a value → simple_three_element (G6)
            head, tail = val.split(" ", 1)
            tok(page, 40.0, y, _LABELS[f] + ":", conf)
            tok(page, 300.0, y, head, vconf)
            tok(page, 300.0 + 8.0 * len(head) + 40.0, y, tail, vconf)
        else:
            tok(page, 40.0, y, _LABELS[f] + ":", conf)
            tok(page, 300.0, y, val, vconf)
        y += 28.0
        if y > 800.0:
            y = 60.0
            page += 1
    return "\n".join(lines)


def _encode_html(url: str, html: str) -> bytes:
    """Encode an HTML page the way the legacy web does: most pages
    ship plain UTF-8, but a deterministic URL-keyed slice goes out as
    windows-1252 (labeled honestly, or under the classic
    ``iso-8859-1`` lie), UTF-16LE behind a BOM, or BOM'd UTF-8 — the
    spread ``kernel/charset.py`` must resolve before the DOM parse.

    Keyed on :func:`stable_mod` of the url, NOT an rng draw: the
    generator's draw stream is golden-pinned (same number and order
    of draws), and these are encoding-ONLY variants — the decoded
    text, and therefore every checked-in extraction golden, stays
    byte-identical (a ``<meta>`` in head contributes no text block).
    German pages carry umlauts/€/em-dashes, so the 1252 branches
    exercise real non-ASCII transcoding, not an ASCII no-op."""
    d = stable_mod(url + "#charset", 12)
    if d in (0, 1):
        tag = ('<meta charset="windows-1252">' if d == 0 else
               '<meta http-equiv="Content-Type" '
               'content="text/html; charset=iso-8859-1">')
        try:
            return html.replace("<head>", "<head>" + tag,
                                1).encode("cp1252")
        except UnicodeEncodeError:
            return html.encode("utf-8")  # rare non-1252 char: ship utf-8
    if d == 2:
        return codecs.BOM_UTF16_LE + html.encode("utf-16-le")
    if d == 3:
        return codecs.BOM_UTF8 + html.encode("utf-8")
    return html.encode("utf-8")


def _decorate_head(url: str, html: str) -> str:
    """Inject the indexing directives a real crawl carries: ~1/6 of
    pages declare themselves canonical, ~1/6 declare ANOTHER url
    canonical (the print/amp/mirror pattern URL-dedup must honor),
    ~1/17 are robots-noindex, ~1/3 carry an article:published_time
    (the temporal signal training-data mixing slices on). URL-hash keyed (no rng draws shift) and
    head-only (zero text blocks), so extraction text/geometry — and
    every checked-in golden — stay byte-identical."""
    tags = []
    pd_ = stable_mod(url + "#pub", 3)
    if pd_ == 0:
        h = stable_mod(url + "#pubdate", 365 * 4)
        y, doy = 2020 + h // 365, h % 365
        mo, day = 1 + doy // 31, 1 + doy % 28
        tags.append(f'<meta property="article:published_time" '
                    f'content="{y:04d}-{mo:02d}-{day:02d}'
                    f'T{h % 24:02d}:00:00Z">')
    c = stable_mod(url + "#canon", 6)
    if c == 0:
        tags.append(f'<link rel="canonical" href="{url}">')
    elif c == 1:
        tags.append('<link rel="canonical" href="'
                    + url.replace("/credit/", "/c/") + '">')
    if stable_mod(url + "#noindex", 17) == 0:
        tags.append('<meta name="robots" content="noindex, follow">')
    if not tags:
        return html
    return html.replace("<head>", "<head>" + "".join(tags), 1)


def _decorate_metas(url: str, html: str) -> str:
    """Inject the general <meta> surface real pages carry — SEO
    description, OpenGraph, twitter:card — the WAT ``Metas`` array.
    URL-hash keyed (no rng draws shift) and head-only (zero text
    blocks), so extraction text/geometry — and every checked-in
    golden — stay byte-identical. ~1/2 of pages carry a description,
    ~1/3 an og:type+og:url pair, ~1/5 a twitter:card; a page can
    draw several, in a fixed order, so multi-meta docs are common."""
    tags = []
    if stable_mod(url + "#mdesc", 2) == 0:
        n = stable_mod(url + "#mdescn", 10000)
        tags.append(f'<meta name="description" '
                    f'content="Credit application {n} overview">')
    if stable_mod(url + "#mog", 3) == 0:
        tags.append('<meta property="og:type" content="article">')
        tags.append(f'<meta property="og:url" content="{url}">')
    if stable_mod(url + "#mtw", 5) == 0:
        tags.append('<meta name="twitter:card" content="summary">')
    if not tags:
        return html
    return html.replace("<head>", "<head>" + "".join(tags), 1)


def _decorate_links(url: str, html: str) -> str:
    """Inject the cross-host outlinks a real web page carries — the
    web-graph / WAT surface. URL-hash keyed (no rng draws shift) and
    footer-resident (``<footer>`` is a stripped container: anchors
    there are graph edges but never content), so extraction
    text/geometry — and every checked-in golden — stay byte-identical.

    Shapes drawn: absolute https, protocol-relative ``//host/path``,
    tracking-parameter variants (canonicalization must collapse
    them), a page-relative href, ~1/5 ``rel=nofollow``, and ~1/11
    pages a ``<base href>`` that rebases the relative one. Target
    hosts are Zipf-ish so the host graph has the in-degree skew that
    stresses PageRank and per-host aggregation."""
    n_out = 2 + stable_mod(url + "#nlinks", 4)
    anchors = []
    for k in range(n_out):
        r = stable_mod(url + f"#ld{k}", 100)
        if r < 30:
            dst_host = _DOMAINS[0]
        elif r < 45:
            dst_host = _DOMAINS[1]
        elif r < 55:
            dst_host = _DOMAINS[2]
        elif r < 62:
            dst_host = _DOMAINS[3]
        else:
            dst_host = _DOMAINS[7 + r % 43]
        dst_id = stable_mod(url + f"#li{k}", 3000)
        path = f"/credit/{dst_id:09d}"
        shape = k % 3
        if shape == 0:
            href = f"https://{dst_host}{path}"
        elif shape == 1:
            href = f"//{dst_host}{path}"
        else:
            href = f"https://{dst_host}{path}?utm_source=feed&ref=x"
        rel = (' rel="nofollow"'
               if stable_mod(url + f"#nf{k}", 5) == 0 else "")
        anchors.append(f'<a href="{href}"{rel}>Partner {dst_id}</a>')
    anchors.append('<a href="more/info.html">More</a>')
    html = html.replace(
        "</footer>",
        f'<div class="linkbox">{" ".join(anchors)}</div></footer>', 1)
    if stable_mod(url + "#base", 11) == 0:
        html = html.replace("<head>", '<head><base href="/app/">', 1)
    return html


def gen_page(row_id: int, seed: int = DEFAULT_SEED) -> Dict[str, Any]:
    """Generate one pages-table row as a plain dict."""
    rng = _row_rng(seed, row_id)
    # Zipf-ish domain popularity: rank ~ floor(pareto) — head is hot.
    rank = min(int(rng.paretovariate(0.8)) - 1, len(_DOMAINS) - 1)
    domain = _DOMAINS[rank]
    url = f"https://{domain}/credit/{row_id:09d}"
    german = rng.random() < 0.25
    values = _field_values(rng, german)
    n_fields = rng.randrange(10, len(_ALL_FIELDS) + 1)
    fields = sorted(rng.sample(_ALL_FIELDS, n_fields),
                    key=_ALL_FIELDS.index)
    title = f"{values['company_name']} Application {row_id}"
    kind_draw = rng.random()
    if kind_draw < 0.04:
        # genuine %PDF-1.4 with digital-text content streams; /Link
        # URI annotations carry the PDF side of the outlink surface
        uris = [
            f"https://{_DOMAINS[stable_mod(url + f'#pl{k}', 8)]}"
            f"/credit/{stable_mod(url + f'#pi{k}', 3000):09d}"
            for k in range(1 + stable_mod(url + "#pn", 2))]
        payload = _real_pdf_page(rng, values, fields, title,
                                 link_uris=uris)
    elif kind_draw < 0.08:
        payload = _pdf_page(rng, values, fields, title).encode("utf-8")
    elif stable_mod(url + "#err", 30) == 0:
        # soft 404 (~1/30 of HTML pages): 200-ok chrome, error content.
        # URL-hash keyed off rows 0-31/557 so checked-in goldens stay
        # byte-identical; same head/link decorations as a real page.
        payload = _encode_html(url, _decorate_metas(
            url, _decorate_links(url, _decorate_head(
                url, _soft404_html(url, title)))))
        title = _soft404_title(url, title)  # the served <title>
    else:
        payload = _encode_html(url, _decorate_metas(
            url, _decorate_links(url, _decorate_head(
                url, _html_page(
                    rng, values, fields, title,
                    # ~1/7 of pages use real <table> form markup —
                    # url-hash keyed (rng stream identical), and the
                    # kernel's cell geometry makes extraction
                    # byte-identical to the div twin, so goldens
                    # never notice
                    table_form=stable_mod(url + "#tbl", 7) == 0)))))
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=row_id),
        "html": payload,
        "text": title,  # crude pre-extracted text; engine recomputes
        "lang": "de" if german else "en",
    }


def _gen_batches(iterator: Iterator[pd.DataFrame],
                 seed: int) -> Iterator[pd.DataFrame]:
    for batch in iterator:
        rows = [gen_page(int(i), seed) for i in batch["id"]]
        yield pd.DataFrame(rows)


def pages_df(spark, n_rows: int, seed: int = DEFAULT_SEED,
             partitions: int = 32, start: int = 0):
    """Distributed deterministic pages DataFrame (no driver-side
    data). ``start`` selects a row-id window — pages are a pure
    function of (seed, row_id), so any slice is reproducible."""
    import functools
    base = spark.range(start, start + n_rows,
                       numPartitions=partitions)
    return base.mapInPandas(
        functools.partial(_gen_batches, seed=seed), schema=PAGES_SCHEMA)


def write_pages_parquet(spark, path: str, n_rows: int,
                        seed: int = DEFAULT_SEED,
                        partitions: int = 32) -> None:
    pages_df(spark, n_rows, seed, partitions).write.mode(
        "overwrite").parquet(path)
