"""WAT metadata output: the third leg of the WARC/WET/WAT triple.

Pins the two-implementation contract byte-for-byte: the pure-codegen
``wat_payload_col`` / ``wat_record_col`` columns and the pure-Python
``wat_payload`` / ``write_wat`` sink must emit identical bytes on
adversarial strings — control characters (Jackson uppercases the
escape hex: ``\\u001F``), literal backslash-u text (must NOT be
uppercased), raw UTF-8, null/empty field omission, and the
HTML-vs-PDF link ``path`` discriminator.
"""
import glob as _g
import json
import os
from datetime import datetime, timezone

import pytest

import credit_ocr_system_spark.sources.warc as W

LINKS_DDL = ("array<struct<link_idx:int,href:string,url:string,"
             "anchor:string,nofollow:boolean>>")
METAS_DDL = "array<struct<meta_idx:int,name:string,content:string>>"
SCHEMA = ("url string, warc_ts timestamp, doc_kind string, "
          "title string, base_href string, link_canonical string, "
          f"links {LINKS_DDL}, metas {METAS_DDL}")


def _ln(i, href, anchor, nofollow):
    return {"link_idx": i, "href": href, "url": None,
            "anchor": anchor, "nofollow": nofollow}


def _mt(i, name, content):
    return {"meta_idx": i, "name": name, "content": content}


@pytest.fixture(scope="module")
def wat_docs(spark):
    ts = datetime(2024, 5, 1, 12, 0, 0, tzinfo=timezone.utc)
    rows = [
        # plain HTML page with two links, one nofollow
        {"url": "https://ex.org/a", "warc_ts": ts, "doc_kind": "html",
         "title": "Hello", "base_href": "https://ex.org/",
         "link_canonical": "https://ex.org/a",
         "links": [_ln(0, "/x", "go x", False),
                   _ln(1, "https://spam.example/", "ad", True)],
         "metas": [_mt(0, "description", "a page"),
                   _mt(1, "og:type", ""),  # empty content kept
                   # adjacent control chars + escaped-backslash lead-in:
                   # the uppercase-parity hazards, twin-compared
                   _mt(2, "og:«title»", 'q"uote\x02\x03ctl \\\x1f')]},
        # adversarial strings: control chars, literal « text,
        # raw unicode, quotes and backslashes
        {"url": "https://ex.org/b", "warc_ts": ts, "doc_kind": "html",
         "title": "ctl\x1ftab\tq\"uote\\ lit \\u00ab «ä€»",
         "base_href": "", "link_canonical": None,
         "links": [_ln(0, "/y?a=1&b=2", "an\x01chor\nnl", None)]},
        # PDF: Annot@/URI path, no head fields, empty anchor omitted
        {"url": "https://ex.org/c.pdf", "warc_ts": ts,
         "doc_kind": "pdf", "title": None, "base_href": None,
         "link_canonical": None,
         "links": [_ln(0, "https://ex.org/ref", "", False)]},
        # no links at all (null array coalesces to [])
        {"url": "https://ex.org/d", "warc_ts": ts, "doc_kind": "html",
         "title": "Bare", "base_href": None, "link_canonical": None,
         "links": None},
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_wat_payload_col_matches_python(spark, wat_docs):
    # one contract, two implementations: the Spark to_json column and
    # the Python json.dumps twin must agree byte-for-byte
    import pyspark.sql.functions as F

    got = {r["url"]: r["p"] for r in wat_docs.select(
        "url", W.wat_payload_col().alias("p")).collect()}
    for row in wat_docs.collect():
        want = W.wat_payload(row["doc_kind"], row["title"],
                             row["base_href"], row["link_canonical"],
                             [ln.asDict() for ln in row["links"]]
                             if row["links"] is not None else None,
                             [m.asDict() for m in row["metas"]]
                             if row["metas"] is not None else None)
        assert got[row["url"]] == want, row["url"]


def test_wat_payload_escaping_pinned(spark, wat_docs):
    # the adversarial row, pinned explicitly: control escapes
    # uppercase hex, literal « text untouched, raw UTF-8
    p = W.wat_payload(
        "html", "ctl\x1ftab\tq\"uote\\ lit \\u00ab «ä€»", "", None,
        [_ln(0, "/y?a=1&b=2", "an\x01chor\nnl", None)],
        [_mt(0, "og:«title»", 'q"uote\x02ctl')])
    assert "\\u001F" in p          # Jackson-style uppercase escape
    assert "\\\\u00ab" in p        # literal text NOT uppercased
    assert "«ä€»" in p             # non-ASCII raw
    assert "\\u0001" in p
    env = json.loads(p)["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert env["Head"] == {"Title": "ctl\x1ftab\tq\"uote\\ lit "
                                    "\\u00ab «ä€»",
                           "Metas": [{"name": "og:«title»",
                                      "content": 'q"uote\x02ctl'}]}
    assert env["Links"] == [{"path": "A@/href", "url": "/y?a=1&b=2",
                             "text": "an\x01chor\nnl"}]
    assert "\\u0002" in p
    # ADJACENT control escapes: BOTH must uppercase (a lead-in-char
    # regex misses the second), and an escaped-backslash prefix must
    # not flip the parity decision
    p2 = W.wat_payload("html", "a\x1f\x1eb \\\x1f c", None, None, [])
    assert "\\u001F\\u001E" in p2
    assert "\\\\\\u001F" in p2  # literal \ then a REAL escape


def test_wat_round_trip(spark, wat_docs, tmp_path):
    # write_wat → warc_pages(types=metadata) recovers every payload
    out = str(tmp_path / "wat")
    n = W.write_wat(wat_docs.repartition(2), out)
    assert n == 4
    back = {r["url"]: r for r in
            W.warc_pages(spark, out, glob="*.warc.wat.gz",
                         types=("metadata",)).collect()}
    assert back.keys() == {r["url"] for r in wat_docs.collect()}
    for row in wat_docs.collect():
        g = back[row["url"]]
        assert g["mime"] == "application/json"
        want = W.wat_payload(row["doc_kind"], row["title"],
                             row["base_href"], row["link_canonical"],
                             [ln.asDict() for ln in row["links"]]
                             if row["links"] is not None else None,
                             [m.asDict() for m in row["metas"]]
                             if row["metas"] is not None else None)
        assert bytes(g["html"]).decode("utf-8") == want
    # PDF row carries the PDF path discriminator through the cycle
    pdf = json.loads(bytes(back["https://ex.org/c.pdf"]["html"]))
    links = pdf["Envelope"]["Payload-Metadata"]["HTML-Metadata"]["Links"]
    assert links == [{"path": "Annot@/URI", "url": "https://ex.org/ref"}]


def test_wat_record_col_matches_writer(spark, wat_docs, tmp_path):
    # the codegen record column reproduces the sink's bytes exactly
    out = str(tmp_path / "wat1")
    W.write_wat(wat_docs.coalesce(1), out)
    files = _g.glob(os.path.join(out, "*.warc.wat.gz"))
    assert len(files) == 1
    members = list(W._iter_member_bytes(open(files[0], "rb").read))
    got_cols = {r["url"]: r["rec"] for r in wat_docs.select(
        "url", W.wat_record_col().alias("rec")).collect()}
    assert len(members) == len(got_cols)
    for m in members:
        uri = [ln for ln in m.split(b"\r\n")
               if ln.startswith(b"WARC-Target-URI: ")][0]
        url = uri.split(b": ", 1)[1].decode()
        assert got_cols[url].encode("utf-8") == m, url


def test_wat_refers_to_wet_record(spark, wat_docs, tmp_path):
    # the WAT record's Refers-To is the WET/response record id
    # (md5(url) scheme) — the cross-file linkage tools rely on
    out = str(tmp_path / "wat2")
    W.write_wat(wat_docs.coalesce(1), out)
    import hashlib

    files = _g.glob(os.path.join(out, "*.warc.wat.gz"))
    members = list(W._iter_member_bytes(open(files[0], "rb").read))
    for m in members:
        hdrs = dict(ln.split(b": ", 1) for ln in
                    m.split(b"\r\n\r\n", 1)[0].split(b"\r\n")[1:] if ln)
        url = hdrs[b"WARC-Target-URI"].decode()
        ref = hashlib.md5(url.encode()).hexdigest().encode()
        assert hdrs[b"WARC-Refers-To"] == b"<urn:uuid:" + ref + b">"
        assert hdrs[b"WARC-Type"] == b"metadata"
