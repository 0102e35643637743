"""Spark extraction stage: pages table → structured extraction rows.

One Arrow-batched ``mapInPandas`` over the pages table runs the fused
per-document kernel (parse → reading order → rows → merge → pairs),
i.e. the reference's S3+S4+S5+G1-G8 chain in a single pass over each
document's bytes (SURVEY.md §3.2). Everything downstream of this stage
is native DataFrame code.

Scale notes:
* iterator form — per-executor setup is amortized across all batches
  (the reference re-initialized its OCR model per document,
  ``src/ocr/easyocr_client.py:23``; this design can't repeat that bug);
* batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (kept small — rows carry whole page payloads);
* per-row ``kernel_us`` and ``bytes_in`` feed the lineage sidecar so
  partition skew is observable, not guessed.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..kernel.extract import extract_document

_BBOX = ("struct<x1:double,y1:double,x2:double,y2:double,"
         "width:double,height:double>")

EXTRACTED_SCHEMA = (
    "url string, doc_kind string, page_count int, "
    "extracted_text string, "
    "spans array<struct<start:long,end:long,page:int>>, "
    f"elements array<struct<elem_idx:int,page_num:int,text:string,"
    f"confidence:double,bbox:{_BBOX}>>, "
    f"pairs array<struct<pair_idx:int,label:string,value:string,page:int,"
    f"confidence:double,pair_type:string,bounding_box:{_BBOX}>>, "
    "n_elements int, n_pairs int, bytes_in bigint, kernel_us bigint"
)


def _extract_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        out = []
        for url, payload in zip(batch["url"], batch["html"]):
            t0 = time.perf_counter_ns()
            res = extract_document(url, payload)
            elapsed_us = (time.perf_counter_ns() - t0) // 1000
            elements = [
                {"elem_idx": i, "page_num": e["page_num"], "text": e["text"],
                 "confidence": e["confidence"], "bbox": e["bbox"]}
                for i, e in enumerate(res["elements"])
            ]
            pairs = [
                {"pair_idx": i, "label": p["label"], "value": p["value"],
                 "page": p["page"], "confidence": p["confidence"],
                 "pair_type": p.get("type"),
                 "bounding_box": p["bounding_box"]}
                for i, p in enumerate(res["pairs"])
            ]
            out.append({
                "url": url,
                "doc_kind": res["doc_kind"],
                "page_count": res["page_count"],
                "extracted_text": res["extracted_text"],
                "spans": res["spans"],
                "elements": elements,
                "pairs": pairs,
                "n_elements": len(elements),
                "n_pairs": len(pairs),
                "bytes_in": len(payload) if payload is not None else 0,
                "kernel_us": elapsed_us,
            })
        yield pd.DataFrame(out)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extraction rows.

    Column pruning: only ``url`` and ``html`` cross the Arrow boundary
    — selecting first lets Parquet/Iceberg drop the other columns at
    the scan.
    """
    return pages.select("url", "html").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA)
