"""Regenerate golden files. Run manually ONLY when kernel semantics
intentionally change: ``python tests/make_goldens.py``.

Goldens are the byte-exact serialized extraction envelopes
(``json.dumps(indent=2, ensure_ascii=False)`` — the reference sink
format, ``src/storage/storage.py:196``) for the first N synthetic
pages (seed=42, both HTML and PDF payloads).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.extract import extract_document  # noqa: E402
from credit_ocr_system_spark.kernel.serialize import stage_envelope  # noqa: E402
from credit_ocr_system_spark.sources.pages import gen_page  # noqa: E402

N_GOLDENS = 32  # rows 0..31: includes HTML, %PDF-GRAFT and real %PDF-1.4
# picked rows beyond the prefix: 557 is the first scanned (image-only,
# FlateDecode raster) document — extraction goes through kernel/ocr.py
EXTRA_ROWS = (557,)
GOLDEN_ROWS = tuple(range(N_GOLDENS)) + EXTRA_ROWS
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")


def golden_for(row_id: int) -> str:
    page = gen_page(row_id)
    res = extract_document(page["url"], page["html"])
    payload = {
        "doc_kind": res["doc_kind"],
        "extracted_text": res["extracted_text"],
        "spans": res["spans"],
        "pairs": res["pairs"],
        "normalized": res["normalized"],
        "extracted_fields": res["extracted_fields"],
        "missing_fields": res["missing_fields"],
        "validation_results": res["validation_results"],
        "page_count": res["page_count"],
        "processing_timestamp": res["processing_timestamp"],
    }
    return stage_envelope(res["url"], payload,
                          metadata={"row_id": row_id})


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for i in GOLDEN_ROWS:
        path = os.path.join(GOLDEN_DIR, f"page_{i:03d}.json")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(golden_for(i))
    print(f"wrote {len(GOLDEN_ROWS)} goldens to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
