"""Port of the reference's pytest extraction/normalization suite.

The reference tests (``/root/reference/tests/test_integrated_pipeline.py``,
``test_simple_workflow.py``, ``test_notebook04_workflow.py``) are
mock-heavy shape assertions around the per-document pipeline. This port
keeps their *contracts* — the canonical element fixture, the result-dict
keys, the processing-summary counts, the config parse, the error path —
but asserts them against this engine's real (unmocked) implementation,
per the north_star ("porting the repo's pytest extraction/normalization
test suite to golden-file assertions").
"""

from credit_ocr_system_spark.config.document_types import (
    CREDIT_REQUEST_FIELDS,
    EXPECTED_FIELD_NAMES,
)
from credit_ocr_system_spark.kernel.extract import (
    PROCESSING_TIMESTAMP,
    extract_document,
)
from credit_ocr_system_spark.kernel.layout import (
    normalize_elements,
    pair_rows,
)

# The canonical element fixture reused across the reference suite
# (tests/test_integrated_pipeline.py:35-52, test_simple_workflow.py:35).
CANONICAL = {
    "text": "Company Name: DemoTech Solutions GmbH",
    "bbox": {"x1": 100.0, "y1": 200.0, "x2": 300.0, "y2": 220.0,
             "width": 200.0, "height": 20.0},
    "confidence": 0.95,
    "page_num": 1,
}


def _split_canonical():
    """The canonical fixture as the two-element row it renders as."""
    label = dict(CANONICAL, text="Company Name:",
                 bbox={"x1": 100.0, "y1": 200.0, "x2": 204.0, "y2": 220.0,
                       "width": 104.0, "height": 20.0})
    value = dict(CANONICAL, text="DemoTech Solutions GmbH",
                 confidence=0.93,
                 bbox={"x1": 240.0, "y1": 200.0, "x2": 424.0, "y2": 220.0,
                       "width": 184.0, "height": 20.0})
    return [label, value]


def test_pipeline_result_contract():
    """Result-dict keys: the port of test_integrated_pipeline's
    'assert key in result' contract (doc id, normalized/original
    lines, metadata, pinned processing timestamp)."""
    html = ("<html><body><main><p>Loan Amount: "
            "<span>€500,000</span></p></main></body></html>")
    res = extract_document("doc://contract", html.encode("utf-8"))
    for key in ("url", "doc_kind", "extracted_text", "spans", "elements",
                "pairs", "normalized", "extracted_fields",
                "missing_fields", "validation_results", "page_count",
                "processing_timestamp"):
        assert key in res, key
    assert res["url"] == "doc://contract"
    # the reference pins this rather than reading the clock
    # (src/integration/pipeline.py:57,133)
    assert res["processing_timestamp"] == PROCESSING_TIMESTAMP
    assert res["processing_timestamp"] == "2024-01-01T00:00:00Z"


def test_canonical_single_element_normalizes_to_nothing():
    """One-element rows pair nothing, and the text_line branch is dead
    (postprocess.py:74-76) — normalized output must be empty, not a
    text_line item."""
    assert pair_rows([dict(CANONICAL)]) == []
    assert normalize_elements([dict(CANONICAL)]) == []


def test_canonical_two_element_row_pairs():
    items = normalize_elements(_split_canonical())
    assert len(items) == 1
    it = items[0]
    assert it["type"] == "label_value"
    assert it["label"] == "Company Name"
    assert it["value"] == "DemoTech Solutions GmbH"
    assert it["page"] == 1
    assert it["confidence"] == 0.93  # min of the pair
    box = it["bounding_box"]
    assert (box["x1"], box["x2"]) == (100.0, 424.0)


def test_processing_summary_contract(spark):
    """Port of the notebook-04 summary contract: total elements,
    normalized count, extracted fields, validation errors
    (test_notebook04_workflow.py:82-86 → orchestration.py:57-62)."""
    from credit_ocr_system_spark.operators.extraction import extract_pages
    from credit_ocr_system_spark.operators.fields_native import (
        field_config_df,
        fields_table,
    )
    from credit_ocr_system_spark.operators.metrics import (
        processing_summary,
    )
    from credit_ocr_system_spark.sources.pages import pages_df

    ext = extract_pages(pages_df(spark, 20, partitions=2))
    fields = fields_table(ext, field_config_df(spark))
    summary = processing_summary(ext, fields)
    cols = set(summary.columns)
    assert {"url", "n_elements", "n_pairs", "n_extracted_fields",
            "n_validation_errors"} <= cols
    rows = summary.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_extracted_fields"] <= len(EXPECTED_FIELD_NAMES)
        assert r["n_validation_errors"] <= r["n_extracted_fields"]


def test_error_path_yields_empty_result_not_exception():
    """Port of the orchestration FileNotFoundError path
    (test_integrated_pipeline.py:193-202): bad/missing payloads must
    not raise — they produce an empty, well-formed result (the batch
    engine marks them failed_empty in doc_status)."""
    for payload in (b"", None, b"%PDF", b"\xff\xfe\x80garbage"):
        res = extract_document("doc://bad", payload)
        assert res["elements"] == []
        assert res["pairs"] == []
        assert res["missing_fields"] == list(EXPECTED_FIELD_NAMES)


def test_document_config_parse():
    """Port of the config-parse test (test_integrated_pipeline.py:
    204-223): 21 expected fields, rule lookup per field."""
    assert len(CREDIT_REQUEST_FIELDS) == 21
    by_name = {s.name: s for s in CREDIT_REQUEST_FIELDS}
    assert by_name["vat_id"].pattern == r"^DE\d{9}$"
    assert by_name["founding_date"].pattern == r"^\d{2}\.\d{2}\.\d{4}$"
    assert by_name["construction_year"].vtype == "number"
    assert by_name["construction_year"].vmin == 1800
    assert by_name["construction_year"].vmax == 2100
    assert by_name["early_repayment"].vtype == "boolean"
    # every field resolves candidates, lowercased and non-empty
    for spec in CREDIT_REQUEST_FIELDS:
        assert spec.candidates
        assert all(c == c.lower() for c in spec.candidates)
