"""Fuzzy decontamination: paraphrase-level benchmark leakage is
caught by MinHash candidates + exact shingle-Jaccard verify, where
the exact n-gram pass alone would need a long verbatim run.

Deterministic corpus, so assertions are exact.
"""

import pytest

from credit_ocr_system_spark.operators.textops import (
    fuzzy_decontaminate,
)


@pytest.fixture(scope="module")
def contam_docs(spark):
    bench = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliett kilo lima mike november oscar papa quebec romeo "
             "sierra tango")
    # doc 30: one word swapped mid-sentence — shingle Jaccard 15/21 ≈
    # 0.714, but the longest verbatim token run is 3 (< the 8-gram
    # exact-decontamination window)
    leaked = bench.replace("delta", "zulu")
    rows = [
        (0, bench, "s"),
        (1, "one two three four five six seven eight nine ten", "s"),
        (30, leaked, "s"),
        (31, "totally unrelated text about weather and trains today",
         "s"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_fuzzy_flags_paraphrase_and_spares_unrelated(contam_docs):
    out = {r["doc_id"]: r
           for r in fuzzy_decontaminate(contam_docs, n_bench=2).collect()}
    assert len(out) == 4                      # every document reported
    # bench members self-match at exactly 1.0 (positive control)
    assert out[0]["is_contaminated"] and out[0]["max_jaccard"] == 1.0
    assert out[1]["is_contaminated"] and out[1]["max_jaccard"] == 1.0
    # the one-word paraphrase is caught...
    assert out[30]["is_contaminated"]
    assert 0.5 <= out[30]["max_jaccard"] < 1.0
    # ...and the unrelated doc is clean, reported with zeros
    assert not out[31]["is_contaminated"]
    assert out[31]["n_bench_matches"] == 0
    assert out[31]["max_jaccard"] == 0.0
