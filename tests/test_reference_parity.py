"""Property-based cross-validation against the reference implementation.

The reference repo's layout functions are pure Python with no external
dependencies, so we import them (read-only, never copied) and assert
our kernel produces *identical* structures on randomized element sets.
This is the strongest available evidence for the byte-identical
correctness gate: any divergence in the greedy clustering, merge
predicate, pairing rules, label cleaning, or normalization shows up as
a counterexample.

Skipped automatically if /root/reference is not present.
"""

import sys

import pytest

try:
    sys.path.insert(0, "/root/reference")
    from src.ocr.label_value_extraction import (          # type: ignore
        extract_label_value_pairs as ref_pairs,
    )
    from src.ocr.postprocess import (                     # type: ignore
        normalize_ocr_lines as ref_normalize,
    )
    from src.ocr.spatial_analysis import (                # type: ignore
        detect_lines_on_same_row as ref_rows,
        reconstruct_split_text_elements as ref_merge,
    )
    HAVE_REFERENCE = True
except Exception:  # pragma: no cover
    HAVE_REFERENCE = False

from hypothesis import given, settings, strategies as st

from credit_ocr_system_spark.kernel.layout import (
    cluster_rows,
    merge_split_fragments,
    pair_rows,
    normalize_elements,
)

pytestmark = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="reference repo not available")

# Texts that exercise every predicate branch: colons, question marks,
# slashes, currency symbols, digits, short/long, leading/trailing space.
_TEXTS = st.sampled_from([
    "Label:", "Question?", "Name", "Pro", "ab", "x",
    "Loan Amount:", "€2,000,000", "1.234,56", "DE123456789",
    "a very long piece of text that exceeds thirty chars",
    "with / slash", " padded ", "Property", "Name:", "per month",
    "[x] yes", "2,800 m²", "15 years", "short", "Really??::",
])

_COORD = st.sampled_from([0.0, 5.0, 10.0, 14.9, 15.0, 20.0, 25.0, 40.0,
                          60.0, 100.0, 104.9, 105.0, 160.0, 300.0])
_SIZE = st.sampled_from([4.0, 10.0, 19.9, 20.0, 30.0, 40.0])
_CONF = st.sampled_from([0.5, 0.7, 0.88, 0.95, 1.0])


@st.composite
def elements(draw, max_n=8):
    n = draw(st.integers(0, max_n))
    out = []
    for _ in range(n):
        x1 = draw(_COORD)
        y1 = draw(_COORD)
        w = draw(_SIZE)
        h = draw(_SIZE)
        out.append({
            "page_num": draw(st.integers(1, 2)),
            "text": draw(_TEXTS),
            "confidence": draw(_CONF),
            "bbox": {"x1": x1, "y1": y1, "x2": x1 + w, "y2": y1 + h,
                     "width": w, "height": h},
        })
    return out


@settings(max_examples=300, deadline=None)
@given(elements())
def test_row_clustering_matches_reference(els):
    ours = cluster_rows([dict(e, bbox=dict(e["bbox"])) for e in els])
    theirs = ref_rows([dict(e, bbox=dict(e["bbox"])) for e in els])
    assert ours == theirs


@settings(max_examples=300, deadline=None)
@given(elements())
def test_fragment_merge_matches_reference(els):
    # merge operates on one already-clustered row; feed raw lists too —
    # the function is defined for any element list.
    ours = merge_split_fragments(list(els))
    theirs = ref_merge(list(els))
    assert ours == theirs


@settings(max_examples=500, deadline=None)
@given(elements())
def test_pairing_matches_reference(els):
    ours = pair_rows(list(els))
    theirs = ref_pairs(list(els))
    assert ours == theirs


@settings(max_examples=300, deadline=None)
@given(elements())
def test_normalization_matches_reference(els):
    ours = normalize_elements(list(els))
    theirs = ref_normalize(list(els))
    assert ours == theirs


def test_generated_pages_match_reference_end_to_end():
    """Full-document check over the synthetic corpus (both payload kinds)."""
    from credit_ocr_system_spark.sources.pages import gen_page
    from credit_ocr_system_spark.kernel.extract import extract_document

    for i in range(60):
        page = gen_page(i)
        res = extract_document(page["url"], page["html"])
        els = res["elements"]
        assert pair_rows(els) == ref_pairs(list(els))
        assert normalize_elements(els) == ref_normalize(list(els))
