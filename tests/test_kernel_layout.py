"""Unit tests for the layout kernel — every FIXTURES.md §2 edge case."""

from credit_ocr_system_spark.kernel.layout import (
    cluster_rows,
    merge_split_fragments,
    pair_rows,
    normalize_elements,
)


def el(text, x1=100.0, y1=200.0, x2=None, y2=None, conf=0.95, page=1):
    if x2 is None:
        x2 = x1 + 8.0 * len(text)
    if y2 is None:
        y2 = y1 + 20.0
    return {
        "page_num": page,
        "text": text,
        "confidence": conf,
        "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                 "width": x2 - x1, "height": y2 - y1},
    }


# --- row clustering (G1) ------------------------------------------------

def test_same_row_groups_and_x_sorts():
    a = el("Value", x1=300.0, y1=100.0)
    b = el("Label:", x1=40.0, y1=102.0)
    rows = cluster_rows([a, b])
    assert len(rows) == 1
    assert [e["text"] for e in rows[0]] == ["Label:", "Value"]


def test_row_boundary_at_tolerance_15_is_exclusive():
    # centers exactly 15 apart → NOT same row (strict <)
    a = el("A", y1=100.0, y2=120.0)
    b = el("B", y1=115.0, y2=135.0)
    assert len(cluster_rows([a, b])) == 2
    # just inside, and within half mean height (height 40 → 20)
    c = el("C", y1=100.0, y2=140.0)
    d = el("D", y1=114.9, y2=154.9)
    assert len(cluster_rows([c, d])) == 1


def test_row_requires_half_mean_height():
    # centers 12 apart (< 15) but mean height 20 → 0.5×20 = 10 < 12
    a = el("A", y1=100.0, y2=120.0)
    b = el("B", y1=112.0, y2=132.0)
    assert len(cluster_rows([a, b])) == 2


def test_seed_order_dependence():
    # B absorbs into A's row; C seeds its own even though B~C are close.
    a = el("A", y1=100.0, y2=120.0)    # center 110
    b = el("B", y1=108.0, y2=128.0)    # center 118 — 8 from A (absorbed)
    c = el("C", y1=116.0, y2=136.0)    # center 126 — 8 from B, 16 from A
    rows = cluster_rows([a, b, c])
    assert [[e["text"] for e in r] for r in rows] == [["A", "B"], ["C"]]


# --- fragment merging (G3) ----------------------------------------------

def merged_row(*texts_and_gaps):
    """Build a row from (text, gap_before) tuples on one baseline."""
    row, x = [], 40.0
    for text, gap in texts_and_gaps:
        x += gap
        e = el(text, x1=x)
        row.append(e)
        x = e["bbox"]["x2"]
    return row


def test_merge_happy_path():
    row = merged_row(("Property", 0.0), ("Name:", 6.0))
    out = merge_split_fragments(row)
    assert len(out) == 1
    assert out[0]["text"] == "Property / Name:"
    assert out[0]["type"] == "reconstructed"
    assert out[0]["confidence"] == 0.95


def test_merge_gap_20_is_exclusive():
    assert len(merge_split_fragments(
        merged_row(("Property", 0.0), ("Name:", 20.0)))) == 2
    assert len(merge_split_fragments(
        merged_row(("Property", 0.0), ("Name:", 19.9)))) == 1


def test_merge_requires_len_3():
    assert len(merge_split_fragments(
        merged_row(("Pr", 0.0), ("Name:", 6.0)))) == 2


def test_merge_rejects_value_chars():
    assert len(merge_split_fragments(
        merged_row(("Col9", 0.0), ("Name:", 6.0)))) == 2
    assert len(merge_split_fragments(
        merged_row(("Price", 0.0), ("€five", 6.0)))) == 2


def test_merge_rejects_dy_5():
    a = el("Property", x1=40.0, y1=100.0)
    b = el("Name:", x1=a["bbox"]["x2"] + 6.0, y1=105.0)
    assert len(merge_split_fragments([a, b])) == 2
    b2 = el("Name:", x1=a["bbox"]["x2"] + 6.0, y1=104.9)
    assert len(merge_split_fragments([a, b2])) == 1


def test_merge_skips_both_no_chains():
    # (A B) merge; C cannot chain onto the merged pair even if close.
    row = merged_row(("Alpha", 0.0), ("Beta", 6.0), ("Gamma", 6.0))
    out = merge_split_fragments(row)
    assert [e["text"] for e in out] == ["Alpha / Beta", "Gamma"]


# --- pairing (G4-G7) -----------------------------------------------------

def test_two_element_pair_colon_label():
    pairs = pair_rows(merged_row(("Loan Amount:", 0.0), ("€2,000,000", 100.0)))
    assert len(pairs) == 1
    p = pairs[0]
    assert p["label"] == "Loan Amount"
    assert p["value"] == "€2,000,000"
    assert p["confidence"] == 0.95
    assert "type" not in p


def test_label_clean_strips_colon_then_question_runs():
    # Python rstrip semantics: strip a RUN of ':' first, THEN a run of '?'
    pairs = pair_rows(merged_row(("Really??::", 0.0), ("Answer text!", 100.0)))
    assert pairs[0]["label"] == "Really"
    # reversed punctuation: ':' run isn't trailing, so it survives
    pairs = pair_rows(merged_row(("Really::??", 0.0), ("Answer text!", 100.0)))
    assert pairs[0]["label"] == "Really::"


def test_two_element_no_pair_when_not_labelish():
    # left: 30+ chars, no colon/?/slash; right: shorter, no value chars
    left = "This is a very long left text!!"
    assert len(pair_rows(merged_row((left, 0.0), ("short", 100.0)))) == 0


def test_two_element_pair_right_value_chars():
    left = "This is a very long left text!!"
    pairs = pair_rows(merged_row((left, 0.0), ("€42", 100.0)))
    assert len(pairs) == 1
    assert pairs[0]["label"] == left


def test_min_confidence_of_pair():
    a = el("Label:", x1=40.0, conf=0.7)
    b = el("Value 9", x1=300.0, conf=0.9)
    assert pair_rows([a, b])[0]["confidence"] == 0.7


def test_pair_bbox_union():
    a = el("Label:", x1=40.0)
    b = el("Val 9", x1=300.0)
    box = pair_rows([a, b])[0]["bounding_box"]
    assert box["x1"] == 40.0 and box["x2"] == b["bbox"]["x2"]
    assert box["width"] == box["x2"] - 40.0


def test_three_element_row_emits_adjacent_and_combined():
    # gaps ≥ 20 keep the three tokens unmerged; last carries a digit
    row = merged_row(("Company", 0.0), ("Name:", 40.0), ("DemoTech 42", 40.0))
    a, b, c = row
    a["confidence"], b["confidence"], c["confidence"] = 0.9, 0.8, 0.7
    pairs = pair_rows(row)
    # adjacent: (Company, Name:) fails (right has no value chars, left
    # not labelish for n>2 rule); (Name:, DemoTech 42) passes; then the
    # exactly-3 special combines the first two as the label.
    assert [p.get("type") for p in pairs] == [None, "simple_three_element"]
    assert pairs[0]["label"] == "Name" and pairs[0]["value"] == "DemoTech 42"
    assert pairs[1]["label"] == "Company / Name:"
    assert pairs[1]["value"] == "DemoTech 42"
    assert pairs[1]["confidence"] == (0.9 + 0.8 + 0.7) / 3
    assert pairs[1]["bounding_box"]["x1"] == a["bbox"]["x1"]
    assert pairs[1]["bounding_box"]["x2"] == c["bbox"]["x2"]


def test_three_element_last_must_have_value_chars():
    row = merged_row(("Term:", 0.0), ("15", 100.0), ("years", 40.0))
    pairs = pair_rows(row)
    assert [p.get("type") for p in pairs] == [None]


def test_four_element_rows_adjacent_only():
    row = merged_row(("A:", 0.0), ("1", 40.0), ("B:", 40.0), ("2", 40.0))
    pairs = pair_rows(row)
    assert all(p.get("type") is None for p in pairs)
    # overlapping emissions allowed: (A:,1) (1,B:)? no — B: has no value
    # chars and left "1" isn't labelish... but (B:,2) yes.
    labels = [p["label"] for p in pairs]
    assert labels == ["A", "B"]


def test_zero_pair_rows_produce_no_text_lines():
    # dead text_line branch: normalize emits label_value items ONLY
    items = normalize_elements([el("standalone paragraph text here")])
    assert items == []


def test_normalize_shapes():
    items = normalize_elements(
        merged_row(("VAT ID:", 0.0), ("DE123456789", 100.0)))
    assert len(items) == 1
    it = items[0]
    assert it["type"] == "label_value"
    assert set(it) == {"type", "label", "value", "page", "confidence",
                       "bounding_box"}


def test_cluster_rows_window_branch_identical():
    """The bisect-window branch (large pages) must produce output
    byte-identical to the straight tail scan on colliding geometry —
    the window is a superset of the absorbable set and candidates are
    re-filtered and appended in original order."""
    import random

    import credit_ocr_system_spark.kernel.layout as L

    for trial in range(20):
        r = random.Random(trial)
        els = []
        for i in range(r.choice([40, 300, 600])):
            y1 = float(r.randrange(0, 300))
            h = float(r.choice([8, 20, 40]))
            x = float(r.randrange(0, 800))
            els.append({"bbox": {"x1": x, "y1": y1, "x2": x + 40.0,
                                 "y2": y1 + h, "width": 40.0,
                                 "height": h},
                        "text": str(i), "confidence": 0.9,
                        "page_num": 1})
        saved = L._WINDOW_THRESHOLD
        try:
            L._WINDOW_THRESHOLD = 10 ** 9
            scan = L.cluster_rows(els)
            L._WINDOW_THRESHOLD = 0
            windowed = L.cluster_rows(els)
        finally:
            L._WINDOW_THRESHOLD = saved
        assert scan == windowed, trial
