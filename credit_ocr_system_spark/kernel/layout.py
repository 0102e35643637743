"""Layout reconstruction: rows → merged fragments → label/value pairs.

Semantics replicate the reference pipeline exactly (constants and
control flow verified against ``/root/reference/src/ocr/
spatial_analysis.py:4-121``, ``label_value_extraction.py:5-139`` and
``postprocess.py:25-90``) — including its order-dependent greedy
clustering and the dead ``text_line`` branch — because the correctness
gate is byte-identical output per document.

An *element* is a dict::

    {"page_num": int, "text": str, "confidence": float,
     "bbox": {"x1","y1","x2","y2","width","height": float}}

Why this stays Python: row membership depends on which element seeded
the cluster (input order), and the fragment merge consumes *both*
elements of a merged pair before moving on — neither is a transitive
relation expressible as a Spark Window or session window. The parallel
grain is the document; within a document the scan is sequential by
construction. See SURVEY.md §2.3 G1/G3.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from typing import Any, Dict, List

Element = Dict[str, Any]

ROW_TOLERANCE = 15.0          # max |y-center| distance for same-row
ROW_REL_TOLERANCE = 0.5       # ... and < this × mean element height
# cluster_rows switches from the straight O(n²) tail scan (best
# constants on the typical tens-of-elements document — the hot path)
# to the y-sorted bisect window (O(n log n) on pathological pages)
# above this element count; both branches produce identical output
_WINDOW_THRESHOLD = 512
MERGE_MAX_GAP = 20.0          # max horizontal gap between fragments
MERGE_MIN_LEN = 3             # both fragments at least this long
MERGE_MAX_DY = 5.0            # max |y1| difference between fragments
VALUE_CHARS = "€$£¥0123456789"
_VALUE_CHAR_SET = frozenset(VALUE_CHARS)
LABEL_MAX_LEN = 30            # short left text ⇒ likely a label


def _has_value_chars(text: str) -> bool:
    # identical to any(ch in text for ch in VALUE_CHARS), C-speed
    return not _VALUE_CHAR_SET.isdisjoint(text)


def _y_center(el: Element) -> float:
    return (el["bbox"]["y1"] + el["bbox"]["y2"]) / 2


def _height(el: Element) -> float:
    return el["bbox"]["y2"] - el["bbox"]["y1"]


def _bbox_union(els: List[Element]) -> Dict[str, float]:
    box = {
        "x1": min(e["bbox"]["x1"] for e in els),
        "y1": min(e["bbox"]["y1"] for e in els),
        "x2": max(e["bbox"]["x2"] for e in els),
        "y2": max(e["bbox"]["y2"] for e in els),
    }
    box["width"] = box["x2"] - box["x1"]
    box["height"] = box["y2"] - box["y1"]
    return box


def cluster_rows(elements: List[Element],
                 tolerance: float = ROW_TOLERANCE) -> List[List[Element]]:
    """Greedy seeded row clustering (reference G1).

    Take the first not-yet-clustered element as the row seed, absorb
    every later element whose y-center lies within ``tolerance`` AND
    within half the mean height of seed+candidate, then x-sort the row.
    Output row order = seed order; membership depends on seed identity,
    so this is deliberately sequential per document.
    """
    n = len(elements)
    cys = [0.0] * n
    hs = [0.0] * n
    for i, el in enumerate(elements):
        box = el["bbox"]
        y1, y2 = box["y1"], box["y2"]
        cys[i] = (y1 + y2) / 2
        hs[i] = y2 - y1
    rows: List[List[Element]] = []
    alive = [True] * n
    if n <= _WINDOW_THRESHOLD:
        # typical documents (tens to a few hundred elements): the
        # straight tail scan has the best constants — this is the
        # extraction hot path, measured at sf0.1
        for seed_idx in range(n):
            if not alive[seed_idx]:
                continue
            alive[seed_idx] = False
            row = [elements[seed_idx]]
            seed_cy = cys[seed_idx]
            seed_h = hs[seed_idx]
            for j in range(seed_idx + 1, n):
                if not alive[j]:
                    continue
                dy = abs(seed_cy - cys[j])
                mean_h = (seed_h + hs[j]) / 2
                if dy < tolerance and dy < mean_h * ROW_REL_TOLERANCE:
                    row.append(elements[j])
                    alive[j] = False
            row.sort(key=lambda e: e["bbox"]["x1"])
            rows.append(row)
        return rows
    # Large pages: a y-sorted index. Absorption requires dy <
    # tolerance, so each seed only examines the ±tolerance window
    # around its center (bisect), not the whole tail. Output is
    # IDENTICAL to the full scan — window candidates are re-filtered
    # by the exact predicate and appended in original-index order (the
    # window is a superset of the absorbable set) — but a document
    # whose rows never collide (monotonic synthetic y) clusters in
    # O(n log n) instead of O(n²): a 25k-block crawl page would
    # otherwise burn ~30 s of executor CPU in this loop.
    order = sorted(range(n), key=cys.__getitem__)
    scys = [cys[i] for i in order]
    for seed_idx in range(n):
        if not alive[seed_idx]:
            continue
        alive[seed_idx] = False
        row = [elements[seed_idx]]
        seed_cy = cys[seed_idx]
        seed_h = hs[seed_idx]
        lo = bisect_left(scys, seed_cy - tolerance)
        hi = bisect_right(scys, seed_cy + tolerance)
        for j in sorted(order[lo:hi]):
            if j <= seed_idx or not alive[j]:
                continue
            dy = abs(seed_cy - cys[j])
            mean_h = (seed_h + hs[j]) / 2
            if dy < tolerance and dy < mean_h * ROW_REL_TOLERANCE:
                row.append(elements[j])
                alive[j] = False
        row.sort(key=lambda e: e["bbox"]["x1"])
        rows.append(row)
    return rows


def merge_split_fragments(row: List[Element]) -> List[Element]:
    """Merge obviously-split adjacent text fragments (reference G3).

    One left-to-right scan; a merge consumes both fragments (no
    chains): after merging (i, i+1) the scan resumes at i+2, so
    element i+2 can never merge into the pair. Merge predicate: gap
    < 20px, both stripped texts ≥ 3 chars, neither contains a
    currency/digit char, and |Δy1| < 5px. Merged text is
    ``"<left> / <right>"``, confidence the mean, bbox the union.
    """
    if len(row) <= 1:
        return list(row)
    out: List[Element] = []
    i = 0
    n = len(row)
    while i < n:
        cur = row[i]
        if i + 1 >= n:
            out.append(cur)
            i += 1
            continue
        nxt = row[i + 1]
        cur_text = cur["text"].strip()
        nxt_text = nxt["text"].strip()
        gap = nxt["bbox"]["x1"] - cur["bbox"]["x2"]
        mergeable = (
            gap < MERGE_MAX_GAP
            and len(cur_text) >= MERGE_MIN_LEN
            and len(nxt_text) >= MERGE_MIN_LEN
            and not _has_value_chars(cur_text)
            and not _has_value_chars(nxt_text)
            and abs(cur["bbox"]["y1"] - nxt["bbox"]["y1"]) < MERGE_MAX_DY
        )
        if not mergeable:
            out.append(cur)
            i += 1
            continue
        out.append({
            "text": f"{cur_text} / {nxt_text}",
            "confidence": (cur["confidence"] + nxt["confidence"]) / 2,
            "bbox": _bbox_union([cur, nxt]),
            "page_num": cur["page_num"],
            "original_elements": [cur, nxt],
            "type": "reconstructed",
        })
        i += 2
    return out


def _clean_label(text: str) -> str:
    # Python str.rstrip strips a *run* of the char: ":" first, then "?".
    return text.rstrip(":").rstrip("?").strip()


def _looks_like_label(text: str, el: Element) -> bool:
    """Two-element-row label heuristic (reference ``:34-40``)."""
    return (
        text.endswith(":")
        or text.endswith("?")
        or len(text) < LABEL_MAX_LEN
        or "/" in text
        or (el.get("type") == "reconstructed" and not _has_value_chars(text))
    )


def _emit_pair(left: Element, right: Element,
               left_text: str, right_text: str) -> Dict[str, Any]:
    return {
        "label": _clean_label(left_text),
        "value": right_text,
        "page": left["page_num"],
        "confidence": min(left["confidence"], right["confidence"]),
        "bounding_box": _bbox_union([left, right]),
    }


def pair_rows(elements: List[Element]) -> List[Dict[str, Any]]:
    """Label/value pairing over clustered+merged rows (reference G4-G7).

    * 2-element row: emit iff (left looks like a label OR right looks
      like a value) and right text is non-empty.
    * >2 elements: every adjacent pair (i, i+1) — overlapping emissions
      allowed — with the n-ary label predicate; additionally, exactly-3
      rows whose last element carries value chars emit one extra
      ``simple_three_element`` pair combining the first two as label.
    * 4+ rows get adjacent pairs only; no combination synthesis.
    """
    pairs: List[Dict[str, Any]] = []
    for raw_row in cluster_rows(elements):
        row = merge_split_fragments(raw_row)
        if len(row) == 2:
            left, right = row
            left_text = left["text"].strip()
            right_text = right["text"].strip()
            right_valueish = (
                _has_value_chars(right_text)
                or len(right_text) > len(left_text)
            )
            if ((_looks_like_label(left_text, left) or right_valueish)
                    and len(right_text) > 0):
                pairs.append(_emit_pair(left, right, left_text, right_text))
        elif len(row) > 2:
            for i in range(len(row) - 1):
                left, right = row[i], row[i + 1]
                left_text = left["text"].strip()
                right_text = right["text"].strip()
                adjacent_ok = (
                    left_text.endswith(":")
                    or left_text.endswith("?")
                    or "/" in left_text
                    or (left.get("type") == "reconstructed"
                        and not _has_value_chars(left_text))
                    or _has_value_chars(right_text)
                )
                if adjacent_ok and len(right_text) > 0:
                    pairs.append(
                        _emit_pair(left, right, left_text, right_text))
            if len(row) == 3:
                last_text = row[-1]["text"].strip()
                if _has_value_chars(last_text) and len(last_text) > 1:
                    label = " / ".join(e["text"].strip() for e in row[:2])
                    pairs.append({
                        "label": label,
                        "value": last_text,
                        "page": row[0]["page_num"],
                        "confidence":
                            sum(e["confidence"] for e in row) / len(row),
                        "bounding_box": _bbox_union(row),
                        "type": "simple_three_element",
                    })
    return pairs


def normalize_elements(elements: List[Element]) -> List[Dict[str, Any]]:
    """Normalize raw elements into structured items (reference G8).

    Emits one ``label_value`` item per pair. The reference also has a
    ``text_line`` branch for leftover lines, but its guard reads key
    ``bounding_box`` from lines that carry ``bbox``
    (``postprocess.py:74-76``), so the branch never fires; output is
    bug-compatibly label_value-only. We keep the guard structure so the
    parity is visible, not accidental.
    """
    lines = [
        {
            "type": "line",
            "text": el["text"],
            "page_num": el["page_num"],
            "confidence": float(el["confidence"]),
            "bbox": el["bbox"],
        }
        for el in elements
    ]
    pairs = pair_rows(lines)
    structured: List[Dict[str, Any]] = [
        {
            "type": "label_value",
            "label": p["label"],
            "value": p["value"],
            "page": p["page"],
            "confidence": p["confidence"],
            "bounding_box": p.get("bounding_box"),
        }
        for p in pairs
    ]
    used_texts = set()
    for p in pairs:
        used_texts.add(p["label"])
        used_texts.add(p["value"])
    for line in lines:
        if line["type"] != "line":
            continue
        if line.get("bounding_box") is None:
            # Always true: lines carry "bbox", not "bounding_box".
            # Reference postprocess.py:74-76 — intentionally preserved.
            continue
        cleaned = _clean_label(line["text"].strip())
        if cleaned not in used_texts:
            structured.append({
                "type": "text_line",
                "text": line["text"].strip(),
                "page": line["page_num"],
                "confidence": line.get("confidence"),
                "bounding_box": line.get("bbox"),
            })
    return structured
