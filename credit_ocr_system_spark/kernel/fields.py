"""Field matching, value cleaning and rule validation.

Deterministic replacement for the reference's LLM-assisted field
extractor: the reference called Ollama and then *overrode* the LLM
output with first-match candidate-label scanning over the normalized
pairs / original lines (``/root/reference/src/llm/field_extractor.py:
206-274``). The override path is the only deterministic — and the
dominant — signal, so this engine keeps exactly that path and drops
the LLM call (SURVEY.md §2.6 U2).

Cleaning rules mirror ``field_extractor.py:21-50``; validation mirrors
``validation.py:6-94`` including its error strings, the German number
normalization (``"1.234,56"`` → ``1234.56``), and Python
``re.match`` (start-anchored) pattern semantics.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from ..config.document_types import FieldSpec

_DATE_RE = re.compile(r"^\d{2}\.\d{2}\.\d{4}$")


def _float_or_none(s: str) -> Optional[float]:
    try:
        return float(s)
    except ValueError:
        return None


def clean_value(value: Optional[str], clean_type: str) -> Any:
    """Type-directed value cleaning (reference P10-P15).

    One deliberate divergence: the reference's ``float(cleaned)`` would
    raise on multi-dot strings like German ``"3.823.000"``
    (``field_extractor.py:35`` — dead code in its production path, the
    function is only exercised from a notebook). A batch engine must
    not abort a partition on one malformed value, so unparseable
    numerics clean to ``None`` (= Spark ``try_cast``).
    """
    if not value:
        return None
    if clean_type == "string":
        return value.strip()
    if clean_type == "date":
        return value if _DATE_RE.match(value) else None
    if clean_type == "currency":
        s = value.replace("€", "").replace(" ", "").replace(",", ".")
        s = "".join(c for c in s if c.isdigit() or c == ".")
        return _float_or_none(s) if s else None
    if clean_type == "area":
        s = value.replace("m²", "").replace(" ", "")
        return _float_or_none(s) if s else None
    if clean_type == "number":
        s = "".join(c for c in value if c.isdigit())
        return int(s) if s else None
    if clean_type == "boolean":
        return "[x]" in value.lower()
    return value


def _german_to_float(value: Any) -> float:
    """``float()`` after German-format normalization; raises like float()."""
    if isinstance(value, str):
        value = value.replace(".", "").replace(",", ".")
    return float(value)


def validate_value(value: Any, spec: FieldSpec) -> Dict[str, Any]:
    """Validate one raw field value against its rules (reference P17-P20).

    Returns ``{"is_valid": bool, "errors": [str, ...]}`` with the
    reference's exact error strings.
    """
    result: Dict[str, Any] = {"is_valid": True, "errors": []}
    if spec.vtype == "number":
        try:
            _german_to_float(value)
        except (ValueError, TypeError):
            result["is_valid"] = False
            result["errors"].append("Value must be a number")
    elif spec.vtype == "boolean":
        if str(value).lower() not in ("true", "false"):
            result["is_valid"] = False
            result["errors"].append("Value must be a boolean")
    if spec.vmin is not None and spec.vtype == "number":
        try:
            if _german_to_float(value) < spec.vmin:
                result["is_valid"] = False
                result["errors"].append(
                    f"Value must be at least {spec.vmin}")
        except (ValueError, TypeError):
            pass
    if spec.vmax is not None and spec.vtype == "number":
        try:
            if _german_to_float(value) > spec.vmax:
                result["is_valid"] = False
                result["errors"].append(
                    f"Value must be at most {spec.vmax}")
        except (ValueError, TypeError):
            pass
    if spec.pattern is not None:
        if not re.match(spec.pattern, str(value)):
            result["is_valid"] = False
            result["errors"].append("Value does not match required pattern")
    return result


def match_fields(
    pairs: List[Dict[str, Any]],
    elements: List[Dict[str, Any]],
    specs: tuple,
) -> Dict[str, Any]:
    """First-match field resolution in document order (reference J1-J3).

    For each expected field, scan the normalized pairs in emission
    order and take the first whose lowercased label contains any
    candidate string (J1). If none, scan the original elements for the
    first whose text contains a candidate (J2) and use the whole line
    as the value. Fields that match nowhere are reported in
    ``missing_fields`` (J3 collapses to "missing" with no LLM).
    """
    extracted: Dict[str, Dict[str, Any]] = {}
    missing: List[str] = []
    # Each spec rescans the same pairs/elements (first-match semantics);
    # lowercase each text once, not once per spec.
    pair_labels_lc = [p["label"].lower() for p in pairs]
    element_texts_lc: Optional[List[str]] = None
    for spec in specs:
        candidates = spec.candidates
        hit = None
        # plain nested loops, not any(genexpr): this is the kernel's
        # hottest scan and generator frames cost ~2x per probe
        for idx, label_lc in enumerate(pair_labels_lc):
            for c in candidates:
                if c in label_lc:
                    p = pairs[idx]
                    hit = {
                        "value": p["value"],
                        "confidence": p.get("confidence", 0.5),
                        "bounding_box": p.get("bounding_box"),
                        "page": p.get("page"),
                        "source": "pair",
                    }
                    break
            if hit is not None:
                break
        if hit is None:
            if element_texts_lc is None:
                element_texts_lc = [el["text"].lower() for el in elements]
            for eidx, text_lc in enumerate(element_texts_lc):
                for c in candidates:
                    if c in text_lc:
                        el = elements[eidx]
                        hit = {
                            "value": el["text"],
                            "confidence": el.get("confidence", 0.5),
                            "bounding_box": el.get("bbox"),
                            "page": el.get("page_num"),
                            "source": "line",
                        }
                        break
                if hit is not None:
                    break
        if hit is None:
            missing.append(spec.name)
        else:
            extracted[spec.name] = hit

    # Reference validates every extracted field that has a rules entry;
    # all 21 fields have one (plain strings validate trivially true).
    validation = {
        spec.name: validate_value(extracted[spec.name]["value"], spec)
        for spec in specs
        if spec.name in extracted
    }
    return {
        "extracted_fields": extracted,
        "missing_fields": missing,
        "validation_results": validation,
    }
