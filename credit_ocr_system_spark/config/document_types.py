"""Document-type field schema for the ``credit_request`` document type.

Behavioural parity with the reference configuration
(``/root/reference/config/document_types.conf:1-149`` loaded via
``src/llm/config.py:15-37``): the same 21 expected fields, the same
validation rules (type / min / max / pattern, applied with Python
``re.match`` semantics per ``src/llm/validation.py:70-74``), and the
same value-cleaning type vocabulary
(``src/llm/field_extractor.py:21-50``).

The reference resolved fields with an LLM whose output was then
overridden by deterministic candidate-label matching
(``src/llm/field_extractor.py:206-262``). This engine drops the LLM
(non-deterministic external service) and matches directly: each field
declares ``candidates`` — lowercase strings tested as substrings of a
pair's label — mirroring the reference's
``any(label in line_label for label in df_field_names)`` predicate.

At scale this table is 21 rows: always the broadcast side of a join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property


@dataclass(frozen=True)
class FieldSpec:
    """One extractable field: matching candidates + clean/validate rules."""

    name: str                      # canonical snake_case field key
    label: str                     # human label (what forms print)
    clean_type: str                # string|date|currency|area|number|boolean
    vtype: str = "string"          # validation type: string|number|boolean
    vmin: float | None = None
    vmax: float | None = None
    pattern: str | None = None     # re.match-anchored validation regex
    extra_candidates: tuple[str, ...] = ()

    @cached_property
    def candidates(self) -> tuple[str, ...]:
        """Lowercased substrings that identify this field's label.

        ``cached_property`` (stores into ``__dict__``, compatible with
        frozen dataclasses): the kernel reads this once per field per
        document — recomputing it was ~4% of kernel CPU.
        """
        base = [self.name.lower(), self.name.replace("_", " ").lower(),
                self.label.lower()]
        base.extend(c.lower() for c in self.extra_candidates)
        # dedupe preserving order
        seen: set[str] = set()
        out: list[str] = []
        for c in base:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return tuple(out)


_MONEY_PAT = r"^[€C]?[0-9\.,\s]+$"

CREDIT_REQUEST_FIELDS: tuple[FieldSpec, ...] = (
    FieldSpec("company_name", "Company Name", "string"),
    FieldSpec("legal_form", "Legal Form", "string"),
    FieldSpec("founding_date", "Founding Date", "date",
              pattern=r"^\d{2}\.\d{2}\.\d{4}$",
              extra_candidates=("date of incorporation",)),
    FieldSpec("business_address", "Business Address", "string"),
    FieldSpec("commercial_register", "Commercial Register", "string",
              extra_candidates=("commercial / register",)),
    FieldSpec("vat_id", "VAT ID", "string", pattern=r"^DE\d{9}$",
              extra_candidates=("tax number",)),
    FieldSpec("property_type", "Property Type", "string"),
    FieldSpec("property_name", "Property Name", "string",
              extra_candidates=("property / name",)),
    FieldSpec("property_address", "Property Address", "string"),
    FieldSpec("purchase_price", "Purchase Price", "currency",
              pattern=_MONEY_PAT),
    FieldSpec("requested_amount", "Requested Amount", "currency",
              pattern=_MONEY_PAT,
              extra_candidates=("desired financing amount",)),
    FieldSpec("purpose", "Purpose", "string",
              extra_candidates=("purpose of use",)),
    FieldSpec("equity_share", "Equity Share", "currency",
              pattern=_MONEY_PAT,
              extra_candidates=("equity contribution", "equity / share")),
    FieldSpec("construction_year", "Construction Year", "number",
              vtype="number", vmin=1800, vmax=2100,
              extra_candidates=("year of construction",)),
    FieldSpec("total_area", "Total Area", "area",
              pattern=r"^[0-9\.,\s]+(m²|m\?)?$"),
    FieldSpec("loan_amount", "Loan Amount", "currency", pattern=_MONEY_PAT,
              extra_candidates=("desired loan amount", "loan / amount")),
    FieldSpec("term", "Term", "string",
              pattern=r"^[0-9]{1,3}(?:[\.,][0-9]{1,3})?"
                      r"(?:\s*(?:[Jj]ahre|[Yy]ears?|))?$"),
    FieldSpec("monthly_payment", "Monthly Payment", "currency",
              pattern=r"^[€C]?[0-9\.,\s]+(\s*(per month|/month))?$",
              extra_candidates=("preferred installment amount",)),
    FieldSpec("interest_rate", "Interest Rate", "string",
              pattern=r"^[0-9\.,]+%?$|^None$"),
    FieldSpec("early_repayment", "Early Repayment", "boolean",
              vtype="boolean"),
    FieldSpec("public_funding", "Public Funding", "boolean",
              vtype="boolean", extra_candidates=("public subsidies",)),
)


def field_specs() -> tuple[FieldSpec, ...]:
    return CREDIT_REQUEST_FIELDS


EXPECTED_FIELD_NAMES: tuple[str, ...] = tuple(
    f.name for f in CREDIT_REQUEST_FIELDS
)
