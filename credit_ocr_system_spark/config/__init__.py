from .document_types import FieldSpec, CREDIT_REQUEST_FIELDS, field_specs

__all__ = ["FieldSpec", "CREDIT_REQUEST_FIELDS", "field_specs"]
