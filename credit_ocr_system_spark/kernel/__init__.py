"""Pure-Python deterministic extraction kernel.

Zero Spark imports. These functions define the engine's semantics and
its golden files; the Spark stage (`operators/extraction.py`) runs them
inside an Arrow-batched ``mapInPandas`` UDF, one document at a time,
vectorized over the batch from Spark's point of view.
"""

from .layout import (
    cluster_rows,
    merge_split_fragments,
    pair_rows,
    normalize_elements,
)
from .extract import extract_document
from .fields import match_fields, clean_value, validate_value

__all__ = [
    "cluster_rows",
    "merge_split_fragments",
    "pair_rows",
    "normalize_elements",
    "extract_document",
    "match_fields",
    "clean_value",
    "validate_value",
]
