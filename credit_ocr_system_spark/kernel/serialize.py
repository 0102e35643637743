"""Golden-file serialization — byte-stable JSON.

The reference persists every stage as
``json.dumps(payload, indent=2, ensure_ascii=False)`` inside an
envelope ``{document_uuid, timestamp, data, metadata}``
(``/root/reference/src/storage/storage.py:189-196``). Goldens must be
byte-identical, so serialization goes through this module only — never
through Spark's ``to_json`` (different float formatting and key order).

The envelope timestamp is the pinned processing timestamp: the
reference's wall-clock value is explicitly excluded from comparison
(SURVEY.md §7.3), and a pure batch engine must not read the clock in
the data path.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from .extract import PROCESSING_TIMESTAMP


def stage_json(data: Any) -> str:
    """Serialize a stage payload exactly like the reference sink."""
    return json.dumps(data, indent=2, ensure_ascii=False)


def stage_envelope(url: str, data: Any,
                   metadata: Optional[Dict[str, Any]] = None) -> str:
    envelope = {
        "document_uuid": url,
        "timestamp": PROCESSING_TIMESTAMP,
        "data": data,
        "metadata": metadata or {},
    }
    return stage_json(envelope)
