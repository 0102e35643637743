"""Byte-identical golden-file assertions (the correctness gate).

Every golden is the full extraction envelope for one synthetic page,
serialized exactly like the reference sink
(``json.dumps(indent=2, ensure_ascii=False)``,
``/root/reference/src/storage/storage.py:196``). The comparison is on
raw bytes — float formatting, key order, unicode, everything.
"""

import os

import pytest

from tests.make_goldens import GOLDEN_DIR, GOLDEN_ROWS, golden_for


@pytest.mark.parametrize("row_id", GOLDEN_ROWS)
def test_golden_byte_identical(row_id):
    path = os.path.join(GOLDEN_DIR, f"page_{row_id:03d}.json")
    with open(path, encoding="utf-8") as fh:
        expected = fh.read()
    assert golden_for(row_id) == expected


def test_goldens_cover_both_payload_kinds():
    kinds = set()
    for i in GOLDEN_ROWS:
        path = os.path.join(GOLDEN_DIR, f"page_{i:03d}.json")
        with open(path, encoding="utf-8") as fh:
            content = fh.read()
        kinds.add('"doc_kind": "pdf"' in content)
    assert kinds == {True, False}, "goldens must include HTML and PDF docs"
