"""A-ES weighted sampling — distribution + determinism properties.

Oracle parity (test_oracle_parity) pins the expression tree against
DuckDB; these tests pin the *sampling semantics*: weight-proportional
inclusion, equivalence to an independent pure-Python A-ES, and the
top-K plan shape.
"""

import hashlib
import math

import pytest

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators.textops import (
    _WS_HEX_CHARS,
    _WS_SPACE,
    weighted_sample,
)


def _py_key(doc_id: int, n_chars: int) -> float:
    h = hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()
    v = int(h[:_WS_HEX_CHARS], 16)
    u = float(v + 1) / _WS_SPACE
    x = math.log(u) / float(n_chars + 1)
    return math.floor(x * 1e9 + 0.5) / 1e9


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars").cache()


def test_matches_pure_python_aes(docs):
    """The Spark sample equals an independent pure-Python A-ES run
    over the same corpus (same draw, key, snap, tie-break)."""
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.collect()]
    k = min(100, len(rows))
    want = sorted(
        ((_py_key(d, n), d, n) for d, n in rows),
        key=lambda t: (-t[0], t[1]))[:k]
    got = weighted_sample(docs, k=k).collect()
    assert [(r["es_key"], r["doc_id"], r["n_chars"]) for r in got] \
        == want


def test_heavy_documents_are_overrepresented(spark):
    """Inclusion probability is weight-proportional. On a synthetic
    corpus where 10% of docs carry 20x the weight of the rest, a 10%
    A-ES sample must be dominated by heavy docs (expected heavy share
    ~69% under exact proportionality; uniform sampling would give
    10%). The corpus's own n_chars spread (±30% around its mean) is
    too flat to separate the hypotheses, hence the synthetic one."""
    n = 2_000
    rows = [(i, 2_000 if i % 10 == 0 else 100) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_chars int")
    k = n // 10
    got = weighted_sample(df, k=k).collect()
    heavy = sum(1 for r in got if r["n_chars"] == 2_000)
    assert heavy / k > 0.5          # uniform would put this at ~0.1
    # and the light class still appears: it's weighted, not a cutoff
    assert heavy < k


def test_plan_is_map_side_take_ordered(docs):
    """No corpus-sized shuffle: the key is map-side and the rank is
    a TakeOrderedAndProject."""
    import contextlib
    import io

    df = weighted_sample(docs, k=50)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(" not in plan
    assert "SortMergeJoin" not in plan
