"""KMV (theta-family) sketch set operations — property tests.

The oracle parity test (`test_oracle_parity`) already pins the full
expression tree against DuckDB; these tests pin the *estimator
semantics* against an independent pure-Python KMV implementation and
the algebraic laws the sketch family promises (merge law, exact
regime, error bounds).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.operators.weburl import (
    KMV_K,
    _KMV_HEX_CHARS,
    _KMV_SPACE,
    kmv_content_overlap,
    kmv_sketch,
)


def _py_kmv(values, k=KMV_K):
    """Independent reference: K smallest distinct md5 hex values."""
    return sorted({hashlib.md5(v.encode()).hexdigest()
                   for v in values})[:k]


def _py_estimate(sk, k=KMV_K):
    if len(sk) < k:
        return float(len(sk))
    kth = int(sk[k - 1][:_KMV_HEX_CHARS], 16)
    return float(k - 1) * _KMV_SPACE / float(kth)


@pytest.fixture(scope="module")
def visits(spark):
    from credit_ocr_system_spark.sources.visits import visits_df

    return visits_df(spark, 20_000, partitions=8).cache()


def test_sketch_matches_pure_python(spark, visits):
    ok = visits.where(F.col("fetch_status") == 200)
    got = kmv_sketch(ok, F.col("content_sha")).collect()[0]["sk"]
    want = _py_kmv(r["content_sha"] for r in
                   ok.select("content_sha").collect())
    assert got == want


def test_merge_law_union_sketch(visits):
    """sketch(A) merged with sketch(B), re-truncated to K, equals
    sketch(A ∪ B) — the property that makes per-snapshot sketches
    composable without re-reading the corpus."""
    rows = [r.asDict() for r in visits.where(
        F.col("fetch_status") == 200).collect()]
    a = [r["content_sha"] for r in rows if r["visit_id"] < 10_000]
    b = [r["content_sha"] for r in rows if r["visit_id"] >= 10_000]
    merged = sorted(set(_py_kmv(a)) | set(_py_kmv(b)))[:KMV_K]
    assert merged == _py_kmv(a + b)


def test_overlap_estimates_and_bounds(visits):
    row = kmv_content_overlap(visits, 10_000).collect()[0].asDict()
    rows = [r.asDict() for r in visits.where(
        F.col("fetch_status") == 200).collect()]
    a = {r["content_sha"] for r in rows if r["visit_id"] < 10_000}
    b = {r["content_sha"] for r in rows if r["visit_id"] >= 10_000}
    assert row["exact_a"] == len(a)
    assert row["exact_b"] == len(b)
    assert row["exact_union"] == len(a | b)
    assert row["exact_intersection"] == len(a & b)
    assert row["exact_new_in_b"] == len(b - a)
    # estimator vs the independent reference (same formula, different
    # code path end to end)
    est_a = _py_estimate(_py_kmv(a))
    assert row["est_a"] == pytest.approx(est_a, rel=1e-9)
    # 4-sigma acceptance holds on every headline estimate for this
    # (fixed, seeded) corpus
    bound = 4.0 / (KMV_K - 2) ** 0.5
    for est, exact in (("est_a", "exact_a"), ("est_b", "exact_b"),
                       ("est_union", "exact_union")):
        assert abs(row[est] - row[exact]) <= bound * row[exact], est
    assert row["union_in_bounds"] is True
    # intersection/difference: sketch-of-sketches estimates carry
    # roughly J^-1-amplified error; 4-sigma on the union base is the
    # published guidance and holds comfortably here
    assert abs(row["est_intersection"] - row["exact_intersection"]) \
        <= bound * row["exact_union"]
    assert abs(row["est_new_in_b"] - row["exact_new_in_b"]) \
        <= 2 * bound * row["exact_union"]


def test_exact_regime_small_set(spark):
    """A set smaller than K is absorbed whole: the sketch IS the set
    and every estimate is exact."""
    from credit_ocr_system_spark.sources.visits import visits_df

    v = visits_df(spark, 300, partitions=2)
    row = kmv_content_overlap(v, 150).collect()[0].asDict()
    assert row["n_sketch_a"] < KMV_K and row["n_sketch_b"] < KMV_K
    assert row["est_a"] == float(row["exact_a"])
    assert row["est_b"] == float(row["exact_b"])
    assert row["est_union"] == float(row["exact_union"])
    assert row["est_intersection"] == \
        pytest.approx(row["exact_intersection"], abs=1e-6)
