"""Approx-percentile scale path vs the exact auditor.

``approx_corpus_percentiles`` is the 10^12-row shape (mergeable
sketch, one aggregation pass, no per-group sort); the exact
``corpus_percentiles`` is the auditor. These tests pin (a) the
rank-error guarantee the in-plan ``within_bound`` audit asserts, (b)
the measured rank error against the exact order statistics, and (c)
the plan shape that makes it the scale path.
"""

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators.textops import (
    PERCENTILE_PS,
    approx_corpus_percentiles,
    corpus_percentiles,
)


def _docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents")


@pytest.mark.parametrize("accuracy", [100, 1000, 10000])
def test_within_bound_holds_at_all_accuracies(spark, sf_dir, accuracy):
    out = approx_corpus_percentiles(
        _docs(spark, sf_dir), accuracy=accuracy).collect()
    assert len(out) > 0
    assert all(r.within_bound for r in out)


def test_rank_error_is_within_guarantee(spark, sf_dir):
    """Measured rank error of the sketch value vs the EXACT order
    statistics: the value's rank interval must sit within n/accuracy
    (+1 rounding slack) of the target rank p·n."""
    accuracy = 1000
    docs = _docs(spark, sf_dir)
    by_lang = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r.lang, []).append(int(r.n_chars))
    for vals in by_lang.values():
        vals.sort()
    out = approx_corpus_percentiles(docs, accuracy=accuracy).collect()
    for r in out:
        vals = by_lang[r.lang]
        n = len(vals)
        assert r.n_docs == n
        cnt_lt = sum(1 for v in vals if v < r.approx_value)
        cnt_le = sum(1 for v in vals if v <= r.approx_value)
        target = r.p * n
        tol = n / accuracy + 1
        # rank interval [cnt_lt+1, cnt_le] intersects target ± tol
        assert cnt_lt + 1 <= target + tol
        assert cnt_le >= target - tol


def test_approx_tracks_exact_values(spark, sf_dir):
    """Sanity in value space: at accuracy 10000 on ~500-row groups the
    sketch is exact up to interpolation — each approx value lies
    between the exact percentile's two adjacent order statistics."""
    docs = _docs(spark, sf_dir)
    exact = {(r.lang, r.p): r.value
             for r in corpus_percentiles(docs).collect()}
    approx = {(r.lang, r.p): r.approx_value
              for r in approx_corpus_percentiles(
                  docs, accuracy=10000).collect()}
    assert set(exact) == set(approx)
    for key, ev in exact.items():
        av = approx[key]
        # the exact value interpolates between two adjacent order
        # statistics; the sketch returns a real element within one
        # order statistic of it
        assert abs(av - ev) <= max(abs(ev) * 0.05, 50.0), (key, av, ev)


def test_plan_is_sketch_not_sort(spark, sf_dir):
    """The scale property itself: no Window (per-group global sort)
    anywhere; the aggregation is the mergeable sketch with a map-side
    partial step."""
    import contextlib
    import io

    df = approx_corpus_percentiles(_docs(spark, sf_dir))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "percentile_approx" in plan
    assert "partial_percentile_approx" in plan  # map-side combine


def test_exact_auditor_unchanged(spark, sf_dir):
    """The exact operator stays the oracle-checked auditor — same
    groups, type-7 values, and the approx path never replaces it."""
    docs = _docs(spark, sf_dir)
    exact = corpus_percentiles(docs)
    assert {r[0] for r in exact.select("p").distinct().collect()} == (
        set(float(p) for p in PERCENTILE_PS))
