"""Cross-document line-level boilerplate strip and global line dedup
(CCNet-style) — functional semantics on hand-built frames plus the
physical-plan shapes the 100 TB argument rests on."""
import contextlib
import io

import pytest

from credit_ocr_system_spark.operators.textops import (
    dedup_lines_global,
    strip_boilerplate_lines,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "Cookie notice" repeats in 3 docs (>= min_docs=3);
        # "unique ..." lines are per-doc content; d has a blank line
        # and a within-doc repeat of its own content line
        ("a", "Cookie notice\nunique a1\nunique a2"),
        ("b", "unique b1\nCookie notice\nunique b2"),
        ("c", "unique c1\nunique c2\nCookie notice"),
        ("d", "only d\n\nonly d"),
        ("e", "Cookie notice"),  # all content is boilerplate
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_strip_boilerplate_semantics(spark, docs):
    out = {r["url"]: r for r in strip_boilerplate_lines(
        docs, text_col="text", min_docs=3).collect()}
    assert out["a"]["clean_text"] == "unique a1\nunique a2"
    assert out["b"]["clean_text"] == "unique b1\nunique b2"
    assert out["c"]["clean_text"] == "unique c1\nunique c2"
    # "only d" repeats only within ONE doc — df counts DISTINCT docs,
    # so it is not boilerplate; blank line survives
    assert out["d"]["clean_text"] == "only d\n\nonly d"
    assert out["d"]["n_stripped"] == 0
    # a doc that was pure boilerplate comes back empty, not missing
    assert out["e"]["clean_text"] == ""
    assert (out["e"]["n_lines"], out["e"]["n_stripped"]) == (1, 1)
    assert out["a"]["n_lines"] == 3 and out["a"]["n_stripped"] == 1


def test_strip_boilerplate_min_frac_scales_threshold(spark, docs):
    # min_frac=0.9 → threshold max(2, ceil(0.9*5)) = 5 > 3 docs:
    # nothing is boilerplate anymore
    out = strip_boilerplate_lines(docs, text_col="text",
                                  min_docs=2, min_frac=0.9)
    assert out.agg({"n_stripped": "sum"}).collect()[0][0] == 0
    # min_frac=0.5 → threshold max(2, ceil(2.5)) = 3: strips again
    out2 = {r["url"]: r for r in strip_boilerplate_lines(
        docs, text_col="text", min_docs=2, min_frac=0.5).collect()}
    assert out2["e"]["n_stripped"] == 1


def test_dedup_lines_global_semantics(spark, docs):
    out = {r["url"]: r for r in dedup_lines_global(
        docs, text_col="text").collect()}
    # "Cookie notice": first occurrence is (a, pos 0) — survives in a,
    # removed from b, c, e
    assert out["a"]["clean_text"] == ("Cookie notice\nunique a1\n"
                                      "unique a2")
    assert out["b"]["clean_text"] == "unique b1\nunique b2"
    assert out["c"]["clean_text"] == "unique c1\nunique c2"
    assert out["e"]["clean_text"] == "" and out["e"]["n_removed"] == 1
    # within-doc repeat: only the FIRST "only d" survives; blank kept
    assert out["d"]["clean_text"] == "only d\n"
    assert out["d"]["n_removed"] == 1


def test_strip_rewrite_never_shuffles_documents(spark, docs):
    # the documents table must not re-group for the rewrite: the
    # boilerplate set broadcasts as a 1-row scalar (BNLJ is the
    # sanctioned 1-row crossJoin) and the strip is a projection.
    # Exactly one hashpartitioning exchange total — the line-frequency
    # aggregation — and no sort anywhere.
    plan = plan_of(strip_boilerplate_lines(docs, text_col="text",
                                           min_docs=3))
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in plan
    assert "Sort " not in plan


def test_dedup_lines_all_equi_joins(spark, docs):
    # winner selection is a map-side-combinable min-struct agg, never
    # a window sort of the corpus; joins are equi-joins only
    plan = plan_of(dedup_lines_global(docs, text_col="text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_min" in plan or "min(" in plan  # map-side combine


# --- BM25 ------------------------------------------------------------------

def test_bm25_semantics(spark):
    from credit_ocr_system_spark.operators.textops import bm25_topk

    rows = [(1, "spark spark spark filler words here to pad length"),
            (2, "spark filler words here to pad out the length"),
            (3, "nothing relevant at all in this document text"),
            (4, "rare rare word document mentioning spark once only")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, query=("spark", "rare"), k=10)
    got = {r["doc_id"]: r for r in out.collect()}
    assert 3 not in got                    # no query term: no row
    assert got[1]["score"] > got[2]["score"]  # tf saturation ranks
    # 'rare' appears only in doc 4: its idf outweighs one 'spark'
    assert got[4]["score"] > got[2]["score"]
    assert got[4]["n_terms"] == 2 and got[1]["n_terms"] == 1


def test_bm25_plan_shape(spark):
    # df and corpus stats broadcast; no corpus-sized window/sort
    # before the final top-k; the non-query vocabulary is filtered
    # map-side before any exchange
    from credit_ocr_system_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark a"), (2, "b merge")], "doc_id long, text string")
    plan = plan_of(bm25_topk(docs))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort
