"""Verdict-table coverage edges from the round-4 operators review:
composed filters must emit a row for EVERY input document — a doc
with no tokens (or an empty threshold sample) gets a verdict, never
silently vanishes from the output."""

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import textops as T


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")


def test_quality_filter_emits_zero_token_docs(spark):
    docs = _docs(spark, [
        "the and for are with his they this have from one had word",
        "",            # zero tokens: repetition_score emits no row
        "   \n  \t ",  # whitespace only
    ])
    out = {r["doc_id"]: r for r in T.quality_filter(docs).collect()}
    assert set(out) == {0, 1, 2}, "every doc gets a verdict row"
    assert not out[1]["kept"] and not out[2]["kept"]
    assert out[1]["is_repetitive"] is False  # coalesced, not null


def test_dsir_empty_sample_keeps_everything(spark):
    docs = _docs(spark, [
        f"document number {i} carries distinct words here"
        for i in range(6)])
    # sample bound '0' * 8 admits nothing (md5 prefix < '00000000' is
    # impossible): the threshold degrades to keep-all instead of the
    # old behavior (cross-join with an empty side -> zero rows out)
    out = T.dsir_importance(docs, sample_hex="00000000").collect()
    assert len(out) == 6
    assert all(r["kept"] for r in out)


def test_exact_dedup_emits_singleton_groups(spark):
    docs = _docs(spark, ["alpha text", "alpha  text", "beta text"])
    groups = {r["canonical_doc_id"]: r["n_copies"]
              for r in T.exact_dedup(docs).collect()}
    # normalization collapses 0 and 1; 2 stays a singleton GROUP row
    assert groups == {0: 2, 2: 1}
