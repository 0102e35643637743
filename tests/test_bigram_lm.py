"""Interpolated bigram LM scorer (textops.bigram_lm_score).

Oracle parity pins the registered query bit-for-bit against DuckDB;
these tests check the model's semantics: predictable word order scores
lower cross-entropy than scrambled order (the property a unigram LM
cannot see), short docs are excluded, and runs are bit-deterministic.
"""

from credit_ocr_system_spark.operators import textops as T


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")


def test_word_order_matters(spark):
    # same unigram distribution, different bigram structure: docs
    # 0..8 repeat the canonical order, doc 9 scrambles it. A unigram
    # LM scores them identically; the bigram LM must penalize the
    # scramble.
    canon = "the cat sat on the mat " * 5
    scram = "mat the on cat the sat " * 5
    docs = _docs(spark, [canon] * 9 + [scram])
    out = T.bigram_lm_score(docs).toPandas().set_index("doc_id")
    assert out.loc[9, "cross_entropy"] > out.loc[0, "cross_entropy"]
    uni = T.unigram_lm_score(docs).toPandas().set_index("doc_id")
    assert uni.loc[9, "cross_entropy"] == uni.loc[0, "cross_entropy"]


def test_short_docs_excluded(spark):
    docs = _docs(spark, ["single", "", "two tokens here"])
    out = T.bigram_lm_score(docs).toPandas()
    assert sorted(out.doc_id) == [2]


def test_deterministic(spark):
    rows = [f"alpha beta gamma delta token{i} beta gamma" for i in
            range(20)]
    docs = _docs(spark, rows)
    a = T.bigram_lm_score(docs).toPandas().sort_values("doc_id")
    b = T.bigram_lm_score(docs).toPandas().sort_values("doc_id")
    assert a.cross_entropy.tolist() == b.cross_entropy.tolist()
    assert a.n_bigrams.tolist() == b.n_bigrams.tolist()
