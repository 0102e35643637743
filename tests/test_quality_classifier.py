"""Trained weak-label quality classifier (textops.train_quality_classifier).

The oracle-parity suite already pins the registered queries bit-for-bit
against DuckDB; these tests check the model actually LEARNS — on a
corpus where the weak label is separable in feature space, training
must move the weights off zero and the scores must rank positives
above negatives.
"""

import pytest

from credit_ocr_system_spark.operators import textops as T


def _separable_docs(spark):
    # positives (curated sources): stopword-rich, diverse English prose
    # negatives (crawl): digit/punctuation junk with heavy repetition
    rows = []
    for i in range(40):
        src = f"src{i % 8}"  # src0-3 positive, src4-7 negative
        if i % 8 < 4:
            text = (f"the quick brown fox and the lazy dog were of a "
                    f"mind to walk in that old forest near town {i} "
                    f"where they had been at peace for years with all")
        else:
            text = ("#42; " * 3 + f"$$$ 123{i} 999!!! ### "
                    + "buy buy buy " * 4 + "0101010 %%% !!!")
        rows.append((i, text, "en", src, len(text)))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")


def test_learns_separable_corpus(spark):
    docs = _separable_docs(spark)
    scored = T.quality_classifier_scores(
        docs, sample_rate_hex=None).toPandas()
    assert len(scored) == 40
    pos = scored[scored.weak_label == 1].qc_score
    neg = scored[scored.weak_label == 0].qc_score
    # every positive outranks every negative on a separable corpus
    assert pos.min() > neg.max()
    acc = (scored.qc_keep == (scored.weak_label == 1)).mean()
    assert acc >= 0.9


def test_weights_move_and_are_deterministic(spark):
    docs = _separable_docs(spark)
    w1 = T.quality_classifier_weights(docs).toPandas()
    w2 = T.quality_classifier_weights(docs).toPandas()
    assert set(w1.feature) == set(T.QC_FEATURES)
    assert (w1.weight != 0.0).any()
    a = w1.sort_values("feature").weight.tolist()
    b = w2.sort_values("feature").weight.tolist()
    assert a == b  # bit-identical across runs


def test_sampling_trains_on_subset_scores_all(spark):
    docs = _separable_docs(spark)
    scored = T.quality_classifier_scores(
        docs, sample_rate_hex="80000000").toPandas()
    # scoring covers the full corpus even when training sampled ~half
    assert len(scored) == 40
    assert scored.qc_score.between(0.0, 1.0).all()
