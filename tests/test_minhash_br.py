"""MinHash (b, r) parameterization: recall/precision trade-off checks.

The (b=4, r=2) layout must keep full recall on genuinely similar pairs
while pruning the false-positive candidates the single-row bands admit
(S-curve: P(candidate) = 1 - (1 - s^r)^b, so r=2 pushes the threshold
up). Data is deterministic (seeded testdata), so the bounds are exact.
"""

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import textops as T

MAX_ID = 150


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_r2_keeps_recall_and_improves_precision(spark, sf_dir):
    docs = R.load(spark, sf_dir, "documents")
    truth = _pairs(
        T.shingle_jaccard_pairs(docs, threshold=0.5, max_doc_id=MAX_ID))
    assert truth, "seeded corpus must contain near-dup pairs"

    in_range = (F.col("doc_a") < MAX_ID) & (F.col("doc_b") < MAX_ID)
    cand_r1 = _pairs(T.minhash_candidates(docs).where(in_range))
    cand_r2 = _pairs(
        T.minhash_candidates(docs, n_bands=4, rows_per_band=2)
        .where(in_range))

    # full recall on the true near-dups at both settings
    assert truth <= cand_r1
    assert truth <= cand_r2
    # r=2 must strictly prune the candidate set (higher precision)
    assert len(cand_r2) < len(cand_r1)


def test_r2_band_signature_null_on_shingleless_docs(spark):
    # a 2-token doc has no 3-gram shingles: signature must be NULL
    # (dropped), matching the '||' NULL propagation in the oracle
    docs = spark.createDataFrame(
        [(1, "only two"), (2, "three tokens here now")],
        "doc_id bigint, text string")
    sigs = T.minhash_signatures(docs, n_bands=4, rows_per_band=2)
    got = {r.doc_id for r in sigs.select("doc_id").distinct().collect()}
    assert got == {2}
    row = sigs.where(F.col("doc_id") == 2).first()
    assert row.minhash.count("|") == 1  # two member minima joined
