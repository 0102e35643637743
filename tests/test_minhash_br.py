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


def test_verified_pipeline_refines_unverified_clusters(spark, sf_dir):
    """candidates → verify → CC: verified edges are a subset of the
    candidate edges, so verified clustering can only split (never
    merge) the unverified clusters, and verified pairs all clear the
    exact-Jaccard threshold."""
    docs = R.load(spark, sf_dir, "documents")
    cands = _pairs(T.minhash_candidates(docs))
    verified_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in T.verified_near_dup_pairs(docs).collect()}
    assert verified_pairs, "seeded corpus must contain true near-dups"
    assert {(a, b) for a, b, _ in verified_pairs} <= cands
    assert all(j >= T.VERIFY_JACCARD_THRESHOLD
               for _, _, j in verified_pairs)

    plain = {r.doc_id: r.cluster_root
             for r in T.dedup_clusters(docs).collect()}
    verified = {r.doc_id: r.cluster_root
                for r in T.verified_near_dup_clusters(docs).collect()}
    assert set(plain) == set(verified)  # every doc gets a row in both
    # refinement: docs sharing a verified cluster also share the
    # unverified one (the reverse need not hold)
    from collections import defaultdict
    groups = defaultdict(list)
    for doc, root in verified.items():
        groups[root].append(doc)
    for members in groups.values():
        assert len({plain[d] for d in members}) == 1
    # and the verify step actually prunes: fewer non-singleton members
    n_plain = sum(1 for d, r in plain.items() if d != r)
    n_verified = sum(1 for d, r in verified.items() if d != r)
    assert n_verified <= n_plain


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
