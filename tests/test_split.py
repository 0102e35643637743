"""Behavioral tests for the leakage-safe train/valid/test split (the
oracle-parity hash check runs separately in test_oracle_parity.py).
The property a hash can't explain: no verified near-dup pair may ever
straddle two splits.
"""

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import textops as T


def test_near_dup_pairs_never_straddle_splits(spark, sf_dir):
    docs = R.load(spark, sf_dir, "documents")
    split = {r["doc_id"]: r["split"]
             for r in T.leakage_safe_split(docs).collect()}
    pairs = T.verified_near_dup_pairs(docs).collect()
    assert pairs, "corpus has no verified near-dup pairs to test"
    for p in pairs:
        assert split[p["doc_a"]] == split[p["doc_b"]], (
            f"near-dups {p['doc_a']}/{p['doc_b']} landed in "
            f"{split[p['doc_a']]} vs {split[p['doc_b']]} — leakage")


def test_split_covers_every_document(spark, sf_dir):
    docs = R.load(spark, sf_dir, "documents")
    rows = T.leakage_safe_split(docs).collect()
    assert len(rows) == docs.count()
    counts: dict = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) <= {"train", "valid", "test"}
    # the 2-hex boundaries put ~90% in train; held-out splits exist
    assert counts["train"] > 0.7 * len(rows)
    assert counts.get("valid", 0) + counts.get("test", 0) > 0


def test_split_is_cluster_root_pure(spark, sf_dir):
    """Same cluster_root -> same split, and the assignment is a pure
    function of the root (re-derivable from the hex boundaries)."""
    import hashlib

    rows = T.leakage_safe_split(
        R.load(spark, sf_dir, "documents")).collect()
    for r in rows:
        h = hashlib.md5(str(r["cluster_root"]).encode()).hexdigest()[:2]
        want = ("test" if h < T.SPLIT_TEST_HEX
                else "valid" if h < T.SPLIT_VALID_HEX else "train")
        assert r["split"] == want
