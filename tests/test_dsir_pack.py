"""Behavioral tests for sequence packing and DSIR importance
resampling (the oracle-parity hash check runs separately in
test_oracle_parity.py; these pin the semantics a hash can't explain).
"""

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import textops as T


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")


# --- pack_sequences --------------------------------------------------------


def test_pack_sequences_boundary_math(spark):
    rows = [
        (0, "a b c", "s1"),                      # 3 tokens
        (1, " ".join(["t"] * 510), "s1"),        # 510 -> crosses 512
        (2, "x y", "s1"),
        (3, "", "s1"),                           # empty document
        (4, "p q r s", "s2"),                    # independent group
    ]
    out = {r["doc_id"]: r
           for r in T.pack_sequences(_docs(spark, rows)).collect()}

    assert (out[0]["start_off"], out[0]["start_seq"],
            out[0]["end_seq"], out[0]["n_seqs"]) == (0, 0, 0, 1)
    # doc 1: tokens 3..512 -> last token lands exactly on the 512
    # boundary, so it spans sequences 0 and 1
    assert (out[1]["start_off"], out[1]["start_seq"],
            out[1]["end_seq"], out[1]["n_seqs"]) == (3, 0, 1, 2)
    assert (out[2]["start_off"], out[2]["start_seq"],
            out[2]["n_seqs"]) == (513, 1, 1)
    # empty docs occupy zero tokens and zero sequences
    assert (out[3]["n_tokens"], out[3]["n_seqs"]) == (0, 0)
    # each source packs independently from offset 0
    assert out[4]["start_off"] == 0 and out[4]["source"] == "s2"


def test_pack_sequences_offsets_are_contiguous(spark, sf_dir):
    rows = T.pack_sequences(R.load(spark, sf_dir, "documents")).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) > 1
    for src_rows in by_src.values():
        src_rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in src_rows:
            assert r["start_off"] == off, "gap or overlap in packing"
            off += r["n_tokens"]


# --- dsir_importance -------------------------------------------------------


def test_dsir_upweights_target_like_documents(spark):
    target = [(i, "alpha beta gamma delta alpha beta", "t")
              for i in range(3)]
    similar = [(10 + i, "alpha gamma beta delta gamma", "s")
               for i in range(4)]
    dissim = [(20 + i, "zebra quartz wharf jigsaw vex", "d")
              for i in range(4)]
    w = {r["doc_id"]: r["log_weight"]
         for r in T.dsir_log_weights(
             _docs(spark, target + similar + dissim),
             n_buckets=64, n_target=3).collect()}
    worst_similar = min(w[10 + i] for i in range(4))
    best_dissim = max(w[20 + i] for i in range(4))
    assert worst_similar > best_dissim, (
        "documents sharing the target's vocabulary must outscore "
        "disjoint-vocabulary documents")


def test_dsir_zero_token_docs_are_absent(spark):
    rows = [(0, "alpha beta", "t"), (1, "   ", "s"), (2, "alpha", "s")]
    got = {r["doc_id"] for r in T.dsir_log_weights(
        _docs(spark, rows), n_buckets=64, n_target=1).collect()}
    assert got == {0, 2}


def test_dsir_keep_fraction_and_determinism(spark, sf_dir):
    docs = R.load(spark, sf_dir, "documents")
    first = T.dsir_importance(docs).collect()
    kept = sorted(r["doc_id"] for r in first if r["kept"])
    frac = len(kept) / len(first)
    # the threshold comes from a ~50% sample, so the realized keep
    # fraction tracks DSIR_KEEP_FRAC loosely, not exactly
    assert 0.10 <= frac <= 0.45, frac
    again = sorted(r["doc_id"]
                   for r in T.dsir_importance(docs).collect()
                   if r["kept"])
    assert again == kept  # no RNG anywhere: same corpus, same sample
