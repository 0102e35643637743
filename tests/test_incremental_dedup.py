"""Append-mode dedup: incremental result == batch result, at delta
cost.

The operator contract (textops.incremental_near_dup_clusters): folding
a crawl delta into a committed clustering must (a) produce exactly the
batch clustering of committed ∪ delta — docs never leave, components
only merge — while (b) every stage's size scales with the delta, not
the corpus. (a) is also pinned by the driver oracle
(``incremental_dedup`` hash-matches the batch SQL); here we pin (b)
and the job-level resume behavior.
"""

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators.textops import (
    _verify_jaccard,
    incremental_candidates,
    incremental_near_dup_clusters,
    minhash_candidates,
    minhash_signatures,
    verified_near_dup_clusters,
)
from credit_ocr_system_spark.plans.curation import (
    run_incremental_dedup_job,
)
from credit_ocr_system_spark.plans.pipeline import SnapshotSink

DELTA_MOD = 4  # doc_id % 4 == 0 arrives as the second snapshot


def _docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents")


def _split(docs):
    did = F.col("doc_id").cast("bigint")
    return (docs.where(did % DELTA_MOD != 0),
            docs.where(did % DELTA_MOD == 0))


def _assign_map(df):
    return {r.doc_id: r.cluster_root for r in df.collect()}


def test_incremental_equals_batch(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    committed, delta = _split(docs)
    got = incremental_near_dup_clusters(
        docs,
        minhash_signatures(committed),
        verified_near_dup_clusters(committed),
        delta)
    want = verified_near_dup_clusters(docs)
    assert _assign_map(got) == _assign_map(want)


def test_candidate_generation_touches_delta_only(spark, sf_dir):
    """Every incremental candidate pair has a delta endpoint;
    committed-committed pairs (the corpus-sized quadratic term) never
    form. The committed work is exactly the batch candidates minus
    the resolved committed-committed ones."""
    docs = _docs(spark, sf_dir)
    committed, delta = _split(docs)
    inc = {(r.doc_a, r.doc_b)
           for r in incremental_candidates(
               minhash_signatures(committed),
               minhash_signatures(delta)).collect()}
    batch = {(r.doc_a, r.doc_b)
             for r in minhash_candidates(docs).collect()}
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    assert inc <= batch
    assert all(a in delta_ids or b in delta_ids for a, b in inc)
    # the skipped work is real: committed-committed candidates exist
    # in the batch set and are exactly what the incremental path drops
    assert batch - inc == {
        (a, b) for a, b in batch
        if a not in delta_ids and b not in delta_ids}
    assert len(batch - inc) > 0


def test_cc_subgraph_is_delta_proportional(spark, sf_dir):
    """The incremental CC re-labels only the touched subgraph: delta
    docs plus members of committed components with a verified edge
    endpoint — a small multiple of the delta, far below the corpus."""
    docs = _docs(spark, sf_dir)
    committed, delta = _split(docs)
    committed_clusters = verified_near_dup_clusters(committed)
    verified = _verify_jaccard(
        docs,
        incremental_candidates(minhash_signatures(committed),
                               minhash_signatures(delta)),
        0.8).select("doc_a", "doc_b")
    touched = (verified.select(F.col("doc_a").alias("doc_id"))
               .unionByName(verified.select(
                   F.col("doc_b").alias("doc_id"))).distinct())
    affected_roots = (committed_clusters.join(touched, "doc_id")
                      .select("cluster_root").distinct())
    n_sub = (committed_clusters.join(affected_roots, "cluster_root")
             .count() + delta.count())
    n_corpus = docs.count()
    n_delta = delta.count()
    assert n_sub < n_corpus / 2
    assert n_sub <= 4 * n_delta  # measured ~1.1x at sf0.001


def test_job_resume_batch_then_incremental_then_noop(
        spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    committed, delta = _split(docs)
    out = str(tmp_path / "dedup")

    s1 = run_incremental_dedup_job(spark, committed, out)
    assert s1["mode"] == "batch"

    s2 = run_incremental_dedup_job(spark, docs, out)
    assert s2["mode"] == "incremental"
    assert s2["n_new"] == delta.count()

    # committed state now equals the batch clustering of the union
    cl = SnapshotSink(out + "/dedup_clusters").read_committed(spark)
    assert _assign_map(cl) == _assign_map(verified_near_dup_clusters(docs))

    # the signature table grew by an APPEND of delta-sized rows only
    sig_sink = SnapshotSink(out + "/dedup_signatures")
    snaps = sig_sink.committed_snapshots()
    assert len(snaps) == 2 and snaps[1].get("op", "append") == "append"
    n_delta_sigs = minhash_signatures(delta).count()
    appended = spark.read.parquet(
        out + "/dedup_signatures/" + snaps[1]["dir"]).count()
    assert appended == n_delta_sigs

    s3 = run_incremental_dedup_job(spark, docs, out)
    assert s3["mode"] == "noop" and s3["n_new"] == 0
