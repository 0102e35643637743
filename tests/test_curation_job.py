"""End-to-end curation job: composed view, corpus-scoped resume,
lineage sidecar."""

import pytest

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators.textops import (
    fuzzy_decontaminate,
    perplexity_buckets,
    quality_filter,
    temperature_mixture,
)
from credit_ocr_system_spark.plans.curation import (
    corpus_fingerprint,
    curate_documents,
    run_curation_job,
)
from credit_ocr_system_spark.plans.pipeline import SnapshotSink


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return R.load(spark, sf_dir, "documents")


def test_curated_view_composes_the_operators(spark, docs):
    cur = curate_documents(docs)
    rows = {r["doc_id"]: r for r in cur.collect()}
    assert len(rows) == docs.count()  # audit trail: nobody vanishes
    qf = {r["doc_id"]: r["kept"] for r in quality_filter(docs).collect()}
    mx = {r["doc_id"]: r["kept"]
          for r in temperature_mixture(docs).collect()}
    ppl = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(docs).collect()}
    fz = {r["doc_id"]: r["is_contaminated"]
          for r in fuzzy_decontaminate(docs).collect()}
    for d, r in rows.items():
        assert r["kept_quality"] == qf[d]
        assert r["kept_mixture"] == mx[d]
        assert r["ppl_bucket"] == ppl.get(d, "tail")
        assert r["fuzzy_contaminated"] == fz[d]
        assert r["curated"] == (
            qf[d] and mx[d] and ppl.get(d, "tail") != "tail"
            and not fz[d] and r["n_removed"] < r["n_tokens"])
    # non-degenerate at the corpus scale the suite runs at
    n_cur = sum(r["curated"] for r in rows.values())
    assert 0 < n_cur < len(rows)


def test_curation_job_commits_and_resumes_by_corpus(spark, docs, tmp_path):
    out = str(tmp_path / "cur")
    r1 = run_curation_job(spark, docs, out, num_partitions=4)
    assert not r1["skipped"] and r1["n_docs"] == docs.count()
    # identical corpus -> skip, and the skip reports the ORIGINAL run
    r2 = run_curation_job(spark, docs, out, num_partitions=4)
    assert r2["skipped"] and r2["run_id"] == r1["run_id"]
    # a changed corpus (one doc dropped) is a NEW curation, not a skip
    smaller = docs.where("doc_id > 0")
    r3 = run_curation_job(spark, smaller, out, num_partitions=4)
    assert not r3["skipped"] and r3["n_docs"] == docs.count() - 1
    # both snapshots remain readable (append history)
    sink = SnapshotSink(out + "/curated")
    assert len(sink.committed_snapshots()) == 2
    assert sink.read_snapshot(spark, r1["run_id"]).count() == r1["n_docs"]

    lin = SnapshotSink(out + "/curation_lineage").read_snapshot(
        spark, r1["run_id"]).collect()
    assert sum(x["n_docs"] for x in lin) == r1["n_docs"]
    assert sum(x["n_curated"] for x in lin) == r1["n_curated"]
    # drops are attributed: quality + mixture + span-emptied = total
    dropped = r1["n_docs"] - r1["n_curated"]
    attributed = sum(x["n_quality_dropped"] + x["n_mixture_dropped"]
                     for x in lin)
    assert attributed <= dropped  # span-emptied docs are the remainder


def test_corpus_fingerprint_moves_with_any_edit(spark, docs):
    from pyspark.sql import functions as F

    base = corpus_fingerprint(docs)
    assert corpus_fingerprint(docs) == base  # deterministic
    assert corpus_fingerprint(docs.where("doc_id > 0")) != base
    edited = docs.withColumn(
        "n_chars", F.col("n_chars")
        + F.when(F.col("doc_id") == 1, 1).otherwise(0))
    assert corpus_fingerprint(edited) != base
