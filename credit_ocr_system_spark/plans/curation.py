"""End-to-end corpus curation job: filter → rewrite → mix → commit.

The training-data counterpart of ``pipeline.run_extraction_job``: one
resumable batch job that takes the documents table through the full
pre-training curation stack —

    documents ──► quality_filter        (keep/drop verdict chain)
              ──► remove_duplicate_spans (keep-first span rewrite)
              ──► temperature_mixture    (α=0.5 source rebalancing)
              ──► curated snapshot + per-bucket lineage sidecar

**Resume is corpus-scoped, not per-document — deliberately.** The
extraction job resumes per url because each document's extraction
depends only on its own bytes. Every curation operator here is
*corpus-relative*: the LM vocabulary, the shared-gram table, the
source counts and mixture quotas are all statistics of the WHOLE
input. A per-document resume (left-anti join on committed doc_ids,
re-running the operators on the remainder) would recompute those
statistics on a different corpus and silently change every surviving
document's verdict. So the unit of idempotency is the corpus: the job
fingerprints its input (count, doc_id range, char mass) and skips
when a committed snapshot already carries that fingerprint; a changed
corpus writes a NEW snapshot (append in the manifest, prior curations
remain time-travelable).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.metrics import portable_bucket
from ..operators.textops import (
    quality_filter,
    remove_duplicate_spans,
    temperature_mixture,
)
from .pipeline import SnapshotSink


def corpus_fingerprint(documents: DataFrame) -> str:
    """Cheap deterministic identity of the input corpus: row count,
    doc_id range, and total char mass. Any add/drop/edit of a document
    moves at least one component; collisions would need an edit that
    preserves all four, which the synthetic and crawl sources here
    cannot produce silently (a crawl re-fetch changes n_chars)."""
    r = documents.agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.sum("n_chars").alias("chars")).first()
    return f"{r['n']}:{r['lo']}:{r['hi']}:{r['chars']}"


def curate_documents(documents: DataFrame) -> DataFrame:
    """The curated view, one composed plan per document:

    * ``kept_quality`` — the :func:`quality_filter` verdict;
    * ``clean_text`` / ``n_removed`` — the
      :func:`remove_duplicate_spans` rewrite (corpus-duplicated spans
      dropped, first copy kept);
    * ``kept_mixture`` / ``mix_q`` — the :func:`temperature_mixture`
      draw;
    * ``curated`` — in the output corpus: passes the filter chain,
      drawn by the mixture, and not rewritten to emptiness.

    Dropped documents stay in the table with their verdict bits (the
    audit trail a curation pass owes its consumers); the curated
    corpus is ``WHERE curated``.
    """
    base = documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source", "lang")
    verdict = quality_filter(documents).select(
        "doc_id", "lang_ok", "quality_ok", "lm_ok", "is_repetitive",
        "is_dup_span", "is_contaminated",
        F.col("kept").alias("kept_quality"))
    rewrite = remove_duplicate_spans(documents).select(
        "doc_id", "n_tokens", "n_removed", "clean_text")
    mixture = temperature_mixture(documents).select(
        "doc_id", F.col("q").alias("mix_q"),
        F.col("kept").alias("kept_mixture"))
    return (
        base.join(verdict, "doc_id").join(rewrite, "doc_id")
        .join(mixture, "doc_id")
        .withColumn(
            "curated",
            F.col("kept_quality") & F.col("kept_mixture")
            & (F.col("n_removed") < F.col("n_tokens")))
    )


def curation_lineage(curated: DataFrame, run_id: str,
                     n_buckets: int = 8) -> DataFrame:
    """Per-bucket curation lineage: how much each deterministic
    doc_id bucket contributed and where it was lost — the sidecar
    that makes filter-rate skew observable (a bucket whose drop rate
    diverges is a data problem, not a partitioning accident, because
    the bucket is a pure function of doc_id)."""
    return (
        curated
        .withColumn("bucket", portable_bucket(
            F.col("doc_id").cast("string"), n_buckets))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("curated").cast("int")).alias("n_curated"),
            F.sum((~F.col("kept_quality")).cast("int"))
            .alias("n_quality_dropped"),
            F.sum((F.col("kept_quality")
                   & ~F.col("kept_mixture")).cast("int"))
            .alias("n_mixture_dropped"),
            F.sum("n_removed").alias("n_span_tokens_removed"))
        .withColumn("run_id", F.lit(run_id))
    )


def run_curation_job(
    spark: SparkSession,
    documents: DataFrame,
    output_root: str,
    num_partitions: int | None = None,
) -> dict:
    """One corpus-idempotent curation run; returns commit stats."""
    run_id = uuid.uuid4().hex[:12]
    sink = SnapshotSink(os.path.join(output_root, "curated"))
    sink_lineage = SnapshotSink(
        os.path.join(output_root, "curation_lineage"))

    fp = corpus_fingerprint(documents)
    for snap in sink.committed_snapshots():
        if snap.get("corpus_fingerprint") == fp:
            return {"run_id": snap["run_id"], "skipped": True,
                    "corpus_fingerprint": fp}

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    curated = curate_documents(documents).repartition(
        num_partitions, "doc_id").persist()
    try:
        n_docs = curated.count()
        n_curated = curated.where("curated").count()
        sink.write_snapshot(
            curated, run_id,
            {"corpus_fingerprint": fp, "n_docs": n_docs,
             "n_curated": n_curated})
        sink_lineage.write_snapshot(
            curation_lineage(curated, run_id), run_id,
            {"corpus_fingerprint": fp})
        return {"run_id": run_id, "skipped": False, "n_docs": n_docs,
                "n_curated": n_curated, "corpus_fingerprint": fp}
    finally:
        curated.unpersist()
