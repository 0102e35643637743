"""End-to-end corpus curation job: filter → rewrite → mix → commit.

The training-data counterpart of ``pipeline.run_extraction_job``: one
resumable batch job that takes the documents table through the full
pre-training curation stack —

    documents ──► quality_filter        (keep/drop verdict chain)
              ──► perplexity_buckets    (CCNet tail cut)
              ──► fuzzy_decontaminate   (paraphrase-level leakage)
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
    fuzzy_decontaminate,
    incremental_near_dup_clusters,
    minhash_signatures,
    perplexity_buckets,
    quality_filter,
    remove_duplicate_spans,
    temperature_mixture,
    verified_near_dup_clusters,
)
from .pipeline import SnapshotSink, maybe_compact


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
    * ``ppl_bucket`` — the :func:`perplexity_buckets` tertile (CCNet
      convention: the highest-perplexity 'tail' third of each
      language is cut; token-less documents have no LM score and
      land in 'tail');
    * ``fuzzy_contaminated`` — the :func:`fuzzy_decontaminate`
      verdict (paraphrase-level benchmark leakage, on top of the
      exact n-gram ``is_contaminated`` inside the quality chain);
    * ``clean_text`` / ``n_removed`` — the
      :func:`remove_duplicate_spans` rewrite (corpus-duplicated spans
      dropped, first copy kept);
    * ``kept_mixture`` / ``mix_q`` — the :func:`temperature_mixture`
      draw;
    * ``curated`` — in the output corpus: passes the filter chain,
      not in the perplexity tail, not fuzzily contaminated, drawn by
      the mixture, and not rewritten to emptiness.

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
    ppl = perplexity_buckets(documents).select("doc_id", "ppl_bucket")
    fuzzy = fuzzy_decontaminate(documents).select(
        "doc_id",
        F.col("is_contaminated").alias("fuzzy_contaminated"))
    rewrite = remove_duplicate_spans(documents).select(
        "doc_id", "n_tokens", "n_removed", "clean_text")
    mixture = temperature_mixture(documents).select(
        "doc_id", F.col("q").alias("mix_q"),
        F.col("kept").alias("kept_mixture"))
    return (
        base.join(verdict, "doc_id")
        .join(ppl, "doc_id", "left")      # token-less docs: no score
        .join(fuzzy, "doc_id")
        .join(rewrite, "doc_id")
        .join(mixture, "doc_id")
        .withColumn("ppl_bucket",
                    F.coalesce(F.col("ppl_bucket"), F.lit("tail")))
        .withColumn(
            "curated",
            F.col("kept_quality") & F.col("kept_mixture")
            & (F.col("ppl_bucket") != "tail")
            & ~F.col("fuzzy_contaminated")
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
            F.sum((F.col("ppl_bucket") == "tail").cast("int"))
            .alias("n_ppl_tail"),
            F.sum(F.col("fuzzy_contaminated").cast("int"))
            .alias("n_fuzzy_contaminated"),
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


def run_incremental_dedup_job(
    spark: SparkSession,
    documents: DataFrame,
    output_root: str,
    compact_max_files: int = 256,
) -> dict:
    """Append-mode dedup across crawl snapshots: maintain a committed
    signature table and cluster assignment, folding each call's NEW
    documents in at delta cost (``incremental_near_dup_clusters``) —
    never re-clustering the committed corpus.

    Unlike the curation statistics above, near-dup clustering is NOT
    corpus-relative — signatures are per-document and components only
    merge — so per-document resume is sound here and the incremental
    answer provably equals the batch answer.

    State (two SnapshotSink tables under ``output_root``):

    * ``dedup_signatures`` — (doc_id, band, minhash); each run APPENDS
      only the delta's signatures (delta-sized write);
    * ``dedup_clusters`` — (doc_id, cluster_root); each run MERGEs the
      recomputed touched-subgraph assignments on doc_id (Iceberg
      ``MERGE INTO``; delta-sized source).

    Returns {run_id, mode, n_docs, n_new}: mode "batch" on first run,
    "noop" when every doc_id is already committed, else "incremental".

    Small-files maintenance: every delta APPENDS signature part files
    and every MERGE leaves the cluster table re-shuffled — with daily
    crawls that is unbounded file growth. After its commit, the job
    compacts any of its two state sinks whose current view exceeds
    ``compact_max_files`` data files (``pipeline.maybe_compact``,
    binpack replace snapshot, value-identical).
    """
    run_id = uuid.uuid4().hex[:12]
    sig_sink = SnapshotSink(
        os.path.join(output_root, "dedup_signatures"))
    cl_sink = SnapshotSink(os.path.join(output_root, "dedup_clusters"))

    committed_sigs = sig_sink.read_committed(spark)
    n_docs = documents.count()
    if committed_sigs is None:
        sigs = minhash_signatures(documents)
        clusters = verified_near_dup_clusters(documents)
        sig_sink.write_snapshot(sigs, run_id, {"n_docs": n_docs})
        cl_sink.write_snapshot(clusters, run_id, {"n_docs": n_docs})
        return {"run_id": run_id, "mode": "batch",
                "n_docs": n_docs, "n_new": n_docs}

    committed_clusters = cl_sink.read_committed(spark)
    committed_ids = committed_clusters.select("doc_id")
    delta = documents.join(
        committed_ids,
        documents["doc_id"].cast("bigint") == committed_ids["doc_id"],
        "left_anti")
    n_new = delta.count()
    if n_new == 0:
        return {"run_id": run_id, "mode": "noop",
                "n_docs": n_docs, "n_new": 0}

    assignment = incremental_near_dup_clusters(
        documents, committed_sigs, committed_clusters, delta)
    # merge source: only rows the incremental pass recomputed (the
    # touched subgraph + the delta) — committed untouched rows match
    # their existing assignment, so restricting the MERGE to changed
    # + new keys keeps the source delta-sized
    changed = assignment.join(
        committed_clusters.withColumnRenamed("cluster_root", "old_root"),
        "doc_id", "left").where(
            F.col("old_root").isNull()
            | (F.col("old_root") != F.col("cluster_root"))
        ).select("doc_id", "cluster_root")
    sig_sink.write_snapshot(
        minhash_signatures(delta), run_id, {"n_new": n_new})
    cl_sink.merge_upsert(spark, changed, run_id, ["doc_id"],
                         {"n_new": n_new})
    stats = {"run_id": run_id, "mode": "incremental",
             "n_docs": n_docs, "n_new": n_new}
    maint = maybe_compact(spark, run_id,
                          [("dedup_signatures", sig_sink),
                           ("dedup_clusters", cl_sink)],
                          compact_max_files)
    if maint:
        stats["compacted"] = maint
    return stats
