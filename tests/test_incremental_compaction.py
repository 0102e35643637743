"""Small-files maintenance under the incremental jobs.

VERDICT r4 item #8: ``run_incremental_dedup_job`` and
``run_crawl_collapse_job`` MERGE/append per delta — at 10^12 with
daily crawls that is unbounded small-file growth. Both jobs now
invoke ``SnapshotSink.compact`` on a file-count cadence
(``pipeline.maybe_compact``). Pinned here:

* across ≥3 deltas with a tight ``compact_max_files``, the state
  sinks' data-file counts stay bounded (≤ threshold + one delta's
  files) instead of growing monotonically;
* compaction is value-identical — the committed view still equals
  the batch recompute after the rewrites;
* under the default (large) threshold nothing compacts — the trigger
  reads only listings, never data.
"""

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import weburl as WB
from credit_ocr_system_spark.operators.textops import (
    verified_near_dup_clusters,
)
from credit_ocr_system_spark.plans.curation import (
    run_incremental_dedup_job,
)
from credit_ocr_system_spark.plans.pipeline import (
    SnapshotSink,
    read_canonical_pages,
    run_crawl_collapse_job,
)
from credit_ocr_system_spark.sources.visits import visits_df

# At test scale AQE coalesces each delta write to ~1 part file, so
# the threshold must be tight for ≥3 deltas to exceed it — the
# *mechanism* under test is identical at any scale (file-count
# trigger -> binpack replace).
MAX_FILES = 2


def test_dedup_file_count_bounded_across_deltas(spark, sf_dir, tmp_path):
    docs = R.load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("bigint")
    out = str(tmp_path / "dedup")
    sig_sink = SnapshotSink(out + "/dedup_signatures")
    cl_sink = SnapshotSink(out + "/dedup_clusters")

    # 4 growing prefixes of the corpus -> 1 batch + 3 incremental runs
    counts = []
    compacted_any = False
    for mod in (4, 3, 2, 1):
        slice_ = docs.where(did % 4 < (5 - mod)) if mod > 1 else docs
        stats = run_incremental_dedup_job(
            spark, slice_, out, compact_max_files=MAX_FILES)
        assert stats["mode"] in ("batch", "incremental")
        compacted_any |= bool(stats.get("compacted"))
        counts.append((len(sig_sink.data_files()),
                       len(cl_sink.data_files())))

    assert compacted_any, "tight threshold never triggered compaction"
    # bounded: after every run each sink holds at most the threshold
    # plus the files one delta writes before the next compaction
    delta_files_bound = spark.conf.get("spark.sql.shuffle.partitions")
    bound = MAX_FILES + int(delta_files_bound)
    for n_sig, n_cl in counts:
        assert n_sig <= bound and n_cl <= bound
    # and the last view is compact, not accreted
    assert len(sig_sink.data_files()) <= bound
    assert len(cl_sink.data_files()) <= bound

    # value identity survived the rewrites: committed view == batch
    cl = cl_sink.read_committed(spark)
    got = {r.doc_id: r.cluster_root for r in cl.collect()}
    want = {r.doc_id: r.cluster_root
            for r in verified_near_dup_clusters(docs).collect()}
    assert got == want


def test_crawl_collapse_file_count_bounded(spark, tmp_path):
    out = str(tmp_path / "cc")
    sink = SnapshotSink(out + "/canonical_state")
    v_full = visits_df(spark, 400, partitions=4)
    compacted_any = False
    for hi in (150, 250, 320, 400):
        stats = run_crawl_collapse_job(
            spark, v_full.filter(F.col("visit_id") < hi), out,
            compact_max_files=MAX_FILES)
        assert not stats["skipped"]
        compacted_any |= bool(stats.get("compacted"))

    assert compacted_any
    bound = MAX_FILES + int(
        spark.conf.get("spark.sql.shuffle.partitions"))
    assert len(sink.data_files()) <= bound

    # committed view still equals the batch collapse over the full log
    got = {r["canonical_url"]: r.asDict() for r in
           read_canonical_pages(spark, out).collect()}
    want = {r["canonical_url"]: r.asDict() for r in
            WB.canonical_pages(v_full).collect()}
    assert got == want


def test_default_threshold_no_compaction(spark, sf_dir, tmp_path):
    docs = R.load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("bigint")
    out = str(tmp_path / "dedup")
    run_incremental_dedup_job(spark, docs.where(did % 2 == 0), out)
    stats = run_incremental_dedup_job(spark, docs, out)
    assert stats["mode"] == "incremental"
    assert "compacted" not in stats
