"""Lineage + metrics sidecar (north_rule: "per-partition lineage and
extraction metrics to an Iceberg sidecar table").

Replaces the reference's Postgres status rows / extraction_jobs
lifecycle (``/root/reference/src/dms/adapters.py:130-205``) and its
per-page confidence stats (``src/visualization/ocr_visualization.py:
103-107``): one row per physical partition with row counts, byte
counts, kernel wall time and the url range — enough to *observe* skew
instead of guessing, and to audit exactly which slice of input
produced which committed snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows from the extraction output."""
    return (
        extracted
        .withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("url").alias("url_min"),
            F.max("url").alias("url_max"),
            F.sum("n_elements").alias("n_elements"),
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("bytes_in").alias("bytes_in"),
            (F.sum("kernel_us") / F.lit(1000.0)).alias("kernel_ms"),
            F.sum(F.when(F.col("doc_kind") == "pdf", 1)
                  .otherwise(0)).alias("n_pdf"),
            F.sum(F.when(F.col("error").isNotNull(), 1)
                  .otherwise(0)).alias("n_errors"),
            F.avg("n_pairs").alias("avg_pairs_per_doc"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def _hex_digit_val(d):
    return F.when(d >= 97, d - 87).otherwise(d - 48)  # a-f / 0-9


def portable_bucket(col, n_buckets: int = 8):
    """Deterministic engine-portable partition bucket: the last two
    hex digits of ``md5(col)`` (0..255) mod ``n_buckets``.

    ``spark_partition_id()`` is honest lineage inside a run but no
    other engine can re-derive it (and AQE coalescing can renumber
    it). A bucket that is a pure function of the key — and that the
    job *repartitions by* — is stable lineage at any scale: every
    bucket's rows are co-located inside a single physical partition
    (a partition may host several buckets — ``repartition`` hashes
    the bucket value — but a bucket is never split), reproducible by
    any engine.

    ``n_buckets`` must be in 1..256; powers of two divide the 256-
    value digit space exactly, other values carry a mild (≤1/256-per-
    bucket) skew.
    """
    if not 1 <= n_buckets <= 256:
        raise ValueError(
            f"n_buckets must be in 1..256 (two md5 hex digits), "
            f"got {n_buckets}")
    hi = _hex_digit_val(F.ascii(F.substring(F.md5(col), 31, 1)))
    lo = _hex_digit_val(F.ascii(F.substring(F.md5(col), 32, 1)))
    return ((hi * 16 + lo) % n_buckets).cast("int")


def bucket_lineage(extracted: DataFrame, run_id: str,
                   n_buckets: int = 8) -> DataFrame:
    """Per-partition lineage keyed by the portable url bucket — the
    oracle-checkable flavor of ``partition_lineage`` (same aggregates;
    the caller repartitions the input by the same bucket expression,
    so each lineage row covers a bucket that is co-located within one
    physical partition)."""
    return (
        extracted
        .withColumn("partition_id", portable_bucket(F.col("url"),
                                                    n_buckets))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_elements").alias("n_elements"),
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum(F.when(F.col("error").isNotNull(), 1)
                  .otherwise(0)).alias("n_errors"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def confidence_stats(extracted: DataFrame) -> DataFrame:
    """Per-(url, page) confidence banding — reference G10.

    Bands follow the reference's visualization thresholds
    (``ocr_visualization.py:47``): high ≥ 0.9, mid ≥ 0.7, low below.
    """
    el = extracted.select("url", F.explode("elements").alias("e")).select(
        "url",
        F.col("e.page_num").alias("page_num"),
        F.col("e.confidence").alias("confidence"),
    )
    return el.groupBy("url", "page_num").agg(
        F.count("*").alias("n_elements"),
        # decimal-exact sum then one double division: confidences are
        # 2-decimal values, so the mean is deterministic across
        # engines/partitionings (a double SUM is order-sensitive)
        (F.sum(F.col("confidence").cast("decimal(18,4)"))
         .cast("double") / F.count("*")).alias("avg_confidence"),
        F.sum(F.when(F.col("confidence") >= 0.9, 1).otherwise(0))
         .alias("n_high"),
        F.sum(F.when((F.col("confidence") >= 0.7)
                     & (F.col("confidence") < 0.9), 1).otherwise(0))
         .alias("n_mid"),
        F.sum(F.when(F.col("confidence") < 0.7, 1).otherwise(0))
         .alias("n_low"),
    )


def processing_summary(extracted: DataFrame,
                       fields: DataFrame) -> DataFrame:
    """Per-document summary counts — reference G11
    (``src/integration/orchestration.py:57-62``)."""
    per_doc_fields = fields.groupBy("url").agg(
        F.count("*").alias("n_extracted_fields"),
        F.sum(F.when(~F.col("is_valid"), 1).otherwise(0))
         .alias("n_validation_errors"),
    )
    return (
        extracted
        .select("url", "doc_kind", "page_count", "n_elements", "n_pairs")
        .join(per_doc_fields, "url", "left")
        .fillna({"n_extracted_fields": 0, "n_validation_errors": 0})
    )
