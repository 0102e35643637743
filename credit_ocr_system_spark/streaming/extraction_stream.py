"""Structured Streaming ingestion for the extraction pipeline.

The reference has no event-time processing — its Celery queues are
work distribution, not streams (SURVEY.md §1.4) — so the batch path is
primary. This module exists for the continuous-ingestion deployment
mode: new page files land in a directory (the micro-batch analogue of
a crawl feed), the same Arrow kernel runs unchanged on the streaming
DataFrame, and the checkpoint gives exactly-once output — the
streaming twin of the batch snapshot/resume story.

``trigger(availableNow=True)`` drains everything pending and stops —
the deployment shape for incremental backfills; remove it for a
long-running continuous job. ``windowed_element_counts`` shows the
event-time side: per-window extracted-element counts with a watermark
for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import extract_pages
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None
                      ) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.load(input_dir)


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, available_now: bool = True):
    """pages dir → kernel → parquet sink, exactly-once via checkpoint.

    Returns the StreamingQuery; caller awaits termination. Re-running
    with the same checkpoint skips already-committed files — restart
    safety comes from the checkpoint's file-source log, not from any
    custom bookkeeping.
    """
    pages = read_pages_stream(spark, input_dir)
    extracted = extract_pages(pages).drop("elements")
    writer = (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_page_stats(pages_stream: DataFrame,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed ingest stats with a late-data watermark.

    Aggregates the crawl feed by event time (``warc_ts``): page and
    byte counts per (window, lang). Late arrivals within the watermark
    update their window; older ones are dropped — the standard
    watermark + window pattern, usable as a streaming ingest monitor
    in front of the batch extraction job.
    """
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("html")).alias("bytes_in"))
    )


def stream_dedup_pages(pages_stream: DataFrame,
                       watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact-dedup on url within a watermark horizon.

    A crawl feed re-delivers urls (re-fetches, at-least-once upstream
    queues); ``dropDuplicatesWithinWatermark`` keeps first-seen per
    url while bounding the dedup state: keys older than the watermark
    are evicted, so state size is (arrival rate × horizon), not the
    full corpus — the property that keeps streaming dedup viable at
    crawl scale. Exactly the streaming twin of the batch
    ``exact_dedup``/resume anti-join.
    """
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
