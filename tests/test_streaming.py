"""Structured Streaming: exactly-once file ingestion + event-time agg."""

import os

from credit_ocr_system_spark.sources.pages import pages_df
from credit_ocr_system_spark.streaming.extraction_stream import (
    read_pages_stream,
    stream_extract,
    windowed_page_stats,
)


def test_stream_extract_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages_df(spark, 40, partitions=2).write.parquet(
        input_dir, mode="overwrite")

    q = stream_extract(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(output_dir)
    assert got.count() == 40
    assert got.select("url").distinct().count() == 40

    # restart with the same checkpoint: nothing new → no duplicates
    q2 = stream_extract(spark, input_dir, output_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(output_dir).count() == 40

    # new file lands → only the delta is processed (rows 40..59 of the
    # same deterministic corpus, selected by their synthetic warc_ts)
    pages_df(spark, 60, partitions=2).where(
        "warc_ts >= timestamp'2024-01-01 00:00:40'"
    ).write.mode("append").parquet(input_dir)
    q3 = stream_extract(spark, input_dir, output_dir, ckpt)
    q3.awaitTermination(120)
    final = spark.read.parquet(output_dir)
    assert final.count() > 40
    assert final.groupBy("url").count().where("count > 1").count() == 0


def test_windowed_page_stats(spark, tmp_path):
    input_dir = str(tmp_path / "win_in")
    pages_df(spark, 50, partitions=2).write.parquet(
        input_dir, mode="overwrite")
    stream = read_pages_stream(spark, input_dir)
    agg = windowed_page_stats(stream, window="30 seconds",
                              watermark="1 minute")
    q = (agg.writeStream.format("memory").queryName("win_stats")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from win_stats").collect()
    assert sum(r["n_pages"] for r in rows) == 50
    assert all(r["bytes_in"] > 0 for r in rows)
    assert {r["lang"] for r in rows} <= {"en", "de"}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered urls inside the watermark horizon are dropped;
    state is keyed per url (first-seen wins)."""
    from pyspark.sql import functions as F

    from credit_ocr_system_spark.streaming.extraction_stream import (
        stream_dedup_pages,
    )

    input_dir = str(tmp_path / "dup_in")
    out_dir = str(tmp_path / "dup_out")
    ckpt = str(tmp_path / "dup_ckpt")

    base = pages_df(spark, 30, partitions=2)
    base.write.parquet(input_dir, mode="overwrite")
    # re-deliver the same 30 pages 2 minutes later (inside watermark)
    base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 MINUTES")
    ).write.mode("append").parquet(input_dir)

    deduped = stream_dedup_pages(read_pages_stream(spark, input_dir))
    q = (deduped.select("url", "warc_ts").writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == 30
    assert got.select("url").distinct().count() == 30
