"""Bucketed-table co-located joins (plans/bucketed.py).

The claims, each asserted against the physical plan and the values:
a join between two identically-bucketed tables carries no Exchange
and no Sort; an equality filter on the bucket key prunes to one
bucket; and the result is value-identical to the plain join.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import textops as T
from credit_ocr_system_spark.plans.bucketed import (
    colocated_join,
    write_bucketed,
)

N_BUCKETS = 8


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = R.load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source", "lang")
    counts = T.token_counts(R.load(spark, sf_dir, "documents"))
    write_bucketed(docs, "bt_docs", "doc_id", N_BUCKETS)
    write_bucketed(counts, "bt_counts", "doc_id", N_BUCKETS)
    yield "bt_docs", "bt_counts", docs, counts
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_counts")


def test_colocated_join_has_no_exchange_or_sort(spark, bucketed_tables):
    left, right, _, _ = bucketed_tables
    plan = plan_of(colocated_join(spark, left, right, "doc_id"))
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "Exchange" not in plan  # the write-time shuffle bought it
    assert "Sort (" not in plan    # sortBy bought the merge order too


def test_join_values_identical_to_plain_join(spark, bucketed_tables):
    left, right, docs, counts = bucketed_tables
    got = (colocated_join(spark, left, right, "doc_id")
           .orderBy("doc_id").toPandas())
    want = (docs.join(counts, "doc_id")
            .select(*got.columns).orderBy("doc_id").toPandas())
    assert got.equals(want)


def test_bucket_key_filter_prunes_to_one_bucket(spark, bucketed_tables):
    # auto-bucketed-scan downgrades a joinless read to a plain scan
    # (losing pruning); a deployment that point-reads a bucketed
    # table pins it off for that query, as here
    left, _, _, _ = bucketed_tables
    flag = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark.conf.set(flag, "false")
    try:
        plan = plan_of(spark.table(left).where(F.col("doc_id") == 7))
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan
    finally:
        spark.conf.set(flag, "true")


def test_append_mode_rejected(spark, bucketed_tables):
    """append would put a second file in each bucket and silently
    void the write-time sort order every zero-sort join relies on."""
    _, _, docs, _ = bucketed_tables
    with pytest.raises(ValueError, match="one-file-per-bucket"):
        write_bucketed(docs, "bt_docs", "doc_id", N_BUCKETS,
                       mode="append")
