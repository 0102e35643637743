"""Persistent bucketed tables: exchange-free co-located joins.

At 100 TB the dominant shuffle in a doc-keyed pipeline is
re-partitioning the corpus every time two doc-keyed tables meet — the
extracted pages, their token counts, their quality scores, their dedup
assignments all share the key, and a naive plan pays an Exchange per
join per run. Spark's durable answer is bucketing
(``df.write.bucketBy(N, key).sortBy(key)``): the table is written
pre-hash-partitioned AND pre-sorted into N bucket files per partition,
the layout is recorded in the catalog, and from then on

* an equi-join between two tables bucketed the same way is a
  **zero-exchange, zero-sort** sort-merge join — each task zips bucket
  *i* of both sides; the shuffle is paid once at write time and
  amortized over every subsequent join;
* an equality filter on the bucket key **prunes to one bucket**
  (``SelectedBucketsCount: 1 out of N`` in the scan), the file-level
  analogue of partition pruning for high-cardinality keys where
  directory partitioning would explode.

Both properties are plan-guarded in ``tests/test_bucketed.py``; the
join result is value-identical to the plain join by construction
(bucketing is physical layout, not semantics — asserted in the same
test). Bucket count is a layout-time choice: at 10^12 rows pick
buckets so each holds ~128 MB–1 GB (e.g. 2^15 buckets/partition);
joins require only that both sides agree (or divide evenly, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

The reference has no persistent storage layout at all (every stage is
a JSON blob re-fetched per document, `/root/reference/src/storage/
storage.py:199-219`); this module is the Spark-native replacement for
"re-read the stage you just wrote" — read it back co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) by ``key``. The one-time shuffle that buys every later
    join its Exchange back.

    ``mode='append'`` is rejected: a second write would put a second
    file in every bucket, and Spark only trusts (and reuses) the
    write-time sort order when a bucket is a single file — the
    appended table would silently regain a per-join Sort, the exact
    cost this module exists to eliminate. To grow a bucketed table,
    union the delta with the existing rows and rewrite (the one-time
    shuffle is the layout's price), or keep deltas in a separate
    bucketed table with the same (key, n_buckets) — bucket-local
    union still avoids the exchange.
    """
    if mode == "append":
        raise ValueError(
            "write_bucketed(mode='append') would break the one-file-"
            "per-bucket invariant the zero-sort co-located joins rely "
            "on; rewrite the table (union delta + overwrite) or keep "
            "deltas in a second identically-bucketed table")
    # one file per bucket: Spark only trusts (and reuses) the
    # write-time sort order when a bucket is a single file, so the
    # writer co-locates each bucket's rows in one task first. This IS
    # the one-time shuffle the layout pays for.
    from pyspark.sql import functions as F

    w = (df.repartition(n_buckets, F.col(key))
         .write.mode(mode).format("parquet")
         .bucketBy(n_buckets, key))
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left: str, right: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    The ``merge`` hint pins the sort-merge strategy (a small side
    would otherwise broadcast, which also avoids the exchange but
    wouldn't generalize to two corpus-sized tables — the case
    bucketing exists for). With both sides bucketed+sorted on ``key``
    the plan contains NO Exchange and NO Sort.
    """
    a = spark.table(left)
    b = spark.table(right)
    return a.hint("merge").join(b, key, how)
