"""Z-order (Morton) clustering: multi-dimensional data skipping.

The bucketed tables (``plans/bucketed.py``) buy exchange-free JOINS on
one key; this buys SCAN pruning on TWO filter dimensions at once. A
single-column sort clusters min/max file statistics perfectly for that
column and not at all for any other — a 2D box query (``user BETWEEN …
AND day BETWEEN …``) over a time-sorted table still touches every
file. Interleaving the bits of both keys (the Morton / Z-order curve)
makes file min/max ranges tight in BOTH dimensions simultaneously, so
a stats-based reader (parquet row-group stats, Iceberg file metrics)
prunes on either predicate — the layout trick behind Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order transforms, here as a
plain DataFrame write:

* ``zvalue`` is a pure codegen expression (shift/mask/or fold — no
  UDF), identical arithmetic in the DuckDB oracle;
* the write is ONE range exchange on the z-value plus a partition-
  local sort — the same pay-once-at-write, amortize-over-every-read
  story as the bucketed tables;
* the skipping claim is MEASURED, not asserted: the test reads back
  per-file min/max boxes and counts how many a 2D box query
  intersects under z-order vs a linear sort
  (``tests/test_zorder.py``).

At 10^12 rows the range exchange is the job's one shuffle and the
sampling-based range boundaries are computed by Spark's
RangePartitioner from a row sample — no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension -> 32-bit z-values: enough for 65536 range
# buckets per dimension, far beyond the file count any one table
# needs for pruning. Callers quantize wider domains down first
# (day numbers, id mod, quantile buckets for doubles).
ZBITS = 16


def zvalue(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton code of two bounded non-negative ints: bit i of ``a``
    lands at position 2i+1, bit i of ``b`` at 2i. Pure shift/mask/or
    expression tree (whole-stage codegen, no UDF); the identical
    arithmetic runs in the DuckDB oracle (``zorder_keys``)."""
    mask = (1 << bits) - 1
    a = a.cast("bigint").bitwiseAND(F.lit(mask))
    b = b.cast("bigint").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        # Column.__or__ is LOGICAL or — bitwiseOR is the operator here
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                        2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                        2 * i))
    return z


def zvalue_sql(a: str, b: str, bits: int = ZBITS) -> str:
    """The DuckDB twin of :func:`zvalue` — same shift/mask/or fold."""
    mask = (1 << bits) - 1
    am = f"(CAST({a} AS BIGINT) & {mask})"
    bm = f"(CAST({b} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, a: Column, b: Column,
                   n_files: int = 16, bits: int = ZBITS) -> None:
    """Write ``df`` clustered along the z-curve of (a, b): one range
    exchange on the z-value, a partition-local sort (keeps row groups
    tight WITHIN each file too), one file per partition."""
    (df.withColumn("_z", zvalue(a, b, bits))
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def file_boxes(spark, path: str, a_col: str, b_col: str) -> DataFrame:
    """Per-file min/max bounding boxes of the two dimensions — exactly
    the statistics a pruning reader consults. Used to MEASURE skipping
    (files whose box misses the query box are never opened)."""
    return (spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("file"))
            .agg(F.min(a_col).alias("a_min"), F.max(a_col).alias("a_max"),
                 F.min(b_col).alias("b_min"), F.max(b_col).alias("b_max")))


def files_hit(boxes: DataFrame, a_lo, a_hi, b_lo, b_hi) -> int:
    """How many files a stats-based reader must open for the 2D box
    query ``a BETWEEN a_lo AND a_hi AND b BETWEEN b_lo AND b_hi``."""
    return (boxes.where((F.col("a_max") >= a_lo) & (F.col("a_min") <= a_hi)
                        & (F.col("b_max") >= b_lo) & (F.col("b_min") <= b_hi))
            .count())


def zorder_keys(events: DataFrame) -> DataFrame:
    """The oracle-checked z-value computation over the events table:
    Morton code of (user_id, epoch-day of ts) — the clustering key
    ``write_zordered`` sorts by. DuckDB recomputes the identical
    shift/mask/or fold (``zvalue_sql``)."""
    day = F.datediff(F.to_date(F.col("ts")),
                     F.to_date(F.lit("1970-01-01")))
    return events.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        day.cast("int").alias("day"),
        zvalue(F.col("user_id"), day).alias("z"))
