"""Z-order clustering (plans/zorder.py).

Pins three claims: the Morton code matches a pure-Python reference,
the write is one range exchange (plan), and — the point — a 2D box
query prunes FAR more files under z-order than under a linear sort,
measured from the same per-file min/max statistics a real reader
consults.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from credit_ocr_system_spark.plans.zorder import (
    file_boxes,
    files_hit,
    write_zordered,
    zvalue,
    zvalue_sql,
)


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 127, 65535, 70000)
            for b in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {(r.a, r.b): r.z for r in df.select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")).collect()}
    for a, b in rows:
        assert got[(a, b)] == _morton_py(a & 0xFFFF, b & 0xFFFF), (a, b)


def test_zvalue_sql_twin_matches(spark):
    import duckdb

    rows = [(a, b) for a in (0, 7, 1234, 65535) for b in (0, 9, 40000)]
    duck = duckdb.connect()
    for a, b in rows:
        (z,) = duck.execute(
            f"SELECT {zvalue_sql(str(a), str(b))}").fetchone()
        assert z == _morton_py(a, b), (a, b)


@pytest.fixture(scope="module")
def grid_df(spark):
    # 40k points on a 200x200 grid, row-major (so a linear sort on
    # either single column leaves the OTHER dimension unclustered)
    return spark.range(40000).select(
        (F.col("id") % 200).alias("a"),
        (F.col("id") / 200).cast("bigint").alias("b"))


def test_zorder_prunes_2d_box_queries(spark, grid_df, tmp_path):
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid_df, zpath, F.col("a"), F.col("b"), n_files=16)
    # linear baseline: same file count, clustered on a alone
    (grid_df.repartitionByRange(16, "a").sortWithinPartitions("a")
     .write.mode("overwrite").parquet(lpath))

    zbox = file_boxes(spark, zpath, "a", "b").cache()
    lbox = file_boxes(spark, lpath, "a", "b").cache()
    assert zbox.count() == 16 and lbox.count() == 16

    # box query on ~1/16 of each dimension (1/256 of the area)
    z_hits = files_hit(zbox, 40, 52, 40, 52)
    l_hits = files_hit(lbox, 40, 52, 40, 52)
    # linear layout: the 'a' range maps to ~1-2 files, but each file
    # spans ALL of b — pruning only via a. z-order: both dims tight.
    assert z_hits <= 4
    # a-range of width 13/200 over 16 a-clustered files -> ~1-2 files:
    # the linear layout is GOOD for this box; now flip the dims
    z_hits_b = files_hit(zbox, 0, 199, 40, 52)     # b-only predicate
    l_hits_b = files_hit(lbox, 0, 199, 40, 52)
    assert l_hits_b == 16          # linear-on-a cannot prune on b
    assert z_hits_b <= 8           # z-order prunes the orthogonal dim
    assert z_hits_b < l_hits_b

    # correctness: both layouts return identical query results
    q = lambda p: (spark.read.parquet(p)
                   .where("a between 40 and 52 and b between 40 and 52")
                   .count())
    assert q(zpath) == q(lpath) == 13 * 13


def test_write_is_one_range_exchange(spark, grid_df, tmp_path):
    buf = io.StringIO()
    df = (grid_df.withColumn("_z", zvalue(F.col("a"), F.col("b")))
          .repartitionByRange(16, "_z").sortWithinPartitions("_z"))
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 2  # one node: tree + detail
    assert "rangepartitioning" in plan
