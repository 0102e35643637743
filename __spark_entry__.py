"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke: the extraction engine applied to
the sf0.001 documents table wrapped as HTML pages.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family from SURVEY.md §2 plus the training-data operators (dedup,
similarity search, text analysis, multimodal). Every query has an
oracle: the extraction/media tail is checked through the golden
materialization in ``credit_ocr_system_spark/oracle_golden.py`` (the
pure-Python kernel runs driver-side and the SQL either re-derives the
relational tail or reads the independently-computed golden), on top
of the byte-identical golden-file pytest suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable on executors regardless of CWD."""
    try:
        from credit_ocr_system_spark.session import make_pyfiles_zip

        spark.sparkContext.addPyFile(make_pyfiles_zip())
    except Exception:
        pass  # already shipped, or local single-process mode


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    from credit_ocr_system_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from credit_ocr_system_spark.queries import build_queries

    built = build_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in built.items()}


def oracle_sql() -> dict[str, str]:
    from credit_ocr_system_spark.queries import build_oracles

    return build_oracles()
