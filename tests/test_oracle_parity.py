"""Mini-driver: every oracle-checked query must match DuckDB exactly.

Replicates the real driver's check (row count + column names +
order-insensitive values) at sf0.001 so mismatches surface in pytest
before the per-round verification at sf0.01.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spark_df = _QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(_ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), name
    assert len(spark_df) == len(duck_df), (
        f"{name}: spark {len(spark_df)} rows vs duckdb {len(duck_df)}")

    a = _normalize(spark_df)
    b = _normalize(duck_df)
    mismatches = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # numpy scalars → python for uniform comparison
            x = x.item() if hasattr(x, "item") else x
            y = y.item() if hasattr(y, "item") else y
            if pd.isna(x) and pd.isna(y):
                continue
            if (pd.isna(x) != pd.isna(y)) or not _values_equal(x, y):
                mismatches.append((col, i, x, y))
                if len(mismatches) > 5:
                    break
    assert not mismatches, f"{name}: {mismatches[:5]}"


def test_every_query_has_an_oracle():
    # since round 2 the extraction/media tail is oracled through the
    # golden materialization — no query is rows-only anymore
    missing = [n for n in _QUERIES if n not in _ORACLES]
    assert not missing, f"queries without oracles: {missing}"


def test_extraction_queries_return_rows(spark, sf_dir):
    for name in ("x_extract_pages", "x_extract_fields",
                 "x_extract_lineage"):
        df = _QUERIES[name](spark, sf_dir)
        assert df.count() > 0, name


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
