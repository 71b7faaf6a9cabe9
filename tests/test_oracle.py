"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet (sf0.001) and
compare row-multisets exactly (column-name-sorted, row-sorted, exact
values — floats must be bit-identical by construction, see
__spark_entry__ docstring)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPACE_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def dtype_kinds(df: pd.DataFrame) -> dict:
    return {c: df[c].dtype.kind for c in df.columns}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            # DuckDB may return Decimal for e.g. int/int expressions.
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (int,)):
                df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    spark_raw = q(spark, SF_DIR).toPandas()
    duck_raw = run_duck(entry_mod.oracle_sql()[name])
    # Strict dtype-family agreement: an int column on one side must not be
    # a float on the other (e.g. DuckDB HUGEINT -> float64), or the
    # driver's value hash can differ even when values are numerically
    # equal. 'O' (object/str) vs int is also a mismatch.
    sk, dk = dtype_kinds(spark_raw), dtype_kinds(duck_raw)
    mismatched = {
        c: (sk.get(c), dk.get(c))
        for c in set(sk) | set(dk)
        if sk.get(c) != dk.get(c)
    }
    assert not mismatched, f"{name}: dtype-kind mismatch {mismatched}"
    spark_pdf = normalize(spark_raw)
    duck_pdf = normalize(duck_raw)
    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: column mismatch {spark_pdf.columns} vs {duck_pdf.columns}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    pd.testing.assert_frame_equal(
        spark_pdf, duck_pdf, check_dtype=False, check_exact=True,
        obj=name,
    )


def test_every_query_is_oracled():
    # Round 2: no rows-only queries remain — every registered query has a
    # full SQL oracle.
    rows_only = sorted(
        set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    )
    assert rows_only == []


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
