"""Regression guard for the round-2 flagship red gate.

The driver's correctness gate hashes values AFTER a dtype-sensitive
canonicalization, so an oracle whose DuckDB result materializes as float64
(e.g. ``sum(BIGINT)`` -> HUGEINT -> float64 in ``fetchdf``) hash-mismatches
a value-identical int64 Spark result.  Round 2's ``bm25_topk`` red was
exactly this (VERDICT.md round 2, "What's wrong" #1).

This test runs EVERY ``oracle_sql()`` through DuckDB at sf0.001 and asserts
no result column is floating point — all engine outputs are integers or
strings by design, so a float column in an oracle is always a missing CAST.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_DTYPES", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_result_has_no_float_columns(ddb, name):
    sql = entrymod.oracle_sql()[name]
    pdf = ddb.sql(sql).df()
    floaty = [c for c in pdf.columns
              if pd.api.types.is_float_dtype(pdf[c].dtype)]
    assert not floaty, (
        f"{name}: oracle columns {floaty} materialize as float "
        f"({[str(pdf[c].dtype) for c in floaty]}) — add CAST(... AS BIGINT) "
        "in the SQL so the driver's hash compare sees int64 like Spark does")
