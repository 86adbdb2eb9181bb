"""Shared pytest fixtures: one SparkSession per test run, plus the
DuckDB differential harness that mirrors the driver's t2 check."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql_cdc_redis_spark.session import get_spark  # noqa: E402
from mysql_cdc_redis_spark.sources.tables import TABLES  # noqa: E402

# default to sf0.01 — the scale the driver's t2 correctness gate runs at
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise below the driver's hash granularity
        return round(v, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    if isinstance(v, bytes):
        return v
    return v


def rows_to_multiset(columns, rows):
    """Sort columns by name (like the driver), normalize cells, return a
    sorted list of tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare_with_oracle(spark_df, duck_con, oracle: str):
    """Returns (ok, message) comparing a Spark result against DuckDB."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sm = rows_to_multiset(s_cols, s_rows)
    dm = rows_to_multiset(d_cols, d_rows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        return False, f"value mismatch; first diffs (spark vs duck): {diffs}"
    return True, "ok"
