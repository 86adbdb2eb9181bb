"""Driver-mirror differential test: every catalog query with an oracle is
run on Spark and DuckDB over the same parquet and compared by schema,
row count and order-insensitive values (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from mysql_cdc_redis_spark.plans import all_queries

from .conftest import compare_with_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    ok, msg = compare_with_oracle(df, duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
