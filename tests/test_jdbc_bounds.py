"""Unit tests for the JDBC partition-bound math (sources/jdbc.py) — the
parallel-snapshot logic that matters at scale, testable without a
database."""

import pytest

from mysql_cdc_redis_spark.sources.jdbc import (
    information_schema_query,
    partition_bounds,
)


def test_bounds_cover_range_without_overlap():
    b = partition_bounds(0, 99, 4)
    assert b == [(0, 25), (25, 50), (50, 75), (75, 100)]
    # contiguous, covering, half-open
    assert b[0][0] == 0 and b[-1][1] == 100
    for (s1, e1), (s2, e2) in zip(b, b[1:]):
        assert e1 == s2


def test_bounds_more_partitions_than_keys():
    b = partition_bounds(10, 12, 8)
    assert b[0][0] == 10 and b[-1][1] == 13
    assert len(b) <= 8


def test_bounds_uneven_stride_last_takes_remainder():
    b = partition_bounds(0, 10, 3)
    assert b[-1][1] == 11
    assert sum(e - s for s, e in b) == 11


def test_bounds_errors():
    with pytest.raises(ValueError):
        partition_bounds(0, 10, 0)
    with pytest.raises(ValueError):
        partition_bounds(10, 0, 2)


def test_information_schema_query_shape():
    q = information_schema_query("tpch")
    assert "information_schema.columns" in q and "table_schema = 'tpch'" in q
