"""Sketch-aggregate accuracy bounds: the approx-percentile entry has no
DuckDB oracle (engine-specific sketch), so this test bounds its error
against the exact quantile instead."""

from __future__ import annotations

import duckdb

from mysql_cdc_redis_spark.plans import all_queries


def test_approx_percentile_within_tolerance(spark, sf_dir):
    row = (
        all_queries()["agg_approx_percentile_price"].fn(spark, sf_dir).collect()[0]
    )
    con = duckdb.connect()
    exact = con.execute(
        f"""SELECT quantile_cont(o_totalprice, [0.5, 0.9, 0.99]), count(*)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()
    (e50, e90, e99), n = exact
    assert row["n"] == n
    # accuracy=10000 => rank error <= n/10000; translate to a loose value
    # tolerance of 2% of the value range
    spread = 0.02 * 500000
    for got, want in [(row["p50"], e50), (row["p90"], e90), (row["p99"], e99)]:
        assert abs(got - want) <= spread, f"{got} vs exact {want}"
