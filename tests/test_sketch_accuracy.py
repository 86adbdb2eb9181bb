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


def test_hll_sketch_union_within_tolerance(spark, sf_dir):
    """Datasketches HLL at lgK=14: relative standard error ≈ 1.04/√2^14
    ≈ 0.8%; assert 3σ.  The union row must estimate the GLOBAL distinct
    (users appear under many event types, so Σ per-type ≫ union)."""
    rows = {
        r["event_type"]: r["n_users_est"]
        for r in all_queries()["agg_hll_sketch_users"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    exact_all, = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert abs(rows["ALL"] - exact_all) <= max(3, 0.025 * exact_all)
    for et, est in rows.items():
        if et == "ALL":
            continue
        exact, = con.execute(
            f"""SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'
                WHERE event_type = ?""",
            [et],
        ).fetchone()
        assert abs(est - exact) <= max(3, 0.025 * exact), (et, est, exact)
    # union < sum of parts (overlapping users), sanity that union merged
    assert rows["ALL"] <= sum(v for k, v in rows.items() if k != "ALL")


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """HLL++ (approx_count_distinct, rsd=0.01 per the entry): assert the
    estimate lands within 5% of the exact per-type distinct count."""
    rows = all_queries()["agg_approx_distinct_users"].fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    for r in rows:
        et = r["event_type"]
        exact, = con.execute(
            f"""SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'
                WHERE event_type = ?""",
            [et],
        ).fetchone()
        est = r[[c for c in rows[0].asDict() if c != "event_type"][0]]
        assert abs(est - exact) <= max(3, 0.05 * exact), (et, est, exact)
