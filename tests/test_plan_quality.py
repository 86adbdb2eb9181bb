"""Physical-plan regression tests (the 100 TB guardrails): filters must
reach the parquet scan, tiny dims must broadcast, columns must prune,
and compaction must stay a single-shuffle plan.  These lock in the
.explain() properties the operators were tuned for."""

from __future__ import annotations

from mysql_cdc_redis_spark.operators.compaction import compact
from mysql_cdc_redis_spark.plans import all_queries
from mysql_cdc_redis_spark.sources.changelog import (
    ORDERS_PAYLOAD,
    ORDERS_PK,
    orders_changelog,
)

_QUERIES = all_queries()


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_revenue_query_broadcasts_dims_and_pushes_filters(spark, sf_dir):
    plan = _plan(_QUERIES["join_revenue_by_nation"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "dim joins must be broadcast, not shuffle"
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "PushedFilters: [" in plan
    # the orderdate range predicate must reach the orders parquet scan
    assert "GreaterThanOrEqual(o_orderdate" in plan, "date filter not pushed to scan"


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = _plan(_QUERIES["agg_pricing_summary"].fn(spark, sf_dir))
    # lineitem has 11 columns; the scan must read only the 7 used
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema
    # shipdate predicate pushed into the scan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_compaction_is_single_shuffle(spark, sf_dir):
    import re

    ch = orders_changelog(spark, sf_dir)
    plan = _plan(compact(ch, ORDERS_PK, ORDERS_PAYLOAD))
    # formatted mode lists every node once in the tree and once in the
    # detail section — count the unique "(n) Exchange" detail headers
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"compaction must shuffle exactly once, saw {n_exchanges}:\n{plan}"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(_QUERIES["topk_largest_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "global top-k must not full-sort"


def test_whole_stage_codegen_in_hot_paths(spark, sf_dir):
    import contextlib
    import io

    # AQE wraps the un-executed plan in AdaptiveSparkPlan, which reports 0
    # codegen subtrees until runtime — turn it off for the static check.
    # Build the DataFrames FIRST: load_table self-configures the session
    # (ensure_session_confs) and would re-enable AQE; physical planning
    # reads the conf at explain time, after we disable it.
    for name in ("agg_pricing_summary", "text_quality_profile", "dedup_simhash"):
        df = _QUERIES[name].fn(spark, sf_dir)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("codegen")
            head = buf.getvalue().splitlines()[0]
            # "Found N WholeStageCodegen subtrees." — the hot path must codegen
            assert "WholeStageCodegen subtrees" in head and not head.startswith(
                "Found 0"
            ), f"{name} fell out of codegen: {head}"
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
