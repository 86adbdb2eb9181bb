"""Catalog-wide oracle TYPE audit — the regression gate for round 1's one
systemic defect (VERDICT.md "What's wrong #1"): DuckDB binding integer
sums as HUGEINT / rounded aggregates as DECIMAL where Spark emits
bigint/int/double.  Values were identical, but the driver's value-hash is
type-sensitive, so 14/50 sampled queries failed on types alone.

Every oracle is BOUND in DuckDB (no execution) and every Spark plan is
ANALYZED (no execution); the canonicalized per-column types must agree
exactly.  plans/oracle_casts.py (generated) holds the casts that make
this pass; if a new query trips this test, regenerate with
tools/audit_oracle_types.py + tools/gen_oracle_casts.py or fix the SQL.
"""

from __future__ import annotations

import pytest

from mysql_cdc_redis_spark.plans import all_queries
from mysql_cdc_redis_spark.plans.typecheck import oracle_type_mismatches

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_types_match_spark_schema(spark, duck, sf_dir, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    rel = duck.sql(q.oracle)
    mism = oracle_type_mismatches(df, rel)
    assert not mism, f"{name}: oracle/Spark type mismatch {mism}"


def test_no_hugeint_or_stray_decimal_binds():
    """Belt-and-braces: no oracle may bind a HUGEINT column at all, and the
    cast map itself must be internally consistent (every cast column is in
    the recorded projection)."""
    from mysql_cdc_redis_spark.plans.oracle_casts import ORACLE_CASTS

    for name, (cols, casts) in ORACLE_CASTS.items():
        assert set(casts) <= set(cols), name
        assert name in _QUERIES, f"stale cast entry {name}"


def test_order_by_hoist_scanner_skips_comments():
    """The cast wrapper re-appends a query's trailing ORDER BY at the
    top level (subquery ordering does not propagate, per SQL).  The
    scanner must not let an apostrophe inside a `--` or `/* */` comment
    toggle its string-literal state — doc prose like "DuckDB's" would
    otherwise hide the trailing ORDER BY (or worse, desynchronize the
    paren-depth count and hoist a nested one)."""
    from mysql_cdc_redis_spark.plans.catalog import _split_trailing_order_by

    head, tail = _split_trailing_order_by(
        "SELECT a FROM t\n-- the side's tie-break can't rely on DuckDB's order\nORDER BY a"
    )
    assert tail.strip() == "ORDER BY a"
    # a nested ORDER BY after a comment apostrophe must stay nested
    head, tail = _split_trailing_order_by(
        "SELECT a, row_number() OVER (ORDER BY b) r FROM t /* don't */"
    )
    assert tail == ""
    # unterminated trailing comment: no scan past end, no false hoist
    head, tail = _split_trailing_order_by("SELECT a FROM t -- order by a")
    assert tail == ""


def test_every_cast_wrapped_oracle_keeps_top_level_order_by():
    """End-to-end guard for the hoist: for every cast-wrapped oracle whose
    ORIGINAL sql carries a trailing top-level ORDER BY that binds to
    output columns, the WRAPPED sql must also end with a top-level
    ORDER BY — the ordering guarantee must survive the wrapping."""
    from mysql_cdc_redis_spark.plans.catalog import (
        _split_trailing_order_by,
        _tail_binds_to,
    )
    from mysql_cdc_redis_spark.plans.oracle_casts import ORACLE_CASTS

    checked = 0
    for name, q in _QUERIES.items():
        raw = q.raw_oracle
        if name not in ORACLE_CASTS or not raw:
            continue
        cols, _casts = ORACLE_CASTS[name]
        _head, tail = _split_trailing_order_by(raw)
        if not tail or not _tail_binds_to(tail, cols):
            continue
        wrapped = _QUERIES[name].oracle
        _whead, wtail = _split_trailing_order_by(wrapped)
        assert wtail.strip(), f"{name}: trailing ORDER BY lost by cast wrapper"
        checked += 1
    assert checked > 0, "guard vacuous: no wrapped oracle with trailing ORDER BY"
