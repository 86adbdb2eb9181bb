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


def test_order_by_scanner_word_boundaries_and_quoted_identifiers():
    """Round-3 ADVICE: (a) ORDER must be a whole word — an identifier
    ending in 'order' followed by BY, or ORDER followed by a longer
    word, is not a clause; (b) double-quoted identifiers are opaque —
    an apostrophe or paren inside "..." must not desynchronize the
    string/depth state."""
    from mysql_cdc_redis_spark.plans.catalog import _split_trailing_order_by

    # identifier ending in 'order' + BY column: not a clause boundary
    head, tail = _split_trailing_order_by("SELECT preorder BY_col FROM t")
    assert tail == ""
    # ORDER followed by a longer word is not ORDER BY
    head, tail = _split_trailing_order_by("SELECT a FROM t_order BYTES_x")
    assert tail == ""
    # real clause still found when preceded by ')' or whitespace
    head, tail = _split_trailing_order_by("SELECT count(*) FROM t ORDER BY 1")
    assert tail.strip() == "ORDER BY 1"
    # apostrophe inside a quoted identifier must not open a string span
    head, tail = _split_trailing_order_by(
        'SELECT "it\'s a col" FROM t ORDER BY "it\'s a col"'
    )
    assert tail.strip() == 'ORDER BY "it\'s a col"'
    # paren inside a quoted identifier must not skew the depth counter
    head, tail = _split_trailing_order_by('SELECT "a(b" AS c FROM t ORDER BY c')
    assert tail.strip() == "ORDER BY c"
    # ORDER BY inside a quoted identifier is not a clause
    head, tail = _split_trailing_order_by('SELECT "order by x" FROM t')
    assert tail == ""


def test_cast_wrapper_keeps_limit_inside_when_order_cols_are_cast():
    """Round-3 ADVICE: hoisting ORDER BY+LIMIT above the cast projection
    would re-rank by POST-cast values — if an ORDER BY column is itself
    cast, collapsed ties could select a different top-N.  The wrapper
    must keep the whole clause inside in exactly that case, and still
    hoist when no cast touches the ordering or there is no LIMIT."""
    from mysql_cdc_redis_spark.plans import catalog as cat

    def wrap(sql, cols, casts):
        # call through the private API the way register() does, with a
        # temporary synthetic cast entry
        from mysql_cdc_redis_spark.plans.oracle_casts import ORACLE_CASTS

        name = "__limit_hoist_probe__"
        ORACLE_CASTS[name] = (cols, casts)
        try:
            return cat._apply_oracle_casts(name, sql)
        finally:
            del ORACLE_CASTS[name]

    # cast column in ORDER BY + LIMIT: clause stays inside the subquery
    w = wrap(
        "SELECT a, b FROM t ORDER BY b DESC LIMIT 3",
        ("a", "b"),
        {"b": "DOUBLE"},
    )
    assert w.rstrip().endswith("AS __typed_oracle"), w
    assert "LIMIT 3" in w  # still inside the inner query
    # no LIMIT: hoist is safe (hash is order-insensitive; ordering
    # guarantee preserved at top level)
    w = wrap("SELECT a, b FROM t ORDER BY b DESC", ("a", "b"), {"b": "DOUBLE"})
    assert w.rstrip().endswith("ORDER BY b DESC"), w
    # LIMIT but ordering column not cast: hoist (pre/post-cast ranking
    # identical for uncast columns)
    w = wrap(
        "SELECT a, b FROM t ORDER BY a LIMIT 3", ("a", "b"), {"b": "DOUBLE"}
    )
    assert w.rstrip().endswith("ORDER BY a LIMIT 3"), w


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
        # mirror the wrapper's LIMIT guard: when the tail carries a LIMIT
        # and an ordering identifier is itself cast, the clause is
        # deliberately kept inside (pre-cast top-N semantics)
        import re

        if re.search(r"\bLIMIT\b", tail, re.IGNORECASE):
            idents = {
                ident.lower()
                for ident in re.findall(
                    r"[A-Za-z_][A-Za-z_0-9]*", re.sub(r"'(?:[^']|'')*'", "", tail)
                )
            }
            if idents & {c.lower() for c in _casts}:
                continue
        wrapped = _QUERIES[name].oracle
        _whead, wtail = _split_trailing_order_by(wrapped)
        assert wtail.strip(), f"{name}: trailing ORDER BY lost by cast wrapper"
        checked += 1
    assert checked > 0, "guard vacuous: no wrapped oracle with trailing ORDER BY"
