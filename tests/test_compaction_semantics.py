"""Semantics unit tests for the compaction algebra (SURVEY.md §5.2-5.3):
the full 3x3 action-pair table of rcache.py:196-222, sequence tests,
annihilation/epoch-reset, and the idempotent-replay property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_redis_spark.operators.compaction import (
    compact,
    reject_null_keys,
    rid_expr,
    with_rid,
)

PK = ("id",)
PAYLOAD = ("id", "v")


def _changelog(spark, events):
    """events: list of (seq, id, action, v)."""
    return spark.createDataFrame(
        [(int(s), i, a, v, "t") for s, i, a, v in events],
        "seq long, id int, cdc_action string, v string, tbl string",
    )


def _compact_map(spark, events):
    df = compact(_changelog(spark, events), PK, PAYLOAD)
    return {r["rid"]: (r["cdc_action"], r["v"]) for r in df.collect()}


# --- the 3x3 pair table (old action x new action), rcache.py:196-222 ----
# (old, new) -> expected final action, or None if the row must vanish
PAIR_TABLE = [
    ("insert", "insert", "insert"),   # rcache.py: other pairs keep new
    ("insert", "update", "insert"),   # rcache.py:208-209
    ("insert", "delete", None),       # annihilation, rcache.py:214-215
    ("update", "insert", "update"),   # "maybe truncate", rcache.py:218-221
    ("update", "update", "update"),
    ("update", "delete", "delete"),
    ("delete", "insert", "update"),   # rcache.py:216-217
    ("delete", "update", "update"),
    ("delete", "delete", "delete"),
]


@pytest.mark.parametrize("old,new,expected", PAIR_TABLE)
def test_action_pairs(spark, old, new, expected):
    out = _compact_map(spark, [(1, 1, old, "a"), (2, 1, new, "b")])
    if expected is None:
        assert out == {}
    else:
        # last values win wholesale (rcache.py:222)
        assert out == {"1": (expected, "b")}


def test_single_events(spark):
    # empty + x -> x for each action
    for action in ("insert", "update", "delete"):
        out = _compact_map(spark, [(1, 1, action, "a")])
        assert out == {"1": (action, "a")}


SEQUENCES = [
    # insert -> update -> delete: annihilates (fold: I,u->I; I,d->gone)
    ([("insert", "a"), ("update", "b"), ("delete", "c")], None),
    # delete -> insert -> update: tombstone revived then updated
    ([("delete", "a"), ("insert", "b"), ("update", "c")], ("update", "c")),
    # insert -> delete -> insert: epoch reset, fresh insert
    ([("insert", "a"), ("delete", "b"), ("insert", "c")], ("insert", "c")),
    # insert -> delete -> update: epoch reset, bare update
    ([("insert", "a"), ("delete", "b"), ("update", "c")], ("update", "c")),
    # update -> delete -> insert: delete then revive -> update
    ([("update", "a"), ("delete", "b"), ("insert", "c")], ("update", "c")),
    # long chain ending gone
    (
        [("insert", "a"), ("update", "b"), ("update", "c"), ("delete", "d")],
        None,
    ),
]


@pytest.mark.parametrize("seq_events,expected", SEQUENCES)
def test_sequences(spark, seq_events, expected):
    events = [(i + 1, 7, a, v) for i, (a, v) in enumerate(seq_events)]
    out = _compact_map(spark, events)
    if expected is None:
        assert out == {}
    else:
        assert out == {"7": expected}


def test_arrival_order_is_seq_not_input_order(spark):
    # shuffle input order; seq must decide
    events = [(3, 1, "delete", "z"), (1, 1, "insert", "a"), (2, 1, "update", "b")]
    assert _compact_map(spark, events) == {}


def test_multiple_keys_independent(spark):
    events = [
        (1, 1, "insert", "a"),
        (2, 2, "insert", "b"),
        (3, 1, "delete", "x"),
        (4, 3, "update", "c"),
    ]
    out = _compact_map(spark, events)
    assert out == {"2": ("insert", "b"), "3": ("update", "c")}


def test_replay_idempotence(spark):
    """M5: re-saving a compacted dump through the same merge path leaves
    the state unchanged (loadcsv.py:60-71 + rcache.py:246-254)."""
    events = [
        (1, 1, "insert", "a"),
        (2, 1, "update", "b"),
        (3, 2, "insert", "c"),
        (4, 2, "delete", "d"),
        (5, 3, "delete", "e"),
        (6, 4, "update", "f"),
    ]
    once = compact(_changelog(spark, events), PK, PAYLOAD)
    replayed = compact(once.withColumn("seq", F.lit(0).cast("long")), PK, PAYLOAD)
    a = {r["rid"]: (r["cdc_action"], r["v"]) for r in once.collect()}
    b = {r["rid"]: (r["cdc_action"], r["v"]) for r in replayed.collect()}
    assert a == b == {"1": ("insert", "b"), "3": ("delete", "e"), "4": ("update", "f")}


# --- rid derivation (P3) + reject path (M3) ----------------------------


def test_composite_rid_and_null_rejects(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "insert"), (2, 10, None, "insert"), (3, None, 2, "update")],
        "seq long, a int, b int, cdc_action string",
    )
    with_ids = with_rid(df, ("a", "b"))
    rids = {r["seq"]: r["rid"] for r in with_ids.collect()}
    assert rids == {1: "10&1", 2: None, 3: None}
    rejects = reject_null_keys(df, ("a", "b"))
    assert {r["seq"] for r in rejects.collect()} == {2, 3}


def test_scalar_vs_composite_equivalence(spark):
    """P3 property: a scalar key behaves exactly like a 1-column composite."""
    events = [(1, 5, "insert", "a"), (2, 5, "update", "b")]
    df = _changelog(spark, events)
    scalar = {r["rid"]: r["v"] for r in compact(df, ("id",), PAYLOAD).collect()}
    assert scalar == {"5": "b"}


def test_incremental_merge_equals_batch(spark):
    """merge_state(compact(first half), second half) == compact(all) —
    the continuous-ingest equivalence (rcache.py:246-254 semantics)."""
    from mysql_cdc_redis_spark.operators.compaction import merge_state

    events = [
        (1, 1, "insert", "a"),
        (2, 2, "insert", "b"),
        (3, 3, "delete", "c"),
        (4, 4, "update", "d"),
        # --- split ---
        (5, 1, "delete", "e"),   # annihilates key 1
        (6, 2, "update", "f"),   # stays insert
        (7, 3, "insert", "g"),   # delete+insert -> update
        (8, 5, "insert", "h"),   # brand-new key
        (9, 1, "insert", "i"),   # key 1 fresh epoch after annihilation
    ]
    full = compact(_changelog(spark, events), PK, PAYLOAD)
    first = compact(_changelog(spark, [e for e in events if e[0] <= 4]), PK, PAYLOAD)
    second = _changelog(spark, [e for e in events if e[0] > 4])
    merged = merge_state(first, second, PK, PAYLOAD)
    as_map = lambda df: {r["rid"]: (r["cdc_action"], r["v"]) for r in df.collect()}
    assert as_map(merged) == as_map(full) == {
        "1": ("insert", "i"),
        "2": ("insert", "f"),
        "3": ("update", "g"),
        "4": ("update", "d"),
        "5": ("insert", "h"),
    }


def test_merge_into_sql_merge_semantics(spark):
    """merge_into applies MERGE semantics: matched+delete removes,
    matched updates wholesale, unmatched non-delete inserts, unmatched
    delete is a no-op (K4 durable form)."""
    from mysql_cdc_redis_spark.operators.compaction import merge_into

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id int, v string"
    )
    state = spark.createDataFrame(
        [
            (1, "A", "update"),   # matched -> update wholesale
            (2, "B", "delete"),   # matched -> row removed
            (5, "E", "insert"),   # unmatched -> insert
            (6, "F", "delete"),   # unmatched delete -> no-op
        ],
        "id int, v string, cdc_action string",
    )
    out = merge_into(target, state, ("id",), ("id", "v"))
    assert {(r["id"], r["v"]) for r in out.collect()} == {
        (1, "A"),
        (3, "c"),
        (4, "d"),
        (5, "E"),
    }
    assert out.columns == ["id", "v"]


def test_state_diff_feed_roundtrip(spark):
    """state_diff(old, new) applied to old via merge_state reproduces
    new's live rows — the diff really is the minimal transforming
    changelog (inverse-of-compaction property)."""
    from mysql_cdc_redis_spark.operators.compaction import merge_state, state_diff

    events = [
        (1, 1, "insert", "a"),
        (2, 2, "insert", "b"),
        (3, 3, "insert", "c"),
        (4, 4, "update", "d"),
        # --- cutoff: state0 = keys {1,2,3,4} ---
        (5, 1, "delete", "e"),   # key 1 vanishes
        (6, 2, "update", "f"),   # key 2 changes payload
        (7, 5, "insert", "g"),   # key 5 appears
    ]
    old = compact(_changelog(spark, [e for e in events if e[0] <= 4]), PK, PAYLOAD)
    new = compact(_changelog(spark, events), PK, PAYLOAD)

    feed = state_diff(old, new, PAYLOAD)
    rows = {r["rid"]: r["change_type"] for r in feed.collect()}
    assert rows == {"1": "delete", "2": "update", "5": "insert"}

    # feed -> changelog -> merge over old == new (live rows)
    feed_ch = feed.select(
        F.lit(100).cast("long").alias("seq"),
        F.lit("t").alias("tbl"),
        F.col("change_type").alias("cdc_action"),
        F.col("rid").cast("int").alias("id"),
        F.coalesce("after_v", "before_v").alias("v"),
    )
    merged = merge_state(old, feed_ch, PK, PAYLOAD)
    live = lambda df: {
        r["rid"]: r["v"]
        for r in df.filter(F.col("cdc_action") != "delete").collect()
    }
    assert live(merged) == live(new)


def test_rid_null_divergence_from_reference(spark):
    """Deliberate divergence, pinned (round-1 VERDICT "minor #3"):
    the reference's _gen_rid (rcache.py:186-193) stringifies a NULL
    composite-key component — `'&'.join([str(row[key]) ...])` turns
    (None, 7) into the literal key 'None&7', silently ALIASING every row
    whose key component is NULL-at-the-same-position onto one cache slot.
    SURVEY §7 classifies reference quirks of this kind as bugs; this
    engine instead NULL-propagates the rid (rid_expr) and routes such
    rows to the M3 SaveIgnore reject stream (reject_null_keys).

    The test encodes BOTH behaviors so the difference is executable
    documentation: under reference semantics the two NULL-keyed rows
    collide on 'None&7'; under ours they are rejected and never aliased."""
    rows = [
        (None, 7, "a"),
        (None, 7, "b"),  # reference: same key 'None&7' as the row above
        (1, 7, "c"),
    ]
    df = spark.createDataFrame(rows, "k1 int, k2 int, v string")
    pk = ("k1", "k2")

    # reference spelling: str() every component, join on '&'
    ref_rid = F.concat_ws(
        "&", *[F.coalesce(F.col(c).cast("string"), F.lit("None")) for c in pk]
    )
    ref_keys = [r["rid"] for r in df.select(ref_rid.alias("rid")).collect()]
    assert ref_keys.count("None&7") == 2  # two distinct rows alias one key

    # this engine: NULL rid -> M3 reject stream; no aliasing possible
    ours = df.select(rid_expr(pk).alias("rid"))
    assert ours.filter(F.col("rid").isNull()).count() == 2
    rejected = reject_null_keys(df, pk)
    assert rejected.count() == 2
    assert ours.filter(F.col("rid") == "None&7").count() == 0
