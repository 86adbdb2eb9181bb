"""CDC query-catalog entries — the reference's operator surface expressed
as oracle-checkable plans (SURVEY.md §2.1-2.4, §2.6-2.7).

The DuckDB oracles reconstruct the same changelog via the shared
dialect-neutral SQL (sources/changelog.py) and implement the compaction
algebra *independently*: ``list(cdc_action ORDER BY seq)`` +
``list_reduce`` of the rcache.py:196-222 merge table, vs. the Spark
side's groupBy + max_by + F.aggregate fold.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.compaction import (
    ACTION_FOLD_SENTINEL,
    compact,
    filter_events,
    filter_tables,
    latency_flag,
    reject_null_keys,
)
from ..operators.staging import stage_parquet
from ..sources import load_table
from ..sources.changelog import (
    LINEITEM_CHANGELOG_SQL,
    LINEITEM_PAYLOAD,
    LINEITEM_PK,
    ORDERS_CHANGELOG_SQL,
    ORDERS_PAYLOAD,
    ORDERS_PK,
    lineitem_changelog,
    orders_changelog,
)
from .catalog import register

# DuckDB spelling of the action-algebra fold (rcache.py:196-222); the
# lambda mirrors operators/compaction.py::_fold_actions.
_FOLD_LAMBDA = (
    "list_reduce(list(cdc_action ORDER BY seq), (s, x) -> CASE "
    f"WHEN s = '{ACTION_FOLD_SENTINEL}' THEN x "
    f"WHEN s = 'insert' THEN (CASE WHEN x = 'delete' THEN '{ACTION_FOLD_SENTINEL}' ELSE 'insert' END) "
    "ELSE (CASE WHEN x = 'insert' THEN 'update' ELSE x END) END)"
)


def _oracle_compact_sql(changelog_sql: str, pk: tuple[str, ...], payload: tuple[str, ...]) -> str:
    not_null = " AND ".join(f"{c} IS NOT NULL" for c in pk)
    rid = " || '&' || ".join(f"CAST({c} AS VARCHAR)" for c in pk)
    last_vals = ",\n         ".join(f"arg_max({c}, seq) AS {c}" for c in payload)
    return f"""
WITH ch AS ({changelog_sql})
SELECT * FROM (
  SELECT tbl, {rid} AS rid,
         {_FOLD_LAMBDA} AS cdc_action,
         {last_vals}
  FROM ch
  WHERE {not_null}
  GROUP BY 1, 2
)
WHERE cdc_action <> '{ACTION_FOLD_SENTINEL}'
"""


# ---------------------------------------------------------------------------
# M1/M2: compaction, scalar and composite keys
# ---------------------------------------------------------------------------


@register(
    "cdc_compact_orders",
    doc="M1+M2 on a scalar-pk changelog: keyed upsert-compaction of the "
    "orders event stream — one shuffle, action algebra folded JVM-side.",
    tags=("cdc", "ref:M1", "ref:M2"),
    bench=True,
    oracle=_oracle_compact_sql(ORDERS_CHANGELOG_SQL, ORDERS_PK, ORDERS_PAYLOAD),
)
def cdc_compact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD)


@register(
    "cdc_compact_lineitem",
    doc="M1+M2 with a composite key: rid = concat_ws('&', l_orderkey, "
    "l_linenumber) per rcache.py:186-193 (P3).",
    tags=("cdc", "ref:M1", "ref:M2", "ref:P3"),
    bench=True,
    oracle=_oracle_compact_sql(LINEITEM_CHANGELOG_SQL, LINEITEM_PK, LINEITEM_PAYLOAD),
)
def cdc_compact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compact(lineitem_changelog(spark, sf_dir), LINEITEM_PK, LINEITEM_PAYLOAD)


# ---------------------------------------------------------------------------
# M3: SaveIgnore reject stream
# ---------------------------------------------------------------------------


@register(
    "cdc_rejects_null_pk",
    doc="M3: events whose key cannot be derived (SaveIgnore, "
    "rcache.py:242-245) routed to a reject stream instead of the cache.",
    tags=("cdc", "ref:M3"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT seq, tbl, cdc_action, o_custkey
FROM ch WHERE o_orderkey IS NULL
ORDER BY seq
""",
)
def cdc_rejects_null_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    return (
        reject_null_keys(ch, ORDERS_PK)
        .select("seq", "tbl", "cdc_action", "o_custkey")
        .orderBy("seq")
    )


# ---------------------------------------------------------------------------
# S2/S3: event-type and schema/table selection
# ---------------------------------------------------------------------------


@register(
    "cdc_filter_events_tables",
    doc="S2+S3: only_events / only_schemas / only_tables pushdown "
    "(cdc.py:84-93) as declarative filters over the unified changelog.",
    tags=("cdc", "ref:S2", "ref:S3"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT seq, db, tbl, cdc_action FROM och
  UNION ALL
  SELECT seq, db, tbl, cdc_action FROM lch
)
SELECT tbl, cdc_action, count(*) AS n
FROM ch
WHERE cdc_action IN ('insert', 'delete') AND db = 'tpch' AND tbl = 'orders'
GROUP BY tbl, cdc_action
ORDER BY tbl, cdc_action
""",
)
def cdc_filter_events_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["seq", "db", "tbl", "cdc_action"]
    ch = orders_changelog(spark, sf_dir).select(cols).unionByName(
        lineitem_changelog(spark, sf_dir).select(cols)
    )
    ch = filter_events(ch, ["insert", "delete"])
    ch = filter_tables(ch, schemas=["tpch"], tables=["orders"])
    return (
        ch.groupBy("tbl", "cdc_action")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tbl", "cdc_action")
    )


# ---------------------------------------------------------------------------
# P5: latency monitor
# ---------------------------------------------------------------------------


@register(
    "cdc_latency_flag",
    doc="P5: binlog_max_latency monitor (cdc.py:101-103) — events older "
    "than the threshold vs a pinned 'now', counted per table and flag.",
    tags=("cdc", "ref:P5"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT tbl,
       (date_diff('second', cdc_ts, TIMESTAMP '2001-08-01 00:00:00') > 31536000) AS late,
       count(*) AS n
FROM ch
GROUP BY 1, 2
ORDER BY tbl, late
""",
)
def cdc_latency_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    flagged = latency_flag(
        ch, F.lit("2001-08-01 00:00:00").cast("timestamp"), max_latency_s=31_536_000
    )
    return (
        flagged.groupBy("tbl", "late")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tbl", "late")
    )


# ---------------------------------------------------------------------------
# A1/A2: cache-size and per-table counts
# ---------------------------------------------------------------------------


@register(
    "cdc_counts_per_table",
    doc="A1+A2: DBSIZE / SCARD analogs — events and distinct live keys per "
    "table over the unified changelog.",
    tags=("cdc", "ref:A1", "ref:A2"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT seq, tbl, CAST(o_orderkey AS VARCHAR) AS rid FROM och WHERE o_orderkey IS NOT NULL
  UNION ALL
  SELECT seq, tbl, CAST(l_orderkey AS VARCHAR) || '&' || CAST(l_linenumber AS VARCHAR) AS rid
  FROM lch WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
)
SELECT tbl, count(*) AS n_events, count(DISTINCT rid) AS n_keys
FROM ch GROUP BY tbl ORDER BY tbl
""",
)
def cdc_counts_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import rid_expr

    o = orders_changelog(spark, sf_dir).withColumn("rid", rid_expr(ORDERS_PK))
    l = lineitem_changelog(spark, sf_dir).withColumn("rid", rid_expr(LINEITEM_PK))
    ch = o.select("seq", "tbl", "rid").unionByName(l.select("seq", "tbl", "rid")).filter(
        F.col("rid").isNotNull()
    )
    return (
        ch.groupBy("tbl")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("rid").alias("n_keys"))
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# M4/M5: replay + idempotence
# ---------------------------------------------------------------------------


@register(
    "cdc_replay_idempotent",
    doc="M4+M5: re-saving a compacted dump through the same merge path "
    "(loadcsv.py:60-71) reproduces the compacted state exactly — the "
    "oracle is the *single*-compaction result.",
    tags=("cdc", "ref:M4", "ref:M5"),
    oracle=_oracle_compact_sql(ORDERS_CHANGELOG_SQL, ORDERS_PK, ORDERS_PAYLOAD),
)
def cdc_replay_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    once = compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD)
    # Re-emit the dump as a fresh changelog (one event per key, original
    # action preserved — exactly what loadcsv replays) into an empty cache.
    replayed = once.withColumn("seq", F.lit(0).cast("long"))
    return compact(replayed, ORDERS_PK, ORDERS_PAYLOAD)


# ---------------------------------------------------------------------------
# A4/P4: schema fingerprint + drift detection
# ---------------------------------------------------------------------------


@register(
    "cdc_fingerprint_drift",
    doc="P4+A4: per-row schema fingerprint (sorted field names, "
    "dump2csv.py:50-60) over a drifted payload (10%% of rows carry an "
    "extra column); >1 fingerprint per table ⇒ drift flag "
    "(dump2csv.py:78-80).  Spark models the dynamic row as a map column "
    "and fingerprints real map_keys.",
    tags=("cdc", "ref:P4", "ref:A4"),
    oracle="""
WITH rows_fp AS (
  SELECT CASE WHEN o_orderkey % 11 = 0
              THEN 'o_comment,o_orderkey,o_totalprice'
              ELSE 'o_orderkey,o_totalprice' END AS fingerprint
  FROM orders
)
SELECT 'orders' AS tbl, fingerprint, count(*) AS n_rows,
       (count(*) <> (SELECT count(*) FROM rows_fp)) AS drifted
FROM rows_fp
GROUP BY fingerprint
ORDER BY fingerprint
""",
)
def cdc_fingerprint_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import schema_fingerprint

    orders = load_table(spark, sf_dir, "orders")
    # Dynamic-schema rows: the payload is a map whose key set varies per
    # row (the per-row dict of rcache.py:139); 1-in-11 rows drift.
    payload = F.when(
        F.col("o_orderkey") % 11 == 0,
        F.create_map(
            F.lit("o_orderkey"), F.col("o_orderkey").cast("string"),
            F.lit("o_totalprice"), F.col("o_totalprice").cast("string"),
            F.lit("o_comment"), F.lit("x"),
        ),
    ).otherwise(
        F.create_map(
            F.lit("o_orderkey"), F.col("o_orderkey").cast("string"),
            F.lit("o_totalprice"), F.col("o_totalprice").cast("string"),
        )
    )
    rows_fp = orders.select(schema_fingerprint(payload).alias("fingerprint"))
    w_tbl = Window.partitionBy(F.lit(1))
    return (
        rows_fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("tbl", F.lit("orders"))
        .withColumn("drifted", F.col("n_rows") != F.sum("n_rows").over(w_tbl))
        .select("tbl", "fingerprint", "n_rows", "drifted")
        .orderBy("fingerprint")
    )


# ---------------------------------------------------------------------------
# K1 + S4 + A3: date-partitioned CSV dump, then scan it back
# ---------------------------------------------------------------------------


@register(
    "cdc_csv_roundtrip",
    doc="K1 sink + S4 scan: compacted state dumped to date-partitioned, "
    "header'd CSV (save2csv, dump2csv.py:62-103) and read back; per-date "
    "counts prove the partition layout (A3).",
    tags=("cdc", "ref:K1", "ref:S4", "ref:A3"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
compacted AS (
  SELECT * FROM (
    SELECT tbl, CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(cdc_ts, seq) AS cdc_ts,
           arg_max(o_totalprice, seq) AS o_totalprice
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1, 2
  ) WHERE cdc_action <> '{ACTION_FOLD_SENTINEL}'
)
SELECT strftime(cdc_ts, '%Y%m') AS dt, count(*) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM compacted GROUP BY dt ORDER BY dt
""",
)
def cdc_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dump import dump_to_csv, read_dump

    compacted = compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD).select(
        "tbl", "rid", "cdc_action", "cdc_ts", "o_totalprice"
    )
    # per-invocation unique staging + exit-time cleanup: a FIXED shared
    # path here races two concurrent sessions (one overwrites while the
    # other reads back) — same class merge_4x fixed in round 4
    import atexit
    import shutil

    out_dir = tempfile.mkdtemp(prefix="cdc_csv_roundtrip_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    dump_to_csv(compacted, out_dir, date_col="cdc_ts", fmt="yyyyMM")
    back = read_dump(spark, out_dir, schema=compacted.schema)
    return (
        back.groupBy("dt")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("dt")
    )


@register(
    "cdc_incremental_merge",
    doc="Incremental compaction (SURVEY.md §4): state from the first half "
    "of the changelog merged with the second half through merge_state — "
    "must equal single-shot compaction of the whole changelog (the "
    "continuous-ingest equivalence of rcache.py:246-254).",
    tags=("cdc", "incremental", "ref:M1"),
    oracle=_oracle_compact_sql(ORDERS_CHANGELOG_SQL, ORDERS_PK, ORDERS_PAYLOAD),
)
def cdc_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import merge_state

    ch = orders_changelog(spark, sf_dir)
    # collect-free split point: the 1-row percentile aggregate rides a
    # broadcast cross-join instead of a driver round-trip, so the whole
    # recipe stays one distributed plan (round-1 VERDICT "What's wrong #3").
    # r9: the quantile is taken over the RAW orders scan (seq is the pure
    # function o_orderkey*4 + e of the key), not the synthesized
    # changelog — cut placement only balances the halves, any monotone
    # cut yields seq-ordered batches and the identical merged state
    cut = F.broadcast(
        load_table(spark, sf_dir, "orders")
        .selectExpr("CAST(o_orderkey * 4 AS BIGINT) AS _s")
        .selectExpr("percentile_approx(_s, 0.5, 10000) AS _cut")
    )
    ch2 = ch.crossJoin(cut)
    first = compact(ch2.filter(F.col("seq") <= F.col("_cut")).drop("_cut"), ORDERS_PK, ORDERS_PAYLOAD)
    second = ch2.filter(F.col("seq") > F.col("_cut")).drop("_cut")
    return merge_state(first, second, ORDERS_PK, ORDERS_PAYLOAD)


def _merge4x_cuts(spark: SparkSession, sf_dir: str, fracs):
    """Collect-free seq-quantile cuts for the 4-batch split, computed
    from the RAW lineitem scan instead of the synthesized changelog.

    ``seq = (l_orderkey*10 + l_linenumber)*4 + e`` with e ∈ 0..3, so
    quantiles of ``(l_orderkey*10 + l_linenumber)*4`` over the raw rows
    track the changelog's seq distribution (duplicate fixture keys and
    the ±3 event offsets shift cut PLACEMENT a hair, which only affects
    batch balance — every monotone cut vector yields seq-ordered
    batches and the identical final state; the incremental==batch
    equivalence is split-point-free, pinned exhaustively in
    tests/test_compaction_exhaustive.py).  The r1-r8 form ran the full
    dedup+explode synthesis (scan + groupBy shuffle + explode) once
    more just to place cuts; this is one scan of two int columns with a
    partial/final sketch aggregate (guide §1.2: don't compute things
    you throw away)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        ((F.col("l_orderkey") * 10 + F.col("l_linenumber")) * 4)
        .cast("long")
        .alias("_s")
    )
    return F.broadcast(
        li.select(F.percentile_approx("_s", fracs, F.lit(10000)).alias("_cuts"))
    )


@register(
    "cdc_incremental_merge_4x",
    doc="The reference's true operating shape at bench scale: the BIG "
    "(lineitem) changelog split into 4 seq-ordered batches and ingested "
    "batch-at-a-time through merge_state (state := merge(state, batch)) "
    "— the continuous form of rcache.py:224-259, where the cache is "
    "folded forward on every flush rather than rebuilt.  The oracle is "
    "one-shot compaction of the full changelog, so every differential "
    "run IS the incremental==batch equivalence proof at that scale "
    "factor.  Splitting stays collect-free: quantile cuts ride a "
    "broadcast 1-row aggregate computed from the RAW fact scan (seq is "
    "a pure function of the key, so the raw key distribution is the "
    "seq distribution; cut placement only balances batches — any "
    "monotone cuts yield seq-ordered batches and the identical merged "
    "state — and the raw scan costs one cheap pass where the r1-r8 "
    "form re-executed the full dedup+explode synthesis just to place "
    "cuts).  Each batch is staged as its PRE-FOLDED per-key transition "
    "tuple (the capture-time fold of a real ingest: all 4 batches fold "
    "in ONE shared groupBy at staging, guide §2.3 'aggregate before "
    "you shuffle', where the r9 cascade re-folded the raw events once "
    "per level), and each merge composes a staged delta with the "
    "state through merge_state_delta — per level only the (compact) "
    "delta tuples shuffle.",
    tags=("cdc", "incremental", "ref:M1", "ref:M2"),
    bench=True,
    oracle=_oracle_compact_sql(LINEITEM_CHANGELOG_SQL, LINEITEM_PK, LINEITEM_PAYLOAD),
)
def cdc_incremental_merge_4x(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import (
        _batch_transitions,
        delta_to_state,
        merge_state_delta,
    )

    n_batches = 4
    ch = lineitem_changelog(spark, sf_dir)
    fracs = F.array(*[F.lit(i / n_batches) for i in range(1, n_batches)])
    cuts = _merge4x_cuts(spark, sf_dir, fracs)
    ch2 = ch.crossJoin(cuts).withColumn(
        "_b",
        F.aggregate(
            F.transform(F.col("_cuts"), lambda c: (F.col("seq") > c).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
    )
    # All 4 batches are folded to per-key transition tuples in ONE
    # groupBy fused with the synthesis pass and STAGED _b-partitioned
    # (a real ingest reads materialized per-batch deltas anyway — the
    # same shape the JVM streaming twin commits per micro-batch).  The
    # r9 form staged the RAW events (2.3M rows × 10 cols at sf0.1) and
    # re-folded each batch inside the cascade: 4 groupBy shuffles and
    # ~1.6× the staged bytes for the same final state (guide §2.3).
    # Each batch filter below is pure partition pruning.
    # Staging hygiene (round-3 ADVICE): mkdtemp gives a per-invocation
    # unique 0700 directory (no cross-session overwrite race, not
    # squattable), the merge cascade is driven to completion by writing
    # the FINAL compacted state, and the staged delta tree is removed
    # immediately after that action — only the (much smaller)
    # final-state parquet lives on, reaped at process exit.  On a real
    # cluster these paths would be object-store URIs managed through the
    # Hadoop FileSystem API; local tempfile/shutil is the local[] analog.
    import atexit
    import shutil
    import tempfile

    staged_dir = tempfile.mkdtemp(prefix="cdc_merge4x_stage_")
    final_dir = tempfile.mkdtemp(prefix="cdc_merge4x_state_")
    try:
        _batch_transitions(
            ch2.drop("_cuts"),
            LINEITEM_PK,
            LINEITEM_PAYLOAD,
            extra_group_cols=("_b",),
        ).write.mode("overwrite").partitionBy("_b").parquet(staged_dir)
        staged = spark.read.parquet(staged_dir)
        state = delta_to_state(
            staged.filter(F.col("_b") == 0).drop("_b"), LINEITEM_PAYLOAD
        )
        for i in range(1, n_batches):
            state = merge_state_delta(
                state,
                staged.filter(F.col("_b") == i).drop("_b"),
                LINEITEM_PAYLOAD,
            )
        state.write.mode("overwrite").parquet(final_dir)
    finally:
        shutil.rmtree(staged_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, final_dir, ignore_errors=True)
    return spark.read.parquet(final_dir)


@register(
    "cdc_parse_debezium",
    doc="S1 production path: Debezium JSON envelopes (synthesized from "
    "orders) parsed JVM-side (from_json) into the changelog schema — "
    "op c/u/d/r mapping, before-image for deletes, ts_ms/pos metadata. "
    "Oracle computes the expected parse output directly from orders.",
    tags=("cdc", "debezium", "ref:S1"),
    oracle="""
SELECT o_orderkey AS seq, 'tpch' AS db, 'orders' AS tbl,
       CASE CAST(o_orderkey % 4 AS INT)
         WHEN 0 THEN 'insert' WHEN 1 THEN 'update'
         WHEN 2 THEN 'delete' ELSE 'insert' END AS cdc_action,
       o_orderdate AS cdc_ts,
       o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY seq
""",
)
def cdc_parse_debezium(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StructType

    from ..sources.debezium import parse_debezium

    orders = load_table(spark, sf_dir, "orders")
    row = F.struct(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    op = F.element_at(
        F.array(F.lit("c"), F.lit("u"), F.lit("d"), F.lit("r")),
        (F.col("o_orderkey") % 4).cast("int") + 1,
    )
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.when(op == "d", row).alias("before"),
                F.when(op != "d", row).alias("after"),
                op.alias("op"),
                (F.unix_timestamp("o_orderdate") * 1000).alias("ts_ms"),
                F.struct(
                    F.lit("tpch").alias("db"),
                    F.lit("orders").alias("table"),
                    F.col("o_orderkey").alias("pos"),
                ).alias("source"),
            ).alias("payload")
        )
    )
    raw = orders.select(envelope.alias("value"))
    row_schema = (
        StructType()
        .add("o_orderkey", "long")
        .add("o_custkey", "long")
        .add("o_totalprice", "double")
    )
    return parse_debezium(raw, row_schema).orderBy("seq")


@register(
    "cdc_scd2_history",
    doc="SCD type-2 history from the changelog: every row version with "
    "[valid_from, valid_to) interval, version number and is_current "
    "flag — the warehouse-side complement of latest-state compaction; "
    "one window, same single shuffle.",
    tags=("cdc", "scd2", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT tbl, CAST(o_orderkey AS VARCHAR) AS rid, cdc_action,
       cdc_ts AS valid_from,
       lead(cdc_ts) OVER w AS valid_to,
       (lead(seq) OVER w IS NULL) AS is_current,
       CAST(row_number() OVER w AS INT) AS version,
       o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM ch
WHERE o_orderkey IS NOT NULL
WINDOW w AS (PARTITION BY tbl, CAST(o_orderkey AS VARCHAR) ORDER BY seq)
ORDER BY rid, version
""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import scd2_history

    ch = orders_changelog(spark, sf_dir)
    return scd2_history(ch, ORDERS_PK, ORDERS_PAYLOAD).orderBy("rid", "version")


@register(
    "cdc_live_state_analytics",
    doc="CDC → analytics: relational query over the LIVE compacted state "
    "(deletes excluded) joined to dimensions — revenue by nation as it "
    "stands after folding the changelog.  Connects the ingest half of "
    "the engine to the warehouse half in one plan.",
    tags=("cdc", "join", "analytics"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
live AS (
  SELECT * FROM (
    SELECT tbl, CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_custkey, seq) AS o_custkey,
           arg_max(o_totalprice, seq) AS o_totalprice
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1, 2
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
)
SELECT n_name, count(*) AS n_live_orders,
       round(sum(o_totalprice), 2) AS live_revenue
FROM live
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
)
def cdc_live_state_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD).filter(
        F.col("cdc_action") != "delete"  # tombstones are not live rows
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        live.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_live_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("live_revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "cdc_dump_chunks",
    doc="S6/W3 as a query: the chunked per-table dump cursor "
    "(iter_rows, rcache.py:143-159) — rows numbered within table, "
    "chunk_id = floor(rn / max_rows), ≤500 rows per chunk; per-chunk "
    "counts prove the chunk boundaries.",
    tags=("cdc", "ref:S6", "ref:W3"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
live AS (
  SELECT * FROM (
    SELECT tbl, CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1, 2
  ) WHERE cdc_action <> '{ACTION_FOLD_SENTINEL}'
),
numbered AS (
  SELECT tbl, rid,
         CAST(floor((row_number() OVER (PARTITION BY tbl ORDER BY rid) - 1) / 500) AS INT) AS chunk_id
  FROM live
)
SELECT tbl, chunk_id, count(*) AS n_rows
FROM numbered GROUP BY tbl, chunk_id ORDER BY tbl, chunk_id
""",
)
def cdc_dump_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD)
    w = Window.partitionBy("tbl").orderBy("rid")
    return (
        live.withColumn(
            "chunk_id", F.floor((F.row_number().over(w) - 1) / 500).cast("int")
        )
        .groupBy("tbl", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("tbl", "chunk_id")
    )


@register(
    "cdc_upload_batches",
    doc="W4 as a query: the 8-file upload batching with a new batch per "
    "date (group_lst, dump2csv.py:155-172) — dump files synthesized "
    "from the orders dates, batch = floor((file_rank_within_date - 1) "
    "/ 8), per-batch file counts.",
    tags=("cdc", "ref:W4"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
files AS (
  SELECT DISTINCT strftime(cdc_ts, '%Y%m%d') AS dt,
         'tpch.orders.' || CAST(seq AS VARCHAR) || '.csv' AS fname
  FROM ch
),
ranked AS (
  SELECT dt, fname,
         CAST(floor((row_number() OVER (PARTITION BY dt ORDER BY fname) - 1) / 8) AS INT) AS batch_id
  FROM files
)
SELECT dt, batch_id, count(*) AS n_files
FROM ranked GROUP BY dt, batch_id ORDER BY dt, batch_id
""",
)
def cdc_upload_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    files = ch.select(
        F.date_format("cdc_ts", "yyyyMMdd").alias("dt"),
        F.concat(F.lit("tpch.orders."), F.col("seq").cast("string"), F.lit(".csv")).alias(
            "fname"
        ),
    ).distinct()
    w = Window.partitionBy("dt").orderBy("fname")
    return (
        files.withColumn(
            "batch_id", F.floor((F.row_number().over(w) - 1) / 8).cast("int")
        )
        .groupBy("dt", "batch_id")
        .agg(F.count(F.lit(1)).alias("n_files"))
        .orderBy("dt", "batch_id")
    )


@register(
    "cdc_compact_unified_cache",
    doc="Multi-table cache semantics: the reference's single Redis cache "
    "holds ALL tables' keys ({sid}#{table}.{rid}, rcache.py:20-23); here "
    "both changelogs fold through ONE compaction keyed by (tbl, rid). "
    "Output (tbl, rid, cdc_action) — the unified key-space view.",
    tags=("cdc", "ref:M1", "ref:S8"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT seq, tbl, CAST(o_orderkey AS VARCHAR) AS rid, cdc_action
  FROM och WHERE o_orderkey IS NOT NULL
  UNION ALL
  SELECT seq, tbl, CAST(l_orderkey AS VARCHAR) || '&' || CAST(l_linenumber AS VARCHAR) AS rid, cdc_action
  FROM lch WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
)
SELECT * FROM (
  SELECT tbl, rid, {_FOLD_LAMBDA} AS cdc_action
  FROM ch GROUP BY tbl, rid
)
WHERE cdc_action <> '{ACTION_FOLD_SENTINEL}'
ORDER BY tbl, rid
""",
)
def cdc_compact_unified_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import rid_expr

    o = orders_changelog(spark, sf_dir).select(
        "seq", "tbl", rid_expr(ORDERS_PK).alias("rid"), "cdc_action"
    )
    l = lineitem_changelog(spark, sf_dir).select(
        "seq", "tbl", rid_expr(LINEITEM_PK).alias("rid"), "cdc_action"
    )
    unified = o.unionByName(l).filter(F.col("rid").isNotNull())
    # compact() re-derives rid from pk cols; here the unified stream has
    # heterogeneous payloads, so rid IS the key column (payload = seq to
    # avoid duplicating the key column in the output struct)
    return (
        compact(unified, ("rid",), ("seq",))
        .select("tbl", "rid", "cdc_action")
        .orderBy("tbl", "rid")
    )


@register(
    "cdc_csv_quoted_newlines",
    doc="K1/K3 CSV dialect fidelity: values containing commas, embedded "
    "double quotes and NEWLINES survive a CSV write→read roundtrip "
    "under RFC-4180 double-quote escaping — the property the reference "
    "relies on with `bq load --allow_quoted_newlines` "
    "(dump2csv.py:253) and csv.DictWriter quoting (dump2csv.py:90-94). "
    "Read-back uses multiLine parsing with an explicit schema.  The "
    "oracle computes the same aggregate from the original table, so a match "
    "proves losslessness; the per-priority bit_xor of a 60-bit content "
    "hash is order-insensitive and exact.",
    tags=("cdc", "csv", "ref:K1", "ref:K3"),
    oracle="""
WITH messy AS (
  SELECT o_orderkey, o_orderpriority,
         o_orderpriority || ',"' || chr(10) || 'line2 of ' || CAST(o_orderkey AS VARCHAR) || '"' AS payload
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_rows,
       sum(len(payload)) AS total_chars,
       bit_xor(('0x' || substr(md5(payload), 1, 15))::BIGINT) AS content_xor
FROM messy GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def cdc_csv_quoted_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from ..functions.hashing import md5long

    orders = load_table(spark, sf_dir, "orders")
    messy = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.concat(
            F.col("o_orderpriority"),
            F.lit(',"'),
            F.lit("\n"),
            F.lit("line2 of "),
            F.col("o_orderkey").cast("string"),
            F.lit('"'),
        ).alias("payload"),
    )
    out_dir = os.path.join(tempfile.gettempdir(), f"csv_quoted_{uuid.uuid4().hex[:8]}")
    import atexit
    import shutil

    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    (
        messy.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(out_dir)
    )
    back = (
        spark.read.schema(messy.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(out_dir)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length("payload")).alias("total_chars"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(payload), 1, 15), 16, 10) as bigint))"
            ).alias("content_xor"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "cdc_csv_scalar_roundtrip",
    doc="Row-level CSV dialect fidelity (the loadcsv.py:91-94 per-row "
    "DictWriter/reader analog as SCALAR functions): each order struct "
    "serializes with to_csv and re-parses with from_csv inside one "
    "projection — no files, no shuffle, pure codegen'd row transforms.  "
    "The aggregate over the PARSED columns must equal the same "
    "aggregate over the base table (lossless roundtrip incl. doubles "
    "and timestamps), which is exactly what the oracle computes from "
    "the raw parquet.  At 100 TB this is the cheap path for emitting "
    "line-oriented interchange formats from inside a pipeline stage "
    "without a sink/source hop.",
    tags=("cdc", "csv", "scalar", "roundtrip"),
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_rows,
       sum(o_orderkey) AS key_sum,
       round(sum(o_totalprice), 2) AS price_sum,
       CAST(min(o_orderdate) AS TIMESTAMP) AS first_date
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def cdc_csv_scalar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ (FIXTURES.md): to_csv serializes NTZ
    # with the ISO default (timestampNTZFormat), so from_csv must parse
    # back under the same NTZ type — symmetric defaults, no opts needed
    schema = (
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP_NTZ"
    )
    line = F.to_csv(
        F.struct("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )
    parsed = orders.select(F.from_csv(line, schema).alias("row")).select("row.*")
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
            F.min("o_orderdate").alias("first_date"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# K4 durable form: MERGE INTO a warehouse snapshot
# ---------------------------------------------------------------------------

_WAREHOUSE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "cdc_merge_into_warehouse",
    doc="K4's durable-warehouse form (SURVEY.md §1.1 'foreachBatch "
    "MERGE'): apply a compacted changelog state to the orders snapshot "
    "with SQL MERGE semantics — matched+delete removes the row, matched "
    "updates wholesale, unmatched non-delete inserts, unmatched delete "
    "is a no-op (rcache.py:252-254 DEL of an uncached key).  One "
    "full-outer join on the key; bucket both sides at scale for an "
    "Exchange-free merge.",
    tags=("cdc", "ref:K4", "merge"),
    oracle=f"""
WITH state AS ({_oracle_compact_sql(ORDERS_CHANGELOG_SQL, ORDERS_PK, ORDERS_PAYLOAD)})
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       o.o_orderdate, o.o_orderpriority
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM state s WHERE s.o_orderkey = o.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM state WHERE cdc_action <> 'delete'
""",
)
def cdc_merge_into_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import merge_into

    state = compact(orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD)
    target = load_table(spark, sf_dir, "orders")
    return merge_into(target, state, ORDERS_PK, _WAREHOUSE_COLS)


@register(
    "cdc_xml_scalar_roundtrip",
    doc="Row-level XML dialect fidelity (sibling of cdc_csv_scalar_"
    "roundtrip on Spark 4's native XML scalars): each order struct "
    "serializes with to_xml and re-parses with from_xml inside one "
    "projection — pure codegen'd row transforms, no files.  Aggregates "
    "over the PARSED columns must equal the oracle's aggregates over "
    "the raw parquet (lossless roundtrip).  This is the interchange "
    "path for XML-consuming downstreams the reference served via CSV "
    "(dump2csv.py:91-94) — same pipeline shape, different wire format.",
    tags=("cdc", "xml", "scalar", "roundtrip"),
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_rows,
       sum(o_orderkey) AS key_sum,
       round(sum(o_totalprice), 2) AS price_sum
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def cdc_xml_scalar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    xml = F.to_xml(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
    schema = "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    parsed = orders.select(F.from_xml(xml, schema).alias("row")).select("row.*")
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "cdc_ivm_agg_maintenance",
    doc="Incremental view maintenance over the changelog: a per-status "
    "revenue aggregate is maintained as agg(state0) + delta(batch) — "
    "the batch's contribution is new-contrib(touched keys after "
    "merge_state) minus old-contrib(touched keys in state0), so only "
    "keys the batch touched are re-read; untouched state rows never "
    "re-enter the plan (SURVEY.md §4 incremental computation, the "
    "aggregate-level analog of rcache.py:246-254's per-row merge).  "
    "Money sums run in DECIMAL(18,2) on both engines, so maintained-"
    "equals-recomputed is exact to the cent, not merely within float "
    "noise.  The oracle recomputes the aggregate from the fully-"
    "compacted state — IVM == recompute is the whole point.",
    tags=("cdc", "incremental", "ivm", "agg"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
state AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_orderstatus, seq) AS o_orderstatus,
           arg_max(o_totalprice, seq) AS o_totalprice
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_live,
       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def cdc_ivm_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, state0 = _ivm_agg_lazy(spark, sf_dir)
    try:
        # eager materialization of the tiny per-status result scoped
        # around the state0 persist (see _ivm_agg_lazy) — nothing stays
        # cached after the call
        return stage_parquet(out, "ivm_agg").orderBy("o_orderstatus")
    finally:
        state0.unpersist()


def _ivm_agg_lazy(spark: SparkSession, sf_dir: str):
    """Build the IVM maintenance plan LAZILY; returns (out, state0) with
    ``state0`` persisted — the caller owns releasing it (the registered
    entry materializes eagerly then unpersists; the plan-quality test
    inspects the lazy plan for the LeftSemi evidence then unpersists)."""
    from ..operators.compaction import merge_state, rid_expr

    ch = orders_changelog(spark, sf_dir)
    # collect-free split point (see cdc_incremental_merge): broadcast the
    # 1-row percentile aggregate instead of collecting it to the driver
    cut = F.broadcast(ch.selectExpr("percentile_approx(seq, 0.6, 10000) AS _cut"))
    ch2 = ch.crossJoin(cut)
    # three branches read state0 (base agg, touched semi-join, merge) —
    # persist the ≤1-row-per-key state instead of recompacting per branch
    # (in production this is the already-materialized state parquet)
    state0 = compact(
        ch2.filter(F.col("seq") <= F.col("_cut")).drop("_cut"), ORDERS_PK, ORDERS_PAYLOAD
    ).persist()
    batch = ch2.filter(F.col("seq") > F.col("_cut")).drop("_cut")

    price = F.col("o_totalprice").cast("decimal(18,2)")
    live = F.col("cdc_action") != "delete"

    # base aggregate over the pre-batch state (the maintained view)
    agg0 = (
        state0.filter(live)
        .groupBy("o_orderstatus")
        .agg(F.sum(price).alias("v"), F.count(F.lit(1)).alias("n"))
    )

    # keys the batch touches: old contribution retracts, new adds
    touched = batch.select(rid_expr(ORDERS_PK).alias("rid")).where(
        F.col("rid").isNotNull()
    ).distinct()
    old_touched = state0.join(touched, "rid", "semi")
    new_touched = merge_state(old_touched, batch, ORDERS_PK, ORDERS_PAYLOAD)

    retract = old_touched.filter(live).select(
        "o_orderstatus", (-price).alias("v"), F.lit(-1).cast("long").alias("n")
    )
    add = new_touched.filter(live).select(
        "o_orderstatus", price.alias("v"), F.lit(1).cast("long").alias("n")
    )
    out = (
        agg0.unionByName(retract)
        .unionByName(add)
        .groupBy("o_orderstatus")
        .agg(F.sum("v").alias("total_price"), F.sum("n").alias("n_live"))
        .filter(F.col("n_live") > 0)
        .select(
            "o_orderstatus",
            "n_live",
            F.col("total_price").cast("decimal(18,2)").alias("total_price"),
        )
    )
    return out, state0


_TT_CUTOFF = "1995-06-30"


@register(
    "cdc_state_time_travel",
    doc="Point-in-time state reconstruction (time travel): the warehouse "
    "state as of a past cutoff is just compaction over the changelog "
    "prefix cdc_ts <= T — the changelog IS the history, so any "
    "as-of-T state is recoverable without stored snapshots "
    "(the reference can only replay forward from CSV dumps, "
    "loadcsv.py:6-8; a Spark changelog gets arbitrary-T recovery for "
    "free).  The ts predicate pushes into the changelog scan, so only "
    "the prefix is read.",
    tags=("cdc", "timetravel", "ref:M4"),
    oracle=_oracle_compact_sql(
        f"SELECT * FROM ({ORDERS_CHANGELOG_SQL}) WHERE cdc_ts <= DATE '{_TT_CUTOFF}'",
        ORDERS_PK,
        ORDERS_PAYLOAD,
    ),
)
def cdc_state_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir).filter(
        F.col("cdc_ts") <= F.lit(_TT_CUTOFF).cast("date")
    )
    return compact(ch, ORDERS_PK, ORDERS_PAYLOAD)


def _live_state_sql(src_filter: str) -> str:
    """CTE body: live compacted orders state (rid, status, price) from
    the shared changelog under an extra WHERE clause."""
    return f"""
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_orderstatus, seq) AS o_orderstatus,
           arg_max(o_totalprice, seq) AS o_totalprice
    FROM ch WHERE o_orderkey IS NOT NULL AND {src_filter}
    GROUP BY 1
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')"""


@register(
    "cdc_state_diff_feed",
    doc="Change-data-feed synthesis by snapshot diff — the INVERSE of "
    "compaction: the live state as of the cutoff vs. the final live "
    "state, full-outer-joined on rid into the minimal insert/update/"
    "delete feed that transforms one into the other (bootstrapping CDC "
    "where no binlog exists; the reference has no such recovery path — "
    "loadcsv replay, loadcsv.py:6-8, needs recorded events).  "
    "Null-safe payload comparison; one rid shuffle.",
    tags=("cdc", "diff", "ext"),
    bench=True,
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
old_state AS ({{old_body}}),
new_state AS ({{new_body}})
SELECT coalesce(o.rid, n.rid) AS rid,
       CASE WHEN o.rid IS NULL THEN 'insert'
            WHEN n.rid IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.o_orderstatus AS before_o_orderstatus,
       o.o_totalprice  AS before_o_totalprice,
       n.o_orderstatus AS after_o_orderstatus,
       n.o_totalprice  AS after_o_totalprice
FROM old_state o FULL OUTER JOIN new_state n ON o.rid = n.rid
WHERE o.rid IS NULL OR n.rid IS NULL
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
ORDER BY rid
""".format(
        old_body=_live_state_sql(f"cdc_ts <= DATE '{_TT_CUTOFF}'"),
        new_body=_live_state_sql("TRUE"),
    ),
)
def cdc_state_diff_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import state_diff

    ch = orders_changelog(spark, sf_dir)
    old = compact(
        ch.filter(F.col("cdc_ts") <= F.lit(_TT_CUTOFF).cast("date")),
        ORDERS_PK,
        ORDERS_PAYLOAD,
    )
    new = compact(ch, ORDERS_PK, ORDERS_PAYLOAD)
    # NOT passed here: state_diff's co_group_cols=("tbl",) lets the diff
    # join reuse compact's (tbl, rid) partitioning on real multi-table
    # states (see test_plan_quality), but THIS changelog's tbl is a
    # literal — Catalyst folds the constant out of the join keys while
    # keeping it in the aggregate's, so the pair key can never match
    # and the extra key buys nothing (measured r9; the two live-state
    # re-shuffles it would remove are ~100k narrow rows each at sf0.1)
    return state_diff(old, new, ("o_orderstatus", "o_totalprice")).orderBy("rid")


@register(
    "cdc_state_diff_feed_sharded",
    doc="The state-diff feed over a SHARDED physical layout — the "
    "common MySQL shape where one logical table lives in N physical "
    "shards (orders_0..orders_3, shard = pk % 4) and the binlog's tbl "
    "column is a real per-row value, not a constant: compact keys the "
    "state by (tbl, rid) and state_diff(co_group_cols=('tbl',)) joins "
    "the two snapshots on the same (tbl, rid) so the full-outer diff "
    "REUSES the compacts' hash partitioning — zero exchanges between "
    "the aggregates and the join (guide §2.4; r9 shipped the "
    "capability plan-pinned but no bench query exercised it because "
    "the single-table changelog's literal tbl constant-folds out of "
    "the join keys).  Shard = f(pk), so the diff rows are provably "
    "identical to cdc_state_diff_feed's — the shared oracle re-proves "
    "the sharding is lossless on every run.",
    tags=("cdc", "diff", "sharded", "ext"),
    bench=True,
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
old_state AS ({{old_body}}),
new_state AS ({{new_body}})
SELECT coalesce(o.rid, n.rid) AS rid,
       CASE WHEN o.rid IS NULL THEN 'insert'
            WHEN n.rid IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.o_orderstatus AS before_o_orderstatus,
       o.o_totalprice  AS before_o_totalprice,
       n.o_orderstatus AS after_o_orderstatus,
       n.o_totalprice  AS after_o_totalprice
FROM old_state o FULL OUTER JOIN new_state n ON o.rid = n.rid
WHERE o.rid IS NULL OR n.rid IS NULL
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.o_totalprice  IS DISTINCT FROM n.o_totalprice
ORDER BY rid
""".format(
        old_body=_live_state_sql(f"cdc_ts <= DATE '{_TT_CUTOFF}'"),
        new_body=_live_state_sql("TRUE"),
    ),
)
def cdc_state_diff_feed_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import state_diff

    ch = orders_changelog(spark, sf_dir).withColumn(
        "tbl",
        F.concat(
            F.lit("orders_"), F.pmod(F.col("o_orderkey"), F.lit(4)).cast("string")
        ),
    )
    old = compact(
        ch.filter(F.col("cdc_ts") <= F.lit(_TT_CUTOFF).cast("date")),
        ORDERS_PK,
        ORDERS_PAYLOAD,
    )
    new = compact(ch, ORDERS_PK, ORDERS_PAYLOAD)
    # tbl is a REAL column here (shard name derived from the pk), so
    # the co-group key survives Catalyst and the diff join plans on the
    # compacts' own (tbl, rid) partitioning — pinned by
    # tests/test_plan_quality.py::test_state_diff_feed_sharded_join_reuses_compact_shuffles
    return state_diff(
        old, new, ("o_orderstatus", "o_totalprice"), co_group_cols=("tbl",)
    ).orderBy("rid")


@register(
    "cdc_quality_constraint_checks",
    doc="Declarative data-quality gate (the warehouse-side form of "
    "loadcsv.py's pk validation): five constraint checks over orders — "
    "pk uniqueness, NOT NULL, accepted values, date range (all four "
    "fused into ONE scan/aggregate) plus referential integrity into "
    "customer (left-anti count) — emitted as one (check, n_violations) "
    "report.  Constraints that pass report 0 rather than vanishing, so "
    "the report schema is stable for alerting.  The accepted-values "
    "and date-range sets are deliberately tight so real rows violate "
    "them: the checks are shown counting, not vacuously green.",
    tags=("cdc", "quality", "tooling", "ext"),
    oracle="""
SELECT 'accepted_status' AS check_name,
       CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O')) AS BIGINT)
         AS n_violations
FROM orders
UNION ALL
SELECT 'custkey_not_null',
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
UNION ALL
SELECT 'date_in_range',
       CAST(count(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
                                OR o_orderdate > DATE '1998-08-02') AS BIGINT)
FROM orders
UNION ALL
SELECT 'fk_customer',
       CAST(count(*) AS BIGINT)
FROM orders WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'pk_unique',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
ORDER BY check_name
""",
)
def cdc_quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    scan_checks = orders.agg(
        F.sum(
            (~F.col("o_orderstatus").isin("F", "O")).cast("long")
        ).alias("accepted_status"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("custkey_not_null"),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1992-01-01"))
                | (F.col("o_orderdate") > F.lit("1998-08-02"))
            ).cast("long")
        ).alias("date_in_range"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_unique"),
    )
    fused = scan_checks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("check_name"),
                        F.col(c).alias("n_violations"),
                    )
                    for c in (
                        "accepted_status",
                        "custkey_not_null",
                        "date_in_range",
                        "pk_unique",
                    )
                ]
            )
        ).alias("r")
    ).select("r.*")
    fk = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("fk_customer").alias("check_name"), "n_violations")
    )
    return fused.unionByName(fk).orderBy("check_name")


@register(
    "cdc_bitemporal_asof",
    doc="Bitemporal as-of query — BOTH time axes at once: transaction "
    "time (which events the warehouse had applied: seq ≤ S, a 60% "
    "prefix) and valid time (which version covered date V).  SCD2 "
    "intervals over the transaction prefix, then one interval "
    "predicate picks each key's version valid at V — 'what did the "
    "warehouse believe, as of transaction S, about the row's state "
    "on date V'.  The fixture changelog stamps every version of a "
    "key with one date, so versions stagger +30 days per version "
    "step to make the valid axis observable (the stagger is part of "
    "the query spec on both sides).  Same single (tbl, rid) shuffle "
    "as compaction; the prefix predicate pushes to the scan.",
    tags=("cdc", "scd2", "bitemporal", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
cut AS (SELECT CAST(floor(max(seq) * 0.6) AS BIGINT) AS s FROM ch),
hist AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS rid, cdc_action,
         cdc_ts + (row_number() OVER w - 1) * INTERVAL 30 DAY AS valid_from,
         lead(cdc_ts) OVER w + row_number() OVER w * INTERVAL 30 DAY AS valid_to,
         o_orderstatus, o_totalprice,
         CAST(row_number() OVER w AS INT) AS version
  FROM ch, cut
  WHERE o_orderkey IS NOT NULL AND seq <= s
  WINDOW w AS (PARTITION BY tbl, CAST(o_orderkey AS VARCHAR) ORDER BY seq)
)
SELECT rid, version, cdc_action, o_orderstatus, o_totalprice,
       CAST(valid_from AS DATE) AS valid_from,
       CAST(valid_to AS DATE) AS valid_to
FROM hist
WHERE valid_from <= DATE '1995-03-15'
  AND (valid_to IS NULL OR valid_to > DATE '1995-03-15')
ORDER BY rid
""",
)
def cdc_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.compaction import scd2_history

    ch = orders_changelog(spark, sf_dir)
    max_seq = ch.agg(F.max("seq")).first()[0]
    cut = math.floor(max_seq * 0.6)
    hist = scd2_history(
        ch.filter(F.col("seq") <= cut), ORDERS_PK, ("o_orderstatus", "o_totalprice")
    )
    vf = F.date_add(F.col("valid_from").cast("date"), (F.col("version") - 1) * 30)
    vt = F.date_add(F.col("valid_to").cast("date"), F.col("version") * 30)
    v = F.lit("1995-03-15").cast("date")
    return (
        hist.select(
            "rid",
            "version",
            "cdc_action",
            "o_orderstatus",
            "o_totalprice",
            vf.alias("valid_from"),
            vt.alias("valid_to"),
        )
        .where((F.col("valid_from") <= v) & (F.col("valid_to").isNull() | (F.col("valid_to") > v)))
        .orderBy("rid")
    )


@register(
    "cdc_state_ttl_retention",
    doc="Retention / TTL sweep over the compacted state (GDPR-style "
    "age-out; the reference can only destructive-clear the whole "
    "cache, rcache.py's flushdb analog — per-row TTL needs the "
    "timestamped state this engine keeps): rows whose last activity "
    "predates the cutoff are swept, the rest survive; one pass "
    "emits the per-status survivor/sweep accounting an ops dashboard "
    "wants (counts + swept value).",
    tags=("cdc", "retention", "ttl", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
state AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_orderstatus, seq) AS o_orderstatus,
           arg_max(o_totalprice, seq) AS o_totalprice,
           arg_max(cdc_ts, seq) AS last_ts
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
)
SELECT o_orderstatus,
       CAST(count(*) FILTER (WHERE last_ts >= DATE '1995-01-01') AS BIGINT)
         AS n_retained,
       CAST(count(*) FILTER (WHERE last_ts < DATE '1995-01-01') AS BIGINT)
         AS n_swept,
       round(sum(o_totalprice) FILTER (WHERE last_ts < DATE '1995-01-01'), 2)
         AS swept_value
FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def cdc_state_ttl_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    # cdc_ts rides the payload through the same fold: last activity =
    # last event's timestamp, no second aggregation over the changelog
    state = compact(
        ch, ORDERS_PK, ("o_orderstatus", "o_totalprice", "cdc_ts")
    ).filter(F.col("cdc_action") != "delete").withColumnRenamed("cdc_ts", "last_ts")
    cutoff = F.lit("1995-01-01").cast("date")
    stale = F.col("last_ts") < cutoff
    return (
        state.groupBy("o_orderstatus")
        .agg(
            F.sum((~stale).cast("long")).alias("n_retained"),
            F.sum(stale.cast("long")).alias("n_swept"),
            F.round(F.sum(F.when(stale, F.col("o_totalprice"))), 2).alias(
                "swept_value"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "cdc_changelog_order_audit",
    doc="Changelog-health audit: per table, are sequence numbers "
    "consistent with event time?  Counts seq-adjacent pairs (lag over "
    "one seq-ordered window per table) whose cdc_ts regresses — the "
    "out-of-order-delivery metric that decides whether downstream "
    "can trust seq as the fold order (the reference just assumes "
    "binlog order, cdc.py:134; a distributed collector must measure "
    "it) — plus min/max seq and the duplicate-seq count, the other "
    "two invariants replay depends on.",
    tags=("cdc", "audit", "quality", "ext"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT tbl, seq, cdc_ts FROM och
  UNION ALL
  SELECT tbl, seq, cdc_ts FROM lch
),
lagged AS (
  SELECT tbl, seq, cdc_ts,
         lag(cdc_ts) OVER (PARTITION BY tbl ORDER BY seq) AS prev_ts
  FROM ch
)
SELECT tbl,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq,
       CAST(count(*) - count(DISTINCT seq) AS BIGINT) AS n_dup_seq,
       CAST(count(*) FILTER (WHERE prev_ts > cdc_ts) AS BIGINT) AS n_ts_regressions
FROM lagged GROUP BY tbl ORDER BY tbl
""",
)
def cdc_changelog_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["tbl", "seq", "cdc_ts"]
    ch = orders_changelog(spark, sf_dir).select(cols).unionByName(
        lineitem_changelog(spark, sf_dir).select(cols)
    )
    w = Window.partitionBy("tbl").orderBy("seq")
    lagged = ch.withColumn("prev_ts", F.lag("cdc_ts").over(w))
    return (
        lagged.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            (F.count(F.lit(1)) - F.countDistinct("seq")).alias("n_dup_seq"),
            F.sum((F.col("prev_ts") > F.col("cdc_ts")).cast("long")).alias(
                "n_ts_regressions"
            ),
        )
        .orderBy("tbl")
    )


@register(
    "cdc_temporal_scd2_enrich",
    doc="Temporal dimension enrichment: fact rows (lineitem, at their "
    "ship date) join the SCD2 orders history picking THE version "
    "whose [valid_from, valid_to) interval covers the fact date — the "
    "point-in-time-correct join every slowly-changing warehouse "
    "needs (joining latest-state instead silently rewrites history).  "
    "Equi key (order key) carries the join; the interval check is a "
    "residual filter, so the plan stays a plain hash join — no range "
    "cross product.  Version validity uses the same +30-days-per-"
    "version stagger as the bitemporal entry; facts matching no "
    "version (annihilated keys, pre-history dates) drop, and the "
    "aggregate accounts matches per (version, status).",
    tags=("cdc", "scd2", "join", "temporal", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
hist AS (
  SELECT o_orderkey AS hk, o_orderstatus,
         cdc_ts + (row_number() OVER w - 1) * INTERVAL 30 DAY AS valid_from,
         lead(cdc_ts) OVER w + row_number() OVER w * INTERVAL 30 DAY AS valid_to,
         CAST(row_number() OVER w AS INT) AS version
  FROM ch WHERE o_orderkey IS NOT NULL
  WINDOW w AS (PARTITION BY tbl, o_orderkey ORDER BY seq)
)
SELECT version, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_facts,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem JOIN hist
  ON l_orderkey = hk
 AND CAST(l_shipdate AS TIMESTAMP) >= valid_from
 AND (valid_to IS NULL OR CAST(l_shipdate AS TIMESTAMP) < valid_to)
GROUP BY version, o_orderstatus
ORDER BY version, o_orderstatus
""",
)
def cdc_temporal_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import scd2_history

    ch = orders_changelog(spark, sf_dir)
    hist = scd2_history(ch, ORDERS_PK, ("o_orderstatus",))
    vf = F.date_add(F.col("valid_from").cast("date"), (F.col("version") - 1) * 30)
    vt = F.date_add(F.col("valid_to").cast("date"), F.col("version") * 30)
    dim = hist.select(
        F.col("rid").cast("long").alias("hk"),
        "o_orderstatus",
        "version",
        vf.alias("vf"),
        vt.alias("vt"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", F.col("l_shipdate").cast("date").alias("d")
    )
    return (
        li.join(
            dim,
            (F.col("l_orderkey") == F.col("hk"))
            & (F.col("d") >= F.col("vf"))
            & (F.col("vt").isNull() | (F.col("d") < F.col("vt"))),
        )
        .groupBy("version", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("version", "o_orderstatus")
    )


@register(
    "cdc_tombstone_gc",
    doc="Tombstone garbage collection (Kafka's delete.retention.ms for "
    "the compacted state): tombstones must outlive the longest "
    "consumer lag — delete markers younger than the horizon are "
    "RETAINED so lagging readers still see the delete; older ones "
    "GC.  Live rows are never GC'd (that is TTL's job, a different "
    "policy).  One pass over the compacted state emits the ops "
    "accounting: live rows, tombstones kept, tombstones collected.",
    tags=("cdc", "gc", "tombstone", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
state AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(cdc_ts, seq) AS last_ts
    FROM ch WHERE o_orderkey IS NOT NULL
    GROUP BY 1
  ) WHERE cdc_action <> '{ACTION_FOLD_SENTINEL}'
)
SELECT CAST(count(*) FILTER (WHERE cdc_action <> 'delete') AS BIGINT) AS n_live,
       CAST(count(*) FILTER (WHERE cdc_action = 'delete'
                               AND last_ts >= DATE '1995-01-01') AS BIGINT)
         AS n_tombstones_kept,
       CAST(count(*) FILTER (WHERE cdc_action = 'delete'
                               AND last_ts < DATE '1995-01-01') AS BIGINT)
         AS n_tombstones_gc
FROM state
""",
)
def cdc_tombstone_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    state = compact(ch, ORDERS_PK, ("cdc_ts",)).withColumnRenamed("cdc_ts", "last_ts")
    horizon = F.lit("1995-01-01").cast("date")
    is_tomb = F.col("cdc_action") == "delete"
    return state.agg(
        F.sum((~is_tomb).cast("long")).alias("n_live"),
        F.sum((is_tomb & (F.col("last_ts") >= horizon)).cast("long")).alias(
            "n_tombstones_kept"
        ),
        F.sum((is_tomb & (F.col("last_ts") < horizon)).cast("long")).alias(
            "n_tombstones_gc"
        ),
    )


@register(
    "cdc_seq_gap_census",
    doc="Sequence-gap census (lost-event detection: a binlog collector "
    "that skips positions loses data silently — the gap census is "
    "the monitor): per table, adjacent-seq deltas via one lag "
    "window; emits gap count, total missing positions, and the "
    "largest gap.  The synthetic changelog allots 4 positions per "
    "key and uses a subset, so the census reports real, "
    "deterministic gaps — the monitor is shown measuring, not "
    "vacuously zero.",
    tags=("cdc", "audit", "gaps", "ext"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT tbl, seq FROM och UNION ALL SELECT tbl, seq FROM lch
),
lagged AS (
  SELECT tbl, seq - lag(seq) OVER (PARTITION BY tbl ORDER BY seq) AS delta
  FROM ch
)
SELECT tbl,
       CAST(count(*) FILTER (WHERE delta > 1) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(delta - 1) FILTER (WHERE delta > 1), 0) AS BIGINT)
         AS n_missing_positions,
       CAST(max(delta) - 1 AS BIGINT) AS largest_gap
FROM lagged GROUP BY tbl ORDER BY tbl
""",
)
def cdc_seq_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["tbl", "seq"]
    ch = orders_changelog(spark, sf_dir).select(cols).unionByName(
        lineitem_changelog(spark, sf_dir).select(cols)
    )
    w = Window.partitionBy("tbl").orderBy("seq")
    lagged = ch.select("tbl", (F.col("seq") - F.lag("seq").over(w)).alias("delta"))
    gap = F.col("delta") > 1
    return (
        lagged.groupBy("tbl")
        .agg(
            F.sum(gap.cast("long")).alias("n_gaps"),
            F.coalesce(
                F.sum(F.when(gap, F.col("delta") - 1)), F.lit(0)
            ).alias("n_missing_positions"),
            (F.max("delta") - 1).alias("largest_gap"),
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# P5 ext: replication-lag distribution (monitoring profile of cdc.py:101-103)
# ---------------------------------------------------------------------------


@register(
    "cdc_latency_histogram",
    doc="Replication-lag profile: the reference only warn-flags events "
    "older than binlog_max_latency (cdc.py:101-103, cdc_config.py:48); "
    "this generalizes the predicate into a 30-day-bucket lateness "
    "histogram plus p50/p95 discrete percentiles against a pinned 'now' "
    "(max cdc_ts in the stream) — the ops dashboard the reference's "
    "syslog warnings approximate.  One pass + one tiny bucket aggregate.",
    tags=("cdc", "agg", "ref"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
anchor AS (SELECT max(cdc_ts) AS now_ts FROM ch),
lat AS (
  SELECT date_diff('day', cdc_ts, now_ts) AS days_behind
  FROM ch CROSS JOIN anchor
)
SELECT days_behind // 30 AS bucket_30d,
       count(*) AS n_events,
       any_value((SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY days_behind) FROM lat))
         AS p50_days,
       any_value((SELECT percentile_disc(0.95) WITHIN GROUP (ORDER BY days_behind) FROM lat))
         AS p95_days
FROM lat GROUP BY 1 ORDER BY 1
""",
)
def cdc_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    anchor = ch.agg(F.max("cdc_ts").alias("now_ts"))
    lat = ch.crossJoin(F.broadcast(anchor)).select(
        F.datediff("now_ts", "cdc_ts").alias("days_behind")
    )
    pct = lat.agg(
        F.percentile_approx("days_behind", 0.5, 2147483647).alias("p50_days"),
        F.percentile_approx("days_behind", 0.95, 2147483647).alias("p95_days"),
    )
    return (
        lat.groupBy((F.col("days_behind") / 30).cast("bigint").alias("bucket_30d"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(pct))
        .select("bucket_30d", "n_events", "p50_days", "p95_days")
        .orderBy("bucket_30d")
    )


# ---------------------------------------------------------------------------
# M1 ext: hot-key census (state-store skew diagnosis)
# ---------------------------------------------------------------------------


@register(
    "cdc_hot_keys",
    doc="Hot-key census over the changelog: events per rid, global top-10 "
    "with deterministic (count desc, rid) tie-break — the skew diagnostic "
    "that decides when the keyed state store (rcache.py:224-259 analog) "
    "needs salting; TakeOrderedAndProject keeps it one shuffle + top-k.",
    tags=("cdc", "agg", "topk", "ref"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT CAST(o_orderkey AS VARCHAR) AS rid, count(*) AS n_events
FROM ch WHERE o_orderkey IS NOT NULL
GROUP BY 1
ORDER BY n_events DESC, rid LIMIT 10
""",
)
def cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    return (
        ch.filter(F.col("o_orderkey").isNotNull())
        .groupBy(F.col("o_orderkey").cast("string").alias("rid"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "rid")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# M2 ext: per-column update churn (which columns actually change)
# ---------------------------------------------------------------------------


@register(
    "cdc_update_column_churn",
    doc="Column-churn census: for each consecutive event pair per key "
    "(lag over seq within rid), count which payload columns changed — "
    "the reference merges rows wholesale (rcache.py:222, last values "
    "win), so it never knows that e.g. only o_totalprice mutates; this "
    "is the per-column delta profile a column-level merge would need.  "
    "One key-partitioned window, null-safe comparisons, unpivoted census.",
    tags=("cdc", "window", "ref"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
pairs AS (
  SELECT o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
         lag(o_custkey)      OVER w AS p_custkey,
         lag(o_orderstatus)  OVER w AS p_orderstatus,
         lag(o_totalprice)   OVER w AS p_totalprice,
         lag(o_orderdate)    OVER w AS p_orderdate,
         lag(o_orderpriority) OVER w AS p_orderpriority,
         lag(seq)            OVER w AS p_seq
  FROM ch WHERE o_orderkey IS NOT NULL
  WINDOW w AS (PARTITION BY o_orderkey ORDER BY seq)
), sums AS (
  SELECT
    count(*) AS n_pairs,
    sum(CASE WHEN o_custkey      IS DISTINCT FROM p_custkey      THEN 1 ELSE 0 END) AS c1,
    sum(CASE WHEN o_orderstatus  IS DISTINCT FROM p_orderstatus  THEN 1 ELSE 0 END) AS c2,
    sum(CASE WHEN o_totalprice   IS DISTINCT FROM p_totalprice   THEN 1 ELSE 0 END) AS c3,
    sum(CASE WHEN o_orderdate    IS DISTINCT FROM p_orderdate    THEN 1 ELSE 0 END) AS c4,
    sum(CASE WHEN o_orderpriority IS DISTINCT FROM p_orderpriority THEN 1 ELSE 0 END) AS c5
  FROM pairs WHERE p_seq IS NOT NULL
)
SELECT col AS column_name, n_changes, any_value(n_pairs) AS n_pairs FROM (
  SELECT 'o_custkey' AS col, c1 AS n_changes, n_pairs FROM sums
  UNION ALL SELECT 'o_orderstatus', c2, n_pairs FROM sums
  UNION ALL SELECT 'o_totalprice', c3, n_pairs FROM sums
  UNION ALL SELECT 'o_orderdate', c4, n_pairs FROM sums
  UNION ALL SELECT 'o_orderpriority', c5, n_pairs FROM sums
) GROUP BY col, n_changes ORDER BY col
""",
)
def cdc_update_column_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    w = Window.partitionBy("o_orderkey").orderBy("seq")
    pairs = ch.filter(F.col("o_orderkey").isNotNull()).select(
        "seq",
        *cols,
        F.lag("seq").over(w).alias("p_seq"),
        *[F.lag(c).over(w).alias(f"p_{c}") for c in cols],
    ).filter(F.col("p_seq").isNotNull())
    sums = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        *[
            F.sum(
                F.when(~F.col(c).eqNullSafe(F.col(f"p_{c}")), 1).otherwise(0)
            ).alias(f"chg_{c}")
            for c in cols
        ],
    )
    stack_expr = "stack({}, {}) as (column_name, n_changes)".format(
        len(cols), ", ".join(f"'{c}', chg_{c}" for c in cols)
    )
    return sums.select(F.expr(stack_expr), "n_pairs").orderBy("column_name")


# ---------------------------------------------------------------------------
# K5 ext: offset frontier per virtual binlog file (resume-point bookkeeping)
# ---------------------------------------------------------------------------


@register(
    "cdc_offset_frontier",
    doc="Resume-offset frontier: the reference persists (log_file, "
    "log_pos) after each event (cdc.py:106-107, cdc.py:134); modeling "
    "log rotation as seq div 1000, this computes per-file max offset + "
    "event count — exactly the checkpoint bookkeeping Structured "
    "Streaming's checkpointLocation replaces (SURVEY.md §2.8 K5/T1).",
    tags=("cdc", "agg", "ref"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT seq // 1000 AS log_file_id,
       max(seq)    AS frontier_pos,
       count(*)    AS n_events
FROM ch GROUP BY 1 ORDER BY 1
""",
)
def cdc_offset_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = orders_changelog(spark, sf_dir)
    return (
        ch.groupBy((F.col("seq") / 1000).cast("bigint").alias("log_file_id"))
        .agg(F.max("seq").alias("frontier_pos"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("log_file_id")
    )


@register(
    "cdc_net_action_census",
    doc="Net-effect census of the compaction algebra (M2, rcache.py:"
    "196-222): per key, the first arriving action and the folded net "
    "action (including the '#absent#' annihilation state), rolled up to "
    "a (first_action, net_action) contingency table with key and event "
    "counts — the operational view of how the merge table behaves on a "
    "real stream.  Spark folds JVM-side via F.aggregate; the oracle "
    "refolds independently with list_reduce.  One shuffle to keys, one "
    "to the tiny census.",
    tags=("cdc", "ref:M2", "census"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL})
SELECT first_action, net_action, count(*) AS n_keys,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM (
  SELECT o_orderkey,
         arg_min(cdc_action, seq) AS first_action,
         {_FOLD_LAMBDA} AS net_action,
         count(*) AS n_events
  FROM ch WHERE o_orderkey IS NOT NULL
  GROUP BY o_orderkey
)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def cdc_net_action_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import _fold_actions

    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey").isNotNull())
    per_key = ch.groupBy("o_orderkey").agg(
        F.min_by("cdc_action", "seq").alias("first_action"),
        _fold_actions(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "cdc_action"))),
                lambda x: x["cdc_action"],
            )
        ).alias("net_action"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_key.groupBy("first_action", "net_action")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("first_action", "net_action")
    )


@register(
    "cdc_out_of_order_census",
    doc="Out-of-orderness census — the watermark-sizing metric the "
    "reference only eyeballs via its latency warning (cdc.py:101-103, "
    "T2): per table, events whose event-time precedes the running "
    "event-time maximum in arrival (seq) order, with the worst and mean "
    "lateness.  One window over the per-table arrival order, one tiny "
    "aggregate; at 100 TB the window partitions by table and never "
    "globally sorts.",
    tags=("cdc", "ref:T2", "census"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}), lch AS ({LINEITEM_CHANGELOG_SQL}),
ch AS (
  SELECT seq, tbl, cdc_ts FROM och
  UNION ALL SELECT seq, tbl, cdc_ts FROM lch
), runmax AS (
  SELECT tbl, cdc_ts,
         max(cdc_ts) OVER (PARTITION BY tbl ORDER BY seq
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
  FROM ch
)
SELECT tbl, count(*) AS n_events,
       CAST(sum(CASE WHEN cdc_ts < hi THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(sum(CASE WHEN cdc_ts < hi THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS late_frac,
       CAST(max(CASE WHEN cdc_ts < hi
                THEN date_diff('second', cdc_ts, hi) END) AS BIGINT)
         AS max_lateness_s
FROM runmax GROUP BY tbl ORDER BY tbl
""",
)
def cdc_out_of_order_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    och = orders_changelog(spark, sf_dir).select("seq", "tbl", "cdc_ts")
    lch = lineitem_changelog(spark, sf_dir).select("seq", "tbl", "cdc_ts")
    ch = och.unionByName(lch)
    w = Window.partitionBy("tbl").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, -1
    )
    runmax = ch.select("tbl", "cdc_ts", F.max("cdc_ts").over(w).alias("hi"))
    late = F.col("cdc_ts") < F.col("hi")
    return (
        runmax.groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(late.cast("long")).alias("n_late"),
            F.round(F.sum(late.cast("long")) / F.count(F.lit(1)), 6).alias(
                "late_frac"
            ),
            F.max(
                F.when(
                    late,
                    F.unix_timestamp("hi") - F.unix_timestamp("cdc_ts"),
                )
            ).alias("max_lateness_s"),
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# M1/T5 ext: cross-table consistent snapshot cut
# ---------------------------------------------------------------------------

_CUT_TS = "1995-09-30"


@register(
    "cdc_consistent_cut_snapshot",
    doc="Transactionally consistent cross-table snapshot: BOTH changelogs "
    "(orders + lineitem) compacted under the same cdc_ts <= T cut, so "
    "the two reconstructed states describe one instant — the multi-table "
    "generalisation of cdc_state_time_travel (the reference replays one "
    "CSV per table with no cross-table cut, loadcsv.py:6-8).  Each side "
    "is one pushed-prefix scan + one shuffle; the per-table live-row "
    "summary (count + payload checksum) unions two 1-row aggregates.",
    tags=("cdc", "timetravel", "ext"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}),
lch AS ({LINEITEM_CHANGELOG_SQL}),
ostate AS (
  SELECT * FROM (
    SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(o_totalprice, seq) AS val
    FROM och WHERE o_orderkey IS NOT NULL AND cdc_ts <= DATE '{_CUT_TS}'
    GROUP BY 1
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
), lstate AS (
  SELECT * FROM (
    SELECT CAST(l_orderkey AS VARCHAR) || '&' || CAST(l_linenumber AS VARCHAR)
             AS rid,
           {_FOLD_LAMBDA} AS cdc_action,
           arg_max(l_quantity, seq) AS val
    FROM lch WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
          AND cdc_ts <= DATE '{_CUT_TS}'
    GROUP BY 1
  ) WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
)
SELECT 'orders' AS tbl, count(*) AS n_live, round(sum(val), 2) AS val_sum
FROM ostate
UNION ALL
SELECT 'lineitem' AS tbl, count(*) AS n_live, round(sum(val), 2) AS val_sum
FROM lstate
ORDER BY tbl
""",
)
def cdc_consistent_cut_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit(_CUT_TS).cast("date")

    def _summary(state: DataFrame, tbl: str, val_col: str) -> DataFrame:
        return (
            state.filter(F.col("cdc_action") != "delete")
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.round(F.sum(val_col), 2).alias("val_sum"),
            )
            .select(F.lit(tbl).alias("tbl"), "n_live", "val_sum")
        )

    o_state = compact(
        orders_changelog(spark, sf_dir).filter(F.col("cdc_ts") <= cut),
        ORDERS_PK,
        ORDERS_PAYLOAD,
    )
    l_state = compact(
        lineitem_changelog(spark, sf_dir).filter(F.col("cdc_ts") <= cut),
        LINEITEM_PK,
        LINEITEM_PAYLOAD,
    )
    return (
        _summary(o_state, "orders", "o_totalprice")
        .unionAll(_summary(l_state, "lineitem", "l_quantity"))
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# A1/M1 ext: compaction write-amplification diagnostic
# ---------------------------------------------------------------------------


@register(
    "cdc_compaction_amplification",
    doc="Cache-sizing diagnostic the reference's cache_max_rows knob "
    "(cdc_config.py:42) needs but never reports: per table, changelog "
    "events in vs distinct keys vs live rows out after the fold — "
    "events-per-key amplification and the tombstone share.  Event "
    "counts are plain aggregates over each changelog; live counts "
    "reuse the one-shuffle compaction.  Two 1-row summaries unioned.",
    tags=("cdc", "diagnostics", "ext"),
    oracle=f"""
WITH och AS ({ORDERS_CHANGELOG_SQL}),
lch AS ({LINEITEM_CHANGELOG_SQL}),
ostate AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS rid, {_FOLD_LAMBDA} AS cdc_action
  FROM och WHERE o_orderkey IS NOT NULL GROUP BY 1
), lstate AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '&' || CAST(l_linenumber AS VARCHAR)
           AS rid, {_FOLD_LAMBDA} AS cdc_action
  FROM lch WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
  GROUP BY 1
)
SELECT 'orders' AS tbl,
       (SELECT count(*) FROM och) AS n_events,
       (SELECT count(*) FROM ostate) AS n_keys,
       (SELECT count(*) FROM ostate
        WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete'))
         AS n_live,
       round((SELECT count(*) FROM och) * 1.0
             / (SELECT count(*) FROM ostate), 4) AS events_per_key
UNION ALL
SELECT 'lineitem',
       (SELECT count(*) FROM lch),
       (SELECT count(*) FROM lstate),
       (SELECT count(*) FROM lstate
        WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')),
       round((SELECT count(*) FROM lch) * 1.0
             / (SELECT count(*) FROM lstate), 4)
ORDER BY tbl
""",
)
def cdc_compaction_amplification(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _side(ch: DataFrame, pk, payload, tbl: str) -> DataFrame:
        # compact() drops annihilated keys (insert∘delete folds to the
        # sentinel and vanishes), so the key census comes straight from
        # the changelog — one distinct aggregate over the pk tuple
        state = compact(ch, pk, payload)
        not_null = ch
        for c in pk:
            not_null = not_null.filter(F.col(c).isNotNull())
        ev = ch.agg(F.count(F.lit(1)).alias("n_events")).crossJoin(
            F.broadcast(
                not_null.agg(F.countDistinct(*pk).alias("n_keys"))
            )
        )
        keys = state.agg(
            F.sum(
                F.when(F.col("cdc_action") != "delete", 1).otherwise(0)
            ).alias("n_live"),
        )
        return ev.crossJoin(F.broadcast(keys)).select(
            F.lit(tbl).alias("tbl"),
            "n_events",
            "n_keys",
            "n_live",
            F.round(F.col("n_events") / F.col("n_keys"), 4).alias("events_per_key"),
        )

    o = _side(
        orders_changelog(spark, sf_dir), ORDERS_PK, ORDERS_PAYLOAD, "orders"
    )
    li = _side(
        lineitem_changelog(spark, sf_dir),
        LINEITEM_PK,
        LINEITEM_PAYLOAD,
        "lineitem",
    )
    return o.unionAll(li).orderBy("tbl")


# ---------------------------------------------------------------------------
# M2 ext: partial row-image updates (per-column last-non-null coalesce)
# ---------------------------------------------------------------------------


@register(
    "cdc_partial_image_coalesce",
    doc="Partial-update CDC semantics: update events carry only the "
    "changed columns (the others NULL, as MySQL minimal row images / "
    "JSON merge-patch feeds do), so the fold must coalesce PER COLUMN — "
    "last non-null value wins independently for each field, while the "
    "action algebra still folds over the full event sequence.  One "
    "max_by(col, seq-if-non-null) per payload column inside the same "
    "single-shuffle aggregate; the reference's whole-row HMSET "
    "(rcache.py:247-254) cannot express this.  Partial images are "
    "synthesized from the changelog by seq parity.",
    tags=("cdc", "ref:M2", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
partial AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS rid, seq, cdc_action,
         CASE WHEN cdc_action = 'update' AND seq % 2 = 1 THEN NULL
              ELSE o_orderstatus END AS st,
         CASE WHEN cdc_action = 'update' AND seq % 2 = 0 THEN NULL
              ELSE o_totalprice END AS tp
  FROM ch WHERE o_orderkey IS NOT NULL
), fold AS (
  SELECT rid,
         {_FOLD_LAMBDA} AS cdc_action,
         arg_max(st, CASE WHEN st IS NOT NULL THEN seq END) AS o_orderstatus,
         arg_max(tp, CASE WHEN tp IS NOT NULL THEN seq END) AS o_totalprice
  FROM partial GROUP BY rid
)
SELECT rid, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM fold
WHERE cdc_action NOT IN ('{ACTION_FOLD_SENTINEL}', 'delete')
ORDER BY rid
""",
)
def cdc_partial_image_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import _fold_actions

    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey").isNotNull())
    upd = F.col("cdc_action") == "update"
    partial = ch.select(
        F.col("o_orderkey").cast("string").alias("rid"),
        "seq",
        "cdc_action",
        F.when(upd & (F.col("seq") % 2 == 1), F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("st"),
        F.when(upd & (F.col("seq") % 2 == 0), F.lit(None)).otherwise(
            F.col("o_totalprice")
        ).alias("tp"),
    )
    folded = partial.groupBy("rid").agg(
        _fold_actions(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "cdc_action"))),
                lambda s: s.cdc_action,
            )
        ).alias("cdc_action"),
        F.max_by(
            "st", F.when(F.col("st").isNotNull(), F.col("seq"))
        ).alias("o_orderstatus"),
        F.max_by(
            "tp", F.when(F.col("tp").isNotNull(), F.col("seq"))
        ).alias("o_totalprice"),
    )
    return (
        folded.filter(
            ~F.col("cdc_action").isin(ACTION_FOLD_SENTINEL, "delete")
        )
        .select("rid", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("rid")
    )


# ---------------------------------------------------------------------------
# M3 ext: dead-letter routing (quarantine with reasons, clean stream on)
# ---------------------------------------------------------------------------


@register(
    "cdc_dead_letter_routing",
    doc="Dead-letter-queue pattern over the changelog: events are "
    "classified in ONE pass — null key (the reference's SaveIgnore, "
    "rcache.py:231-236), unknown action verb, or timestamp outside the "
    "valid horizon — with the FIRST failing rule recorded as the DLQ "
    "reason; clean events pass through untouched.  A single scan "
    "produces the routing census (reason × table counts + clean "
    "share), the operational view the reference's warn-and-drop "
    "(mwlogger) never aggregates.  Corrupt events are synthesized "
    "from the changelog by seq pattern so both engines see the same "
    "damage.",
    tags=("cdc", "ref:M3", "quality", "ext"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
damaged AS (
  SELECT CASE WHEN seq % 97 = 0 THEN NULL ELSE o_orderkey END AS k,
         CASE WHEN seq % 89 = 0 THEN 'upsert?' ELSE cdc_action END AS act,
         CASE WHEN seq % 83 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
              ELSE cdc_ts END AS ts2
  FROM ch
), routed AS (
  SELECT CASE WHEN k IS NULL THEN 'null_key'
              WHEN act NOT IN ('insert', 'update', 'delete')
                THEN 'unknown_action'
              WHEN ts2 < TIMESTAMP '1990-01-01 00:00:00' THEN 'stale_ts'
              ELSE 'clean' END AS route
  FROM damaged
)
SELECT route, count(*) AS n_events,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM routed GROUP BY route ORDER BY route
""",
)
def cdc_dead_letter_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ch = orders_changelog(spark, sf_dir)
    damaged = ch.select(
        F.when(F.col("seq") % 97 == 0, F.lit(None)).otherwise(
            F.col("o_orderkey")
        ).alias("k"),
        F.when(F.col("seq") % 89 == 0, F.lit("upsert?")).otherwise(
            F.col("cdc_action")
        ).alias("act"),
        F.when(
            F.col("seq") % 83 == 0,
            F.lit("1970-01-01 00:00:00").cast("timestamp"),
        ).otherwise(F.col("cdc_ts").cast("timestamp")).alias("ts2"),
    )
    route = (
        F.when(F.col("k").isNull(), "null_key")
        .when(~F.col("act").isin("insert", "update", "delete"), "unknown_action")
        .when(F.col("ts2") < F.lit("1990-01-01 00:00:00").cast("timestamp"), "stale_ts")
        .otherwise("clean")
    )
    routed = damaged.select(route.alias("route"))
    w_all = Window.partitionBy()
    return (
        routed.groupBy("route")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "route",
            "n_events",
            F.round(
                F.col("n_events") / F.sum("n_events").over(w_all), 6
            ).alias("share"),
        )
        .orderBy("route")
    )


# ---------------------------------------------------------------------------
# K1 + A4: drift-quarantine CSV sink (dump2csv.py:77-87)
# ---------------------------------------------------------------------------


@register(
    "cdc_dump_drift_quarantine",
    doc="K1 sink with drift routing (dump2csv.py:77-81): a table observed "
    "with >1 schema fingerprint is 'maybe altered' and ALL its rows are "
    "written under the quarantine path (reference: `.tmp` suffix; here "
    "`<out_dir>/.drifted/`), clean tables under `<out_dir>/`.  Because "
    "the quarantine dir is dot-prefixed, Spark's file listing hides it "
    "from normal scans of the dump — the same load-protection the "
    "reference gets from loadcsv only globbing `*.csv`.  The query dumps "
    "a clean lineitem feed plus an orders feed where 1-in-11 rows carry "
    "a drifted fingerprint, reads both paths back and proves the split.",
    tags=("cdc", "sink", "ref:K1", "ref:A4"),
    oracle="""
SELECT * FROM (
  SELECT 'lineitem' AS tbl, FALSE AS quarantined,
         count(*) AS n_rows, CAST(1 AS BIGINT) AS n_fingerprints
  FROM lineitem
  UNION ALL
  SELECT 'orders', TRUE, count(*), CAST(2 AS BIGINT) FROM orders
) ORDER BY tbl
""",
)
def cdc_dump_drift_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StructType

    from ..operators.dump import QUARANTINE_SUBDIR, dump_to_csv_with_quarantine

    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("tbl"),
        F.concat_ws("&", "l_orderkey", "l_linenumber").alias("rid"),
        F.lit("l_linenumber,l_orderkey,l_quantity").alias("fingerprint"),
        F.col("l_shipdate").alias("evt_ts"),
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("tbl"),
        F.col("o_orderkey").cast("string").alias("rid"),
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.lit("o_comment,o_orderkey,o_totalprice"),
        ).otherwise(F.lit("o_orderkey,o_totalprice")).alias("fingerprint"),
        F.col("o_orderdate").alias("evt_ts"),
    )
    feed = li.unionByName(od)
    # per-invocation unique staging + exit-time cleanup (no fixed shared
    # /tmp path — cross-session overwrite race, round-4 verdict item 2)
    import atexit
    import shutil

    out_dir = tempfile.mkdtemp(prefix="cdc_drift_quarantine_")
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    dump_to_csv_with_quarantine(feed, out_dir, date_col="evt_ts", fmt="yyyyMM")

    schema = (
        StructType()
        .add("tbl", "string")
        .add("rid", "string")
        .add("fingerprint", "string")
        .add("dt", "string")
    )
    clean = spark.read.option("header", True).schema(schema).csv(out_dir)
    quar = spark.read.option("header", True).schema(schema).csv(
        f"{out_dir}/{QUARANTINE_SUBDIR}"
    )
    back = clean.withColumn("quarantined", F.lit(False)).unionByName(
        quar.withColumn("quarantined", F.lit(True))
    )
    return (
        back.groupBy("tbl", "quarantined")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("fingerprint").alias("n_fingerprints"),
        )
        .orderBy("tbl")
    )


# ---------------------------------------------------------------------------
# P5/T2: throttled latency alert feed (mwlogger.py:176-218, cdc.py:101-103)
# ---------------------------------------------------------------------------


@register(
    "cdc_latency_alert_feed",
    doc="P5/T2 alert sink: the reference warns per late binlog event "
    "(cdc.py:101-103) through a throttled syslog/UDP event logger "
    "(mwlogger.py:176-218).  Declarative spelling: one structured alert "
    "row per (table, day) bucket over the late slice of the changelog — "
    "alert name, severity, bucket, late count, worst lag.  'now' is "
    "pinned to 1998-08-02 and the threshold to 2 years so the late set "
    "is deterministic.",
    tags=("cdc", "alerting", "ref:P5", "ref:T2"),
    oracle=f"""
WITH ch AS ({ORDERS_CHANGELOG_SQL}),
late AS (
  SELECT tbl, cdc_ts,
         CAST(epoch(TIMESTAMP '1998-08-02 00:00:00') - epoch(cdc_ts) AS BIGINT) AS lag_s
  FROM ch
  WHERE CAST(epoch(TIMESTAMP '1998-08-02 00:00:00') - epoch(cdc_ts) AS BIGINT) > 63072000
)
SELECT 'binlog_max_latency' AS alert, 'warn' AS severity, tbl,
       CAST(date_trunc('day', cdc_ts) AS TIMESTAMP) AS bucket,
       count(*) AS n_late, max(lag_s) AS max_lag_s
FROM late GROUP BY tbl, bucket ORDER BY bucket
""",
)
def cdc_latency_alert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.policies import latency_alert_feed

    ch = orders_changelog(spark, sf_dir)
    now = F.lit("1998-08-02 00:00:00").cast("timestamp")
    return latency_alert_feed(ch, now, max_latency_s=63_072_000).orderBy("bucket")


@register(
    "cdc_parse_debezium_robust",
    doc="S1 production path, hardened: a synthesized Kafka feed mixing "
    "valid Debezium envelopes with the three message classes a real "
    "consumer must survive — Kafka tombstones (NULL value after a "
    "delete on log-compacted topics), heartbeat envelopes (payload "
    "without op), and corrupt JSON (dead-lettered, never a job "
    "failure).  classify_debezium dispositions every message with JVM "
    "expressions; the census plus an event-seq checksum prove exactly "
    "the right messages survive to the parser.",
    tags=("cdc", "debezium", "robust", "ref:S1"),
    oracle="""
SELECT * FROM (
  SELECT 'corrupt' AS disposition, count(*) AS n,
         CAST(NULL AS BIGINT) AS event_seq_checksum
  FROM orders WHERE o_orderkey % 10 = 9
  UNION ALL
  SELECT 'event', count(*), CAST(sum(o_orderkey) AS BIGINT)
  FROM orders WHERE o_orderkey % 10 NOT IN (7, 8, 9)
  UNION ALL
  SELECT 'heartbeat', count(*), NULL
  FROM orders WHERE o_orderkey % 10 = 8
  UNION ALL
  SELECT 'kafka_tombstone', count(*), NULL
  FROM orders WHERE o_orderkey % 10 = 7
) ORDER BY disposition
""",
)
def cdc_parse_debezium_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StructType

    from ..sources.debezium import classify_debezium

    orders = load_table(spark, sf_dir, "orders")
    row = F.struct(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    op = F.element_at(
        F.array(F.lit("c"), F.lit("u"), F.lit("d"), F.lit("r")),
        (F.col("o_orderkey") % 4).cast("int") + 1,
    )
    valid = F.to_json(
        F.struct(
            F.struct(
                F.when(op == "d", row).alias("before"),
                F.when(op != "d", row).alias("after"),
                op.alias("op"),
                (F.unix_timestamp("o_orderdate") * 1000).alias("ts_ms"),
                F.struct(
                    F.lit("tpch").alias("db"),
                    F.lit("orders").alias("table"),
                    F.col("o_orderkey").alias("pos"),
                ).alias("source"),
            ).alias("payload")
        )
    )
    heartbeat = F.to_json(
        F.struct(
            F.struct((F.unix_timestamp("o_orderdate") * 1000).alias("ts_ms")).alias(
                "payload"
            )
        )
    )
    klass = F.col("o_orderkey") % 10
    value = (
        F.when(klass == 7, F.lit(None).cast("string"))  # kafka tombstone
        .when(klass == 8, heartbeat)
        .when(klass == 9, F.concat(F.lit("{broken"), F.col("o_orderkey").cast("string")))
        .otherwise(valid)
    )
    raw = orders.select(value.alias("value"))
    row_schema = (
        StructType()
        .add("o_orderkey", "long")
        .add("o_custkey", "long")
        .add("o_totalprice", "double")
    )
    classified = classify_debezium(raw, row_schema)
    return (
        classified.groupBy("disposition")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.when(
                F.max(F.col("disposition") == "event"),
                F.sum(F.col("envelope.payload.source.pos")),
            ).alias("event_seq_checksum"),
        )
        .orderBy("disposition")
    )
