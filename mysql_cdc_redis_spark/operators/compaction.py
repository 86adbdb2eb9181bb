"""Changelog compaction — the reference's core operator family (SURVEY.md
§2.3, M1-M5): an incremental keyed upsert that folds a stream of
insert/update/delete row events down to at most one row per primary key.

Reference semantics being reproduced:

* ``_gen_rid`` (rcache.py:186-193): composite keys serialize by joining
  stringified values with ``"&"``; missing/derivable-to-null keys raise
  ``SaveIgnore`` (rcache.py:242-245) and the event is dropped (M3).
* ``_merge_row`` (rcache.py:196-222): a left-fold over per-key events of
  the action algebra

      empty  + x       -> x
      insert + delete  -> empty            (annihilation: row vanishes,
                                            rcache.py:214-215)
      insert + x       -> insert           (x in {insert, update})
      update + insert  -> update           ("maybe truncate table
                                            happened", rcache.py:218-221)
      delete + insert  -> update           (rcache.py:216-217)
      state  + x       -> x                (all other pairs keep new)

  with *values always taken wholesale from the newest event*
  (rcache.py:222 — no per-column merge).
* ``save`` (rcache.py:224-259): HGETALL -> merge -> HMSET/DEL per key;
  idempotent on replay (M5).

Spark realization — one shuffle, all JVM built-ins, no Python UDFs:

  groupBy(tbl, rid).agg(
      max_by(struct(payload), seq)          # last values win wholesale
      array_sort(collect_list(struct(seq, action)))   # per-key event log
  )
  + F.aggregate(...) fold of the action algebra over the sorted actions
  + filter(state != SENTINEL)               # annihilated keys vanish

Per-key event counts are bounded by the changelog between compactions
(the reference flushes at cache_max_rows=2e6, cdc_config.py:42), so the
collect_list stays small; the aggregate itself is a standard partial/
final hash aggregate that scales linearly with executors.  The streaming
twin (streaming/compact_stream.py) holds (fold_state, last_row) per key
in the state store — O(1) per event — and must produce identical output
(tested in tests/test_streaming_parity.py).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fold state meaning "row absent" — both the initial state (empty cache)
# and the post-annihilation state are the same absent state.  Plain ASCII
# (never a valid action) so the DuckDB oracle can spell it identically.
ACTION_FOLD_SENTINEL = "#absent#"


def rid_expr(pk_cols: list[str] | tuple[str, ...]) -> Column:
    """P3: composite row-id — ``"&".join(str(v) for v in pk)`` per
    rcache.py:186-193.  NULL in any key component nullifies the rid
    (concat_ws would silently skip nulls, which would alias distinct
    keys — explicitly propagate NULL instead) so M3 can reject it."""
    any_null = reduce(or_, [F.col(c).isNull() for c in pk_cols])
    return F.when(any_null, F.lit(None)).otherwise(
        F.concat_ws("&", *[F.col(c).cast("string") for c in pk_cols])
    )


def with_rid(df: DataFrame, pk_cols: list[str] | tuple[str, ...]) -> DataFrame:
    return df.withColumn("rid", rid_expr(pk_cols))


def reject_null_keys(df: DataFrame, pk_cols: list[str] | tuple[str, ...]) -> DataFrame:
    """M3: the SaveIgnore reject stream (rcache.py:242-245) — events whose
    key cannot be derived.  The caller logs/sinks these; compaction drops
    them."""
    return with_rid(df, pk_cols).filter(F.col("rid").isNull())


def _fold_actions(sorted_actions: Column) -> Column:
    """Left-fold the reference's `_merge_row` algebra (rcache.py:196-222)
    over a seq-sorted array of action strings.  Runs entirely in JVM
    codegen via F.aggregate."""
    sentinel = F.lit(ACTION_FOLD_SENTINEL)

    def merge(state: Column, x: Column) -> Column:
        return (
            F.when(state == sentinel, x)  # empty + x -> x
            .when(
                state == "insert",
                F.when(x == "delete", sentinel).otherwise(F.lit("insert")),
            )
            # state in {update, delete}: insert revives to update
            # (rcache.py:216-221); update/delete keep the new action.
            .otherwise(F.when(x == "insert", F.lit("update")).otherwise(x))
        )

    return F.aggregate(sorted_actions, sentinel, merge)


def compact(
    changelog: DataFrame,
    pk_cols: list[str] | tuple[str, ...],
    payload_cols: list[str] | tuple[str, ...],
    table_col: str = "tbl",
    seq_col: str = "seq",
    action_col: str = "cdc_action",
) -> DataFrame:
    """M1+M2: fold a changelog to ≤1 row per (table, rid).

    Returns columns: ``tbl, rid, cdc_action`` + payload (last event's
    values, wholesale).  Annihilated keys (insert...delete epochs) are
    absent; tombstones (first action delete/update then delete) survive
    with cdc_action='delete' — exactly rcache.py:214 firing only on
    old=insert.
    """
    keyed = with_rid(changelog, pk_cols).filter(F.col("rid").isNotNull())
    grouped = keyed.groupBy(F.col(table_col).alias("tbl"), "rid").agg(
        # last values win wholesale (rcache.py:222); seq is unique so
        # max_by is deterministic.
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), F.col(seq_col)).alias("_last"),
        # per-key ordered action log; sorted by seq (struct sort order is
        # field order, seq first).
        F.array_sort(
            F.collect_list(F.struct(F.col(seq_col).alias("s"), F.col(action_col).alias("a")))
        ).alias("_evs"),
    )
    folded = grouped.withColumn(
        "cdc_action",
        _fold_actions(F.transform(F.col("_evs"), lambda ev: ev["a"])),
    )
    alive = folded.filter(F.col("cdc_action") != ACTION_FOLD_SENTINEL)
    return alive.select("tbl", "rid", "cdc_action", "_last.*")


# ---------------------------------------------------------------------------
# Stream-shaping filters (S2/S3) and the latency monitor (P5)
# ---------------------------------------------------------------------------


def merge_state(
    state: DataFrame,
    new_changelog: DataFrame,
    pk_cols: list[str] | tuple[str, ...],
    payload_cols: list[str] | tuple[str, ...],
    table_col: str = "tbl",
    seq_col: str = "seq",
) -> DataFrame:
    """Incremental compaction — the reference's continuous-ingest shape
    (SURVEY.md §4 'incremental computation': only changed rows flow;
    state holds ≤1 row per key).

    A compacted state re-enters the merge as a changelog whose per-key
    event is its stored action (exactly what the save path does when it
    HGETALLs the old row before merging, rcache.py:246-254).  Replaying
    state events with seq = -∞ (below every new seq) and folding the
    union through the same algebra reproduces event-at-a-time ingestion:
    state action ∘ new events ≡ fold(state_events ++ new_events).

    Batch cost per increment ∝ |state keys touched| + |new events| after
    the groupBy — at scale, partition the state by bucket(rid) so the
    union co-locates."""
    state_as_events = state.withColumn(seq_col, F.lit(-(2**62)).cast("long")).select(
        [table_col, seq_col, "cdc_action", *payload_cols]
    )
    fresh = with_rid(new_changelog, pk_cols).filter(F.col("rid").isNotNull()).select(
        [table_col, seq_col, "cdc_action", *payload_cols]
    )
    unioned = state_as_events.unionByName(fresh)
    # state rows already carry their rid-able pk columns in the payload
    return compact(unioned, pk_cols, payload_cols, table_col, seq_col)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    payload_cols: list[str] | tuple[str, ...],
    action_col: str = "cdc_action",
    delete_action: str = "delete",
) -> DataFrame:
    """SQL MERGE semantics — the durable-warehouse form of the K4 state
    sink (SURVEY.md §1.1: "durable form: Delta-style upsert or
    foreachBatch MERGE").  Applies a compacted changelog state to a
    target snapshot:

      WHEN MATCHED AND s.action = 'delete'  THEN DELETE
      WHEN MATCHED                          THEN UPDATE SET * = s.*
      WHEN NOT MATCHED AND s.action <> 'delete' THEN INSERT *

    (an unmatched delete is a no-op, exactly like rcache.py:252-254
    DEL-ing a key that was never cached).

    One full-outer sort-merge join on the key — at 100 TB bucket both
    sides by the key (operators/scale.py::write_bucketed) so the merge
    runs Exchange-free; with Delta/Iceberg this whole function becomes
    the engine's native MERGE INTO command."""
    from operator import and_

    t = target.select(*payload_cols).withColumn("_t", F.lit(True)).alias("t")
    s = source.select(*payload_cols, action_col).withColumn("_s", F.lit(True)).alias("s")
    on = reduce(and_, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols])
    joined = t.join(s, on, "full_outer")
    source_live = F.col("s._s").isNotNull() & (F.col(f"s.{action_col}") != delete_action)
    target_kept = F.col("s._s").isNull() & F.col("t._t").isNotNull()
    return joined.filter(source_live | target_kept).select(
        *[
            F.when(source_live, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in payload_cols
        ]
    )


def filter_events(df: DataFrame, events: list[str] | None, action_col: str = "cdc_action") -> DataFrame:
    """S2: restrict to configured event classes (`_trans_events`,
    cdc.py:43-49).  None ≡ all events (cdc_config.py:39 default)."""
    if not events:
        return df
    return df.filter(F.col(action_col).isin(*events))


def filter_tables(
    df: DataFrame,
    schemas: list[str] | None = None,
    tables: list[str] | None = None,
    db_col: str = "db",
    table_col: str = "tbl",
) -> DataFrame:
    """S3: only_schemas / only_tables pushdown (cdc.py:92-93); None ≡ all.
    On a parquet/Delta-backed changelog these predicates push into the
    scan (partition pruning when the changelog is partitioned by table)."""
    if schemas:
        df = df.filter(F.col(db_col).isin(*schemas))
    if tables:
        df = df.filter(F.col(table_col).isin(*tables))
    return df


def latency_flag(
    df: DataFrame,
    now: Column,
    max_latency_s: int = 60_000,
    ts_col: str = "cdc_ts",
) -> DataFrame:
    """P5: flag events older than binlog_max_latency (warn-only in the
    reference, cdc.py:101-103; default 60,000 s, cdc_config.py:48).
    Streaming form: an observe() metric; batch form: a boolean column."""
    return df.withColumn(
        "late",
        (F.unix_timestamp(now) - F.unix_timestamp(F.col(ts_col))) > max_latency_s,
    )


def scd2_history(
    changelog: DataFrame,
    pk_cols: list[str] | tuple[str, ...],
    payload_cols: list[str] | tuple[str, ...],
    table_col: str = "tbl",
    seq_col: str = "seq",
    ts_col: str = "cdc_ts",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) view of the changelog: instead
    of compacting to the latest row (M1), keep EVERY version with its
    validity interval — valid_from = its event time, valid_to = the next
    event's time (null = still current), is_current flag.

    The reference only materializes latest-state (Redis overwrite,
    rcache.py:246-251); this is the standard warehouse-side history the
    same changelog supports for free once it's in Spark.  One window over
    (tbl, rid) ordered by seq — same single shuffle as compact()."""
    from pyspark.sql.window import Window

    keyed = with_rid(changelog, pk_cols).filter(F.col("rid").isNotNull())
    w = Window.partitionBy(table_col, "rid").orderBy(seq_col)
    return keyed.select(
        F.col(table_col).alias("tbl"),
        "rid",
        F.col("cdc_action"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        (F.lead(seq_col).over(w).isNull()).alias("is_current"),
        F.row_number().over(w).alias("version"),
        *[F.col(c) for c in payload_cols if c not in (ts_col,)],
    )


def state_diff(
    old_state: DataFrame,
    new_state: DataFrame,
    payload_cols: list[str] | tuple[str, ...],
    rid_col: str = "rid",
    action_col: str = "cdc_action",
) -> DataFrame:
    """Change-data-feed synthesis: diff two compacted states into the
    minimal changelog that transforms one into the other — the INVERSE
    of ``compact`` (the reference can only replay recorded events
    forward; snapshot-diff recovers a change feed even where the binlog
    was lost or never captured, e.g. bootstrapping CDC from two
    warehouse snapshots).

    Live rows (non-tombstones) of each side full-outer-join on rid:
    present only in new → insert; only in old → delete; both but any
    payload column differs (null-safe) → update.  One shuffle on rid —
    at 100 TB both states are already rid-keyed parquet, so with
    bucketed layouts even that exchange disappears.

    Returns (rid, change_type, before_<c>/after_<c> per payload col).
    """
    def live(df: DataFrame, side: str) -> DataFrame:
        return df.filter(F.col(action_col) != "delete").select(
            F.col(rid_col).alias("rid"),
            F.lit(True).alias(f"_{side}"),
            *[F.col(c).alias(f"{side}_{c}") for c in payload_cols],
        )

    o, n = live(old_state, "before"), live(new_state, "after")
    j = o.join(n, "rid", "full_outer")
    differs = reduce(
        or_,
        [
            ~F.col(f"before_{c}").eqNullSafe(F.col(f"after_{c}"))
            for c in payload_cols
        ],
    )
    change = (
        F.when(F.col("_before").isNull(), "insert")
        .when(F.col("_after").isNull(), "delete")
        .otherwise("update")
    )
    return (
        j.withColumn("change_type", change)
        .where((F.col("change_type") != "update") | differs)
        .select(
            "rid",
            "change_type",
            *[f"before_{c}" for c in payload_cols],
            *[f"after_{c}" for c in payload_cols],
        )
    )
