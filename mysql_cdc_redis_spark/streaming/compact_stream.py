"""Streaming twin of the batch compaction operator (SURVEY.md §7 Phase 3,
§2.8 T1-T4; reference cdc.py event loop + rcache.py save path).

The reference's live path is: binlog stream -> per-event HGETALL ->
_merge_row -> HMSET/DEL (rcache.py:224-259), with offsets committed after
each save (cdc.py:134, at-least-once).  The Spark twin is:

    readStream (file changelog)                      # S1
      -> applyInPandasWithState keyed by (tbl, rid)  # T4: the cache
      -> memory/parquet sink, checkpointed           # K5: offsets

State per key = (fold_state, last_seq, payload_json): O(1) per event,
exactly the (first_action, last_row) pair SURVEY.md M2 identifies.  The
payload rides as a JSON string — faithful to the reference, where every
cached value degrades to a string in Redis (rcache.py:139); typed
columns are restored JVM-side with from_json after the fold.

Annihilation removes the key's state entirely (state.remove()), so a
later insert starts a fresh epoch from the empty state — identical to
the batch fold's sentinel reset.  Each update-mode emission carries
last_seq; the final answer per key is the emission with the largest
last_seq (finalize_stream_output), letting the parity test assert
stream ≡ batch on any micro-batch slicing.

Delivery: Spark checkpoints offsets+state (exactly-once within the
pipeline), strictly stronger than the reference's at-least-once; the
compaction stays idempotent anyway (M5), as the reference's replay
safety requires.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.compaction import ACTION_FOLD_SENTINEL, rid_expr

_OUTPUT_SCHEMA = StructType(
    [
        StructField("tbl", StringType()),
        StructField("rid", StringType()),
        StructField("cdc_action", StringType()),
        StructField("last_seq", LongType()),
        StructField("payload_json", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("fold_state", StringType()),
        StructField("last_seq", LongType()),
        StructField("payload_json", StringType()),
    ]
)


def _fold(state: str, action: str) -> str:
    """The rcache.py:196-222 merge table — same algebra as the batch
    _fold_actions, scalar form."""
    if state == ACTION_FOLD_SENTINEL:
        return action
    if state == "insert":
        return ACTION_FOLD_SENTINEL if action == "delete" else "insert"
    return "update" if action == "insert" else action


def _compact_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # This body runs once PER KEY (365k calls at sf0.1), so its constant
    # factor IS the operator's throughput (guide §4.2: vectorize the
    # per-batch work).  r9: the pandas-idiom body (sort_values + iloc +
    # per-row Series access) measured ~510 µs/key; the ndarray form
    # below is ~33 µs/key for the identical fold — argsort the seq
    # array, fold over the reordered action array, argmax for the
    # newest payload.  The per-key emission must remain a fresh
    # pd.DataFrame (the applyInPandasWithState contract), which is now
    # the dominant per-key cost (~370 µs, irreducible at this API).
    tbl, rid = key
    if state.exists:
        fold_state, last_seq, payload_json = state.get
    else:
        fold_state, last_seq, payload_json = ACTION_FOLD_SENTINEL, -1, None

    for pdf in pdfs:
        seqs = pdf["seq"].values
        acts = pdf["cdc_action"].values
        for i in seqs.argsort(kind="stable"):
            fold_state = _fold(fold_state, acts[i])
        # argmax picks the FIRST row among tied max seqs where the old
        # sort_values+iloc[-1] picked the last; seq is unique per key
        # (binlog position), so ties cannot occur (r9 ADVICE #5)
        imax = int(seqs.argmax())
        if int(seqs[imax]) > last_seq:
            last_seq = int(seqs[imax])
            payload_json = pdf["payload_json"].values[imax]

    if fold_state == ACTION_FOLD_SENTINEL:
        # row vanished: drop the key's state so a future insert starts a
        # fresh epoch (batch-fold sentinel reset), but still emit the
        # annihilation so downstream can retract earlier emissions.
        state.remove()
    else:
        state.update((fold_state, last_seq, payload_json))
    yield pd.DataFrame(
        {
            "tbl": (tbl,),
            "rid": (rid,),
            "cdc_action": (fold_state,),
            "last_seq": (last_seq,),
            "payload_json": (payload_json,),
        }
    )


def compact_stream(
    changelog: DataFrame,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    table_col: str = "tbl",
) -> DataFrame:
    """Wire the stateful compactor onto a (streaming) changelog
    DataFrame.  Returns the update-mode emission stream."""
    keyed = (
        changelog.withColumn("rid", rid_expr(pk_cols))
        .filter(F.col("rid").isNotNull())  # M3 reject path
        .withColumn("payload_json", F.to_json(F.struct(*[F.col(c) for c in payload_cols])))
        .select(F.col(table_col).alias("tbl"), "rid", "seq", "cdc_action", "payload_json")
    )
    return keyed.groupBy("tbl", "rid").applyInPandasWithState(
        _compact_group,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_stream_output(
    emissions: DataFrame, payload_schema: StructType
) -> DataFrame:
    """Collapse update-mode emissions to the final state: per key keep the
    emission with the largest last_seq, drop annihilated keys, restore
    typed payload columns from JSON."""
    final = (
        emissions.groupBy("tbl", "rid")
        .agg(
            F.max_by(
                F.struct("cdc_action", "last_seq", "payload_json"), F.col("last_seq")
            ).alias("m")
        )
        .select("tbl", "rid", F.col("m.cdc_action").alias("cdc_action"), F.col("m.payload_json").alias("payload_json"))
        .filter(F.col("cdc_action") != ACTION_FOLD_SENTINEL)
    )
    return final.select(
        "tbl",
        "rid",
        "cdc_action",
        F.from_json("payload_json", payload_schema).alias("p"),
    ).select("tbl", "rid", "cdc_action", "p.*")


def run_compaction_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    emissions_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """End-to-end run in the reference's blocking=False mode
    (cdc_config.py:36): consume everything currently available
    (trigger(availableNow)), then return the finalized compacted state.

    source_dir: directory of changelog parquet files (the file-backed
    stand-in for the binlog stream, same columns — SURVEY.md S1).

    Emissions land in emissions_dir via foreachBatch parquet appends —
    the T7 dump-pipeline fan-out shape — which, unlike the memory sink,
    supports checkpoint recovery: a restarted query resumes from the
    committed offsets (K5/T1) with state intact."""
    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    emissions = compact_stream(stream, pk_cols, payload_cols)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        # _batch_id stamped so at-least-once replayed batches are
        # identifiable by downstream exact-log consumers (round-5
        # advice); the finalize itself is replay-immune (max last_seq)
        batch_df.withColumn("_batch_id", F.lit(_batch_id)).write.mode(
            "append"
        ).parquet(emissions_dir)

    q = (
        emissions.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    payload_schema = StructType([source_schema[c] for c in payload_cols])
    return finalize_stream_output(spark.read.parquet(emissions_dir), payload_schema)


def run_compaction_pipeline_dual_sink(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    emissions_dir: str,
    csv_dir: str,
    state_dir: str,
    date_col: str = "cdc_ts",
    fmt: str = "yyyyMM",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The reference's COMPOSED loop — cdc.py (binlog tail) → rcache.py
    (keyed cache merge) → dump2csv.py (date-partitioned CSV dump) — as
    ONE streaming query with a T7 foreachBatch fan-out:

    * sink 1 (K5): append-only emissions parquet — the checkpointed
      offset/commit log a restarted query resumes against;
    * sink 2 (K1): per-micro-batch date-partitioned CSV dump of the
      batch's emissions (typed payload restored from JSON, ``last_seq``
      riding along so the read side can finalize) — mode='append', so
      each poll ACCRETES files under its date partitions exactly like
      the reference's periodic dumps;
    * sink 3 (K4): after the availableNow run terminates, the finalized
      compacted state is written to a table-partitioned parquet — the
      durable state snapshot rcache.py holds in Redis.

    ``date_col`` must be one of ``payload_cols`` (the reference dumps by
    the row's event date; compaction keeps the tail event's value, the
    same arg_max-by-seq the batch compactor uses).

    Returns the finalized compacted state (read from sink 3).  Delivery:
    the CSV sink is idempotent-at-the-read (finalize = max last_seq per
    key), so even the foreachBatch at-least-once corner (a batch retried
    after a partial sink write) cannot change the finalized answer —
    the same replay-safety argument as the reference's idempotent cache
    merge (M5).  Parity with the batch compactor AND checkpoint-resume
    midway are pinned by tests/test_streaming_parity.py::
    test_composed_pipeline_dual_sink_equals_batch."""
    if date_col not in payload_cols:
        raise ValueError(f"date_col {date_col!r} must be in payload_cols")
    from ..operators.dump import dump_state_parquet, dump_to_csv

    payload_schema = StructType([source_schema[c] for c in payload_cols])

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    emissions = compact_stream(stream, pk_cols, payload_cols)

    def _fan_out(batch_df: DataFrame, _batch_id: int) -> None:
        # one pass over the micro-batch feeds both per-batch sinks; the
        # batch is tiny relative to state, so persist-free double reads
        # would also be fine — but foreachBatch re-executes the batch
        # plan per action, so cache it for the two writes
        batch_df.persist()
        try:
            # foreachBatch appends are at-least-once: a batch retried
            # after a partial write duplicates emission rows.  The
            # finalize (max last_seq per key) is immune, but consumers
            # treating emissions_dir as an exact K5 commit log (event
            # counts, retraction feeds) need the batch id stamped so
            # they can drop replayed batches (round-5 advice).
            batch_df.withColumn("_batch_id", F.lit(_batch_id)).write.mode(
                "append"
            ).parquet(emissions_dir)
            typed = batch_df.select(
                "tbl",
                "rid",
                "cdc_action",
                "last_seq",
                F.from_json("payload_json", payload_schema).alias("p"),
            ).select("tbl", "rid", "cdc_action", "last_seq", "p.*")
            dump_to_csv(typed, csv_dir, date_col=date_col, fmt=fmt, mode="append")
        finally:
            batch_df.unpersist()

    q = (
        emissions.writeStream.foreachBatch(_fan_out)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = finalize_stream_output(spark.read.parquet(emissions_dir), payload_schema)
    dump_state_parquet(final, state_dir)
    return spark.read.parquet(state_dir)


# ---------------------------------------------------------------------------
# Retraction stream: the Flink-style changelog-of-the-aggregate
# ---------------------------------------------------------------------------

_RETRACT_SCHEMA = StructType(
    [
        StructField("tbl", StringType()),
        StructField("rid", StringType()),
        StructField("sign", LongType()),
        StructField("payload_json", StringType()),
    ]
)


def _retract_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per key and micro-batch, emit the delta rows that keep ANY
    downstream additive aggregate current: -1 × the key's previous live
    payload (retraction), +1 × its new live payload.  Tombstones and
    annihilations emit only the retraction.  Telescoping makes the sum
    of deltas order-insensitive and exactly equal to the aggregate of
    the final live state — micro-batch slicing cannot change it."""
    tbl, rid = key
    if state.exists:
        fold_state, last_seq, payload_json = state.get
    else:
        fold_state, last_seq, payload_json = ACTION_FOLD_SENTINEL, -1, None
    was_live = state.exists and fold_state != "delete"
    old_payload = payload_json

    # ndarray fold — same per-key constant-factor fix as _compact_group
    for pdf in pdfs:
        seqs = pdf["seq"].values
        acts = pdf["cdc_action"].values
        for i in seqs.argsort(kind="stable"):
            fold_state = _fold(fold_state, acts[i])
        # argmax picks the FIRST row among tied max seqs where the old
        # sort_values+iloc[-1] picked the last; seq is unique per key
        # (binlog position), so ties cannot occur (r9 ADVICE #5)
        imax = int(seqs.argmax())
        if int(seqs[imax]) > last_seq:
            last_seq = int(seqs[imax])
            payload_json = pdf["payload_json"].values[imax]

    if fold_state == ACTION_FOLD_SENTINEL:
        state.remove()
    else:
        state.update((fold_state, last_seq, payload_json))

    now_live = fold_state not in (ACTION_FOLD_SENTINEL, "delete")
    rows = []
    if was_live:
        rows.append({"tbl": tbl, "rid": rid, "sign": -1, "payload_json": old_payload})
    if now_live:
        rows.append({"tbl": tbl, "rid": rid, "sign": 1, "payload_json": payload_json})
    yield pd.DataFrame(rows, columns=["tbl", "rid", "sign", "payload_json"])


def run_retraction_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    deltas_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the changelog through the retraction compactor and return the
    accumulated delta rows (sign, typed payload).  Any additive
    aggregate over ``sign * f(payload)`` equals the same aggregate over
    the final live state — incremental view maintenance as a stream."""
    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    keyed = (
        stream.withColumn("rid", rid_expr(pk_cols))
        .filter(F.col("rid").isNotNull())
        .withColumn(
            "payload_json", F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
        )
        .select("tbl", "rid", "seq", "cdc_action", "payload_json")
    )
    deltas = keyed.groupBy("tbl", "rid").applyInPandasWithState(
        _retract_group,
        outputStructType=_RETRACT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(deltas_dir)

    q = (
        deltas.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    payload_schema = StructType([source_schema[c] for c in payload_cols])
    out = spark.read.parquet(deltas_dir)
    return out.select(
        "tbl",
        "rid",
        "sign",
        F.from_json("payload_json", payload_schema).alias("p"),
    ).select("tbl", "rid", "sign", "p.*")


# ---------------------------------------------------------------------------
# Streaming SCD2: version history built incrementally
# ---------------------------------------------------------------------------

_SCD2_OUT_SCHEMA = StructType(
    [
        StructField("tbl", StringType()),
        StructField("rid", StringType()),
        StructField("version", LongType()),
        StructField("cdc_action", StringType()),
        StructField("valid_from", StringType()),
        StructField("valid_to", StringType()),
        StructField("payload_json", StringType()),
    ]
)

_SCD2_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("last_seq", LongType()),
        StructField("valid_from", StringType()),
        StructField("cdc_action", StringType()),
        StructField("payload_json", StringType()),
    ]
)


def _scd2_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Incremental SCD2: every event opens a new version row and closes
    the previous one (its valid_to = the new event's ts).  Emissions per
    event: the closed previous version (full correction row) + the new
    open version (valid_to NULL).  Finalize keeps, per (key, version),
    the emission with a closed valid_to if one exists — so any
    micro-batch slicing converges to the batch SCD2 history."""
    tbl, rid = key
    if state.exists:
        version, last_seq, valid_from, action, payload = state.get
    else:
        version, last_seq, valid_from, action, payload = 0, -1, None, None, None

    rows = []
    for pdf in pdfs:
        # seq-ordered row walk without the pandas sort_values copy —
        # same per-key constant-factor fix as _compact_group (the walk
        # itself must stay row-at-a-time: each event both closes the
        # previous version and opens its own)
        pdf = pdf.iloc[pdf["seq"].values.argsort(kind="stable")]
        for r in pdf.itertuples():
            if int(r.seq) <= last_seq:
                continue  # replayed duplicate
            if version > 0:
                rows.append(
                    {
                        "tbl": tbl,
                        "rid": rid,
                        "version": version,
                        "cdc_action": action,
                        "valid_from": valid_from,
                        "valid_to": r.cdc_ts,
                        "payload_json": payload,
                    }
                )
            version += 1
            last_seq = int(r.seq)
            valid_from, action, payload = r.cdc_ts, r.cdc_action, r.payload_json
            rows.append(
                {
                    "tbl": tbl,
                    "rid": rid,
                    "version": version,
                    "cdc_action": action,
                    "valid_from": valid_from,
                    "valid_to": None,
                    "payload_json": payload,
                }
            )
    state.update((version, last_seq, valid_from, action, payload))
    yield pd.DataFrame(rows, columns=[f.name for f in _SCD2_OUT_SCHEMA.fields])


def run_scd2_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    emissions_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the changelog through the incremental SCD2 builder and return
    the finalized version history (typed payload columns restored)."""
    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    keyed = (
        stream.withColumn("rid", rid_expr(pk_cols))
        .filter(F.col("rid").isNotNull())
        .withColumn(
            "payload_json", F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
        )
        .select(
            "tbl",
            "rid",
            "seq",
            "cdc_action",
            F.col("cdc_ts").cast("string").alias("cdc_ts"),
            "payload_json",
        )
    )
    emissions = keyed.groupBy("tbl", "rid").applyInPandasWithState(
        _scd2_group,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emissions_dir)

    q = (
        emissions.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    payload_schema = StructType([source_schema[c] for c in payload_cols])
    out = spark.read.parquet(emissions_dir)
    # per (key, version): a closed emission (valid_to set) supersedes the
    # open one from an earlier micro-batch
    final = (
        out.groupBy("tbl", "rid", "version")
        .agg(
            F.max("valid_to").alias("valid_to"),
            F.first("cdc_action").alias("cdc_action"),
            F.first("valid_from").alias("valid_from"),
            F.first("payload_json").alias("payload_json"),
        )
    )
    from pyspark.sql.window import Window

    w_max = F.max("version").over(Window.partitionBy("tbl", "rid"))
    return (
        final.withColumn("is_current", F.col("version") == w_max)
        .select(
            "tbl",
            "rid",
            "cdc_action",
            "valid_from",
            "valid_to",
            "is_current",
            F.col("version").cast("int").alias("version"),
            F.from_json("payload_json", payload_schema).alias("p"),
        )
        .select(
            "tbl", "rid", "cdc_action", "valid_from", "valid_to", "is_current",
            "version", "p.*",
        )
    )
