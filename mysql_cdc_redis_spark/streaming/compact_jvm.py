"""Pure-JVM streaming compactor — the foreachBatch + merge twin of the
applyInPandasWithState compactor (round-5 verdict item 1; SURVEY.md
§2.8 T1/T4/K5; reference rcache.py:224-259 periodic merge, cdc.py:119-134
at-least-once replay safety).

The applyInPandasWithState twin (streaming/compact_stream.py) is
CORRECT but pays a pandas crossing per key per micro-batch — measured
at 21.3k ev/s against 542k ev/s for the pure-JVM batch compactor on the
same staged changelog (BENCH_r05), the engine's one perf-weak component
at 100×.  The transformWithStateInPandas twin needs google.protobuf,
absent in this environment.  This twin needs NEITHER: it keeps the
stream JVM-side end to end.

Design — foreachBatch micro-batches, each JVM-compacted then merged
into a durable state table:

* Each micro-batch is first collapsed per key to its FULL fold
  TRANSITION FUNCTION, not just its fold-from-empty outcome: four
  ``F.aggregate`` folds over the seq-sorted action array, one per start
  state {absent, insert, update, delete} (`compact_batch_transitions`).
  The action algebra (rcache.py:196-222) is a deterministic finite
  transducer on 4 states, so the tuple (f(absent), f(insert),
  f(update), f(delete)) composes exactly: for ANY prior state s,
  fold(s, batch_events) = tuple[s].  One shuffle of the (small) batch,
  everything in whole-stage codegen.
* The state table joins the delta FULL OUTER on a single bucket key
  (``bkey`` = tbl ⊕ rid) and picks the new action by indexing the
  transition tuple with the stored action (`merge_state_jvm`) —
  payload = delta's max_by(seq) payload when the key saw events (last
  event wins wholesale, rcache.py:222), else the stored payload.
  Sentinel results (annihilation) drop the key — the same epoch-reset
  the pandas twin implements with state.remove().
* State persistence is a BUCKETED-BY-bkey warehouse table (sorted
  within buckets), ping-ponged between two slots: batch b reads the
  slot committed by the latest batch < b and overwrites the other.
  The bucketed scan side of every merge join is Exchange-free (only
  the small delta shuffles); at cluster scale the state table IS the
  keyed store, and with Delta/Iceberg the whole merge becomes MERGE
  INTO.  Bucket count from `auto_bucket_count` over the previous
  state's bytes.
* Exactly-once: Spark's checkpoint replays an uncommitted batch with
  the SAME batch_id; the merge recomputes DETERMINISTICALLY from the
  prior committed slot (never from the slot it is overwriting) and a
  tiny batch_id → slot map committed — as the LAST step — through the
  PUT-only manifest log (streaming/commitlog.py: checksummed versioned
  objects, no rename, correct on S3/GCS and POSIX alike).  A crash
  anywhere before the meta commit leaves the prior slot intact; the
  retry overwrites the partial slot.  This is the idempotent-replay
  contract the reference relies on (M5), upgraded to exactly-once.

Parity with the batch compactor under ANY micro-batch slicing is
pinned by tests/test_streaming_parity_jvm.py (mirroring the pandas
twin's tests), plus an exhaustive transition-composition test over all
action sequences × split points.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.compaction import ACTION_FOLD_SENTINEL, with_rid
from ..operators.scale import auto_bucket_count
from .commitlog import LocalFS, ManifestLog

_TRANSITION_STATES = ("insert", "update", "delete")


def _fold_actions_from(sorted_actions: Column, init: str) -> Column:
    """The rcache.py:196-222 merge algebra folded over a seq-sorted
    action array from an arbitrary start state — the batch form of the
    same fold in operators/compaction.py::_fold_actions, generalized so
    the four folds below capture the batch's full transition table."""
    sentinel = F.lit(ACTION_FOLD_SENTINEL)

    def merge(state: Column, x: Column) -> Column:
        return (
            F.when(state == sentinel, x)
            .when(
                state == "insert",
                F.when(x == "delete", sentinel).otherwise(F.lit("insert")),
            )
            .otherwise(F.when(x == "insert", F.lit("update")).otherwise(x))
        )

    return F.aggregate(sorted_actions, F.lit(init), merge)


def _bkey(tbl: Column, rid: Column) -> Column:
    # single-column join/bucket key; \x01 cannot appear in a table name,
    # so distinct (tbl, rid) pairs stay distinct
    return F.concat_ws("\x01", tbl, rid)


def compact_batch_transitions(
    batch: DataFrame,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    table_col: str = "tbl",
    seq_col: str = "seq",
    action_col: str = "cdc_action",
) -> DataFrame:
    """Collapse a micro-batch to one row per key carrying the batch's
    fold TRANSITION TUPLE + last payload + max seq.

    Columns: bkey, tbl, rid, f_absent, f_insert, f_update, f_delete,
    last_seq, _last (payload struct).  ``f_s`` = the fold outcome had
    the key's state been ``s`` when the batch arrived — composing
    micro-batches through these tuples is exactly event-at-a-time
    ingestion (exhaustively tested)."""
    keyed = with_rid(batch, pk_cols).filter(F.col("rid").isNotNull())
    grouped = keyed.groupBy(F.col(table_col).alias("tbl"), "rid").agg(
        F.max_by(F.struct(*[F.col(c) for c in payload_cols]), F.col(seq_col)).alias(
            "_last"
        ),
        F.max(F.col(seq_col)).alias("last_seq"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col(seq_col).alias("s"), F.col(action_col).alias("a"))
            )
        ).alias("_evs"),
    )
    acts = F.transform(F.col("_evs"), lambda ev: ev["a"])
    return grouped.select(
        _bkey(F.col("tbl"), F.col("rid")).alias("bkey"),
        "tbl",
        "rid",
        _fold_actions_from(acts, ACTION_FOLD_SENTINEL).alias("f_absent"),
        *[_fold_actions_from(acts, s).alias(f"f_{s}") for s in _TRANSITION_STATES],
        "last_seq",
        "_last",
    )


def _delta_to_state(delta: DataFrame, payload_cols: tuple[str, ...]) -> DataFrame:
    """First batch (no prior state): the from-empty fold IS the state;
    annihilated keys vanish."""
    return delta.filter(F.col("f_absent") != ACTION_FOLD_SENTINEL).select(
        "bkey",
        "tbl",
        "rid",
        F.col("f_absent").alias("cdc_action"),
        "last_seq",
        *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
    )


def merge_state_jvm(
    state: DataFrame, delta: DataFrame, payload_cols: tuple[str, ...]
) -> DataFrame:
    """Merge a transition-tuple delta into a compacted state: full-outer
    join on bkey, new action = the delta's transition tuple indexed by
    the stored action (absent key → f_absent), payload/seq from the
    delta when the key saw events.  Sentinel results drop the key
    (annihilation epoch-reset).  All JVM expressions — zero Python
    crossings; with the state side bucketed by bkey the join plans
    without an Exchange above the state scan."""
    s = state.alias("s")
    d = delta.alias("d")
    j = s.join(d, "bkey", "full_outer")
    d_present = F.col("d.rid").isNotNull()
    s_present = F.col("s.rid").isNotNull()
    new_action = (
        F.when(~d_present, F.col("s.cdc_action"))
        .when(~s_present, F.col("d.f_absent"))
        .when(F.col("s.cdc_action") == "insert", F.col("d.f_insert"))
        .when(F.col("s.cdc_action") == "update", F.col("d.f_update"))
        .otherwise(F.col("d.f_delete"))
    )
    return (
        j.select(
            F.col("bkey"),
            F.coalesce(F.col("d.tbl"), F.col("s.tbl")).alias("tbl"),
            F.coalesce(F.col("d.rid"), F.col("s.rid")).alias("rid"),
            new_action.alias("cdc_action"),
            F.when(d_present, F.col("d.last_seq"))
            .otherwise(F.col("s.last_seq"))
            .alias("last_seq"),
            *[
                F.when(d_present, F.col(f"d._last.{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
                for c in payload_cols
            ],
        )
        .filter(F.col("cdc_action") != ACTION_FOLD_SENTINEL)
    )


# ---------------------------------------------------------------------------
# Durable ping-pong state slots with an atomic batch_id -> slot commit log
# ---------------------------------------------------------------------------


class _StateSlots:
    """Two bucketed warehouse tables + a manifest commit log keyed by
    foreachBatch batch_id.  Table names derive from state_dir, so a
    checkpoint-resumed run (same dirs) finds its tables; distinct runs
    (distinct dirs) never collide in the shared warehouse.

    The batch_id → slot map commits through the PUT-only ManifestLog
    (streaming/commitlog.py) rather than an os.replace of _meta.json:
    a torn commit self-invalidates and reads as the prior map — the
    same crash semantics, with no atomic-rename requirement, so the
    exactly-once contract survives on object stores (round-7 advice)."""

    def __init__(self, spark: SparkSession, state_dir: str, fs=None):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.log = ManifestLog(fs or LocalFS(), state_dir)
        tag = uuid.uuid5(uuid.NAMESPACE_URL, os.path.abspath(state_dir)).hex[:16]
        self.tables = [f"cdc_jvm_state_{tag}_{i}" for i in (0, 1)]

    def load_meta(self) -> dict[str, int]:
        head = self.log.head()
        if head is None:
            return {}
        return {str(k): int(v) for k, v in head[1]["slots"].items()}

    def commit(self, batch_id: int, slot: int) -> None:
        """Record batch_id → slot, pruned to the TOP TWO batch ids
        (round-8 verdict #2): ``latest_before`` only ever consults the
        newest entry below its batch, and the one batch that can still
        be replayed is the newest — whose replay reads the second-
        newest.  Anything older is unreachable, so carrying it forward
        would grow every manifest O(batches) (O(batches²) cumulative
        bytes over a year-long stream) for zero reads — the same
        standard the dedup stream's merged pair RANGES already set
        (dedup_stream.py)."""
        meta = self.load_meta()
        meta[str(batch_id)] = int(slot)
        top = sorted((int(b) for b in meta), reverse=True)[:2]
        self.log.commit({"slots": {str(b): meta[str(b)] for b in top}})

    def latest_before(self, batch_id: int) -> tuple[int, int] | None:
        """(batch_id, slot) of the newest committed batch < batch_id —
        the deterministic merge source for batch_id (commits ≥ batch_id
        are replays of the batch being retried and are ignored)."""
        meta = self.load_meta()
        prior = [int(b) for b in meta if int(b) < batch_id]
        if not prior:
            return None
        b = max(prior)
        return b, meta[str(b)]

    def read(self, slot: int) -> DataFrame:
        return self.spark.table(self.tables[slot])

    def write(self, df: DataFrame, slot: int, n_buckets: int) -> None:
        (
            df.repartition(n_buckets, "bkey")
            .write.mode("overwrite")
            .bucketBy(n_buckets, "bkey")
            .sortBy("bkey")
            .format("parquet")
            .saveAsTable(self.tables[slot])
        )

    def table_bytes(self, slot: int) -> int | None:
        # the slots are always parquet saveAsTable output, so the bytes
        # live under the catalog warehouse dir (DESCRIBE DETAIL is
        # Delta-only and would just log a per-batch analysis error)
        wh = self.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        path = os.path.join(wh.removeprefix("file:"), self.tables[slot])
        if not os.path.isdir(path):
            return None
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )

    def drop_all(self) -> None:
        for t in self.tables:
            self.spark.sql(f"DROP TABLE IF EXISTS `{t}`")


def run_compaction_stream_jvm(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    state_dir: str,
    max_files_per_trigger: int | None = None,
    fs=None,
) -> DataFrame:
    """End-to-end availableNow run of the JVM streaming compactor
    (blocking=False mode, cdc_config.py:36): tail the file changelog,
    fold each micro-batch into the bucketed state table, return the
    final compacted state with the batch compactor's exact columns
    (tbl, rid, cdc_action, payload...).

    Durability/restart: offsets live in ``checkpoint_dir`` (K5), state
    in the two warehouse slots + ``state_dir/_log``; a resumed
    run continues from the committed slot (tested: resume-midway parity
    and crash-retry determinism).  State tables persist across runs of
    the same state_dir — call ``drop_state_jvm`` to dispose of them
    when the pipeline is decommissioned."""
    slots = _StateSlots(spark, state_dir, fs=fs)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = compact_batch_transitions(batch_df, pk_cols, payload_cols)
        prev = slots.latest_before(batch_id)
        if prev is None:
            new_state = _delta_to_state(delta, payload_cols)
            dst, prev_bytes = 0, None
        else:
            _, src = prev
            new_state = merge_state_jvm(slots.read(src), delta, payload_cols)
            dst, prev_bytes = 1 - src, slots.table_bytes(src)
        # floor 16: the merge join's parallelism IS the bucket count —
        # a few-MB state would otherwise plan 4 tasks on a 32-core box;
        # beyond ~4 GB the byte-based sizing takes over
        slots.write(new_state, dst, auto_bucket_count(prev_bytes, lo=16, default=16))
        slots.commit(batch_id, dst)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    meta = slots.load_meta()
    if not meta:  # empty source: no batch ever fired
        return spark.createDataFrame(
            [],
            "tbl string, rid string, cdc_action string"
            + "".join(f", {c} {source_schema[c].dataType.simpleString()}"
                      for c in payload_cols),
        )
    last_slot = meta[str(max(int(b) for b in meta))]
    return slots.read(last_slot).select("tbl", "rid", "cdc_action", *payload_cols)


def run_retraction_stream_jvm(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    state_dir: str,
    deltas_dir: str,
    max_files_per_trigger: int | None = None,
    fs=None,
) -> DataFrame:
    """Pure-JVM retraction stream — the foreachBatch twin of
    ``run_retraction_stream`` (streaming/compact_stream.py:362), the
    Flink-style changelog-of-the-aggregate with zero per-key Python
    crossings.

    Per micro-batch, the emitted delta rows are two JVM semi-joins
    against the ping-pong state slots of the compaction twin:

    * ``sign=-1`` × the prior slot's LIVE payload for every key the
      batch touched (the retraction),
    * ``sign=+1`` × the new slot's LIVE payload for the same keys (the
      addition) — where LIVE means present and not folded to 'delete'.

    Telescoping makes Σ sign·f(payload) equal f over the final live
    state under ANY micro-batch slicing, exactly like the pandas twin
    (pinned by tests/test_streaming_parity_jvm.py parity vs both the
    pandas twin's emissions and the batch aggregate).

    Exactly-once emissions (an upgrade over the pandas twin's
    at-least-once append + _batch_id stamp): each batch overwrites its
    own ``deltas_dir/batch_id=N`` partition BEFORE the meta commit, so
    a retried batch replaces — never duplicates — its delta rows.
    Reference anchor: this is the streaming form of the reference's
    aggregate-maintenance pattern (rcache.py:224-259 merge keeps Redis
    aggregates current per poll loop)."""
    slots = _StateSlots(spark, state_dir, fs=fs)
    touched_payloads = [F.col(c) for c in payload_cols]

    def _live_rows(state: DataFrame, touched: DataFrame, sign: int) -> DataFrame:
        return (
            state.join(F.broadcast(touched), "bkey", "left_semi")
            .filter(F.col("cdc_action") != "delete")
            .select("tbl", "rid", F.lit(sign).cast("long").alias("sign"),
                    *touched_payloads)
        )

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = compact_batch_transitions(batch_df, pk_cols, payload_cols)
        prev = slots.latest_before(batch_id)
        if prev is None:
            new_state = _delta_to_state(delta, payload_cols)
            dst, prev_bytes, old_state = 0, None, None
        else:
            _, src = prev
            old_state = slots.read(src)
            new_state = merge_state_jvm(old_state, delta, payload_cols)
            dst, prev_bytes = 1 - src, slots.table_bytes(src)
        slots.write(new_state, dst, auto_bucket_count(prev_bytes, lo=16, default=16))
        # emissions AFTER the slot write so the +1 side reads the
        # bucketed table (one computation of the merge, not two)
        touched = delta.select("bkey")
        plus = _live_rows(slots.read(dst), touched, 1)
        emit = (
            _live_rows(old_state, touched, -1).unionByName(plus)
            if old_state is not None
            else plus
        )
        emit.write.mode("overwrite").parquet(
            os.path.join(deltas_dir, f"batch_id={batch_id}")
        )
        slots.commit(batch_id, dst)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    empty = spark.createDataFrame(
        [],
        "tbl string, rid string, sign long"
        + "".join(f", {c} {source_schema[c].dataType.simpleString()}"
                  for c in payload_cols),
    )
    if not slots.load_meta():  # empty source: no batch ever fired
        return empty
    try:
        out = spark.read.parquet(deltas_dir)
    except Exception:
        # every batch emitted zero rows: no parquet footer to infer from
        return empty
    return out.select("tbl", "rid", "sign", *payload_cols)


def run_scd2_stream_jvm(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    state_dir: str,
    emissions_dir: str,
    max_files_per_trigger: int | None = None,
    fs=None,
) -> DataFrame:
    """Pure-JVM incremental SCD2 — the foreachBatch twin of
    ``run_scd2_stream`` (streaming/compact_stream.py:497), zero per-key
    Python crossings.

    Per micro-batch, version assignment is a window over the (small)
    batch joined LEFT against the bucketed state slot (replay guard:
    ``seq > stored last_seq``, mirroring the pandas twin's per-event
    skip): ``version = stored_version + row_number()``, intra-batch
    closures via ``lead(ts)``, plus one correction row closing the
    state's open version at the batch's first event.  Because the state
    table is queryable (unlike applyInPandasWithState state), only
    CLOSED versions are ever emitted — the open versions ARE the state
    rows, so finalize is a plain union with no per-(key, version)
    supersede pass.  Emissions are exactly-once (per-batch partition
    overwrite before the meta commit), state durability/restart
    semantics identical to ``run_compaction_stream_jvm``."""
    from pyspark.sql.window import Window

    slots = _StateSlots(spark, state_dir, fs=fs)
    payload_ddl = "".join(
        f", {c} {source_schema[c].dataType.simpleString()}" for c in payload_cols
    )
    state_ddl = (
        "bkey string, tbl string, rid string, version long, last_seq long, "
        "valid_from string, cdc_action string" + payload_ddl
    )

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        keyed = (
            with_rid(batch_df, pk_cols)
            .filter(F.col("rid").isNotNull())
            .withColumn("bkey", _bkey(F.col("tbl"), F.col("rid")))
            .select(
                "bkey", "tbl", "rid", "seq", "cdc_action",
                F.col("cdc_ts").cast("string").alias("_ts"),
                *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
            )
            .dropDuplicates(["bkey", "seq"])
        )
        prev = slots.latest_before(batch_id)
        if prev is None:
            state_prev, dst, prev_bytes = (
                spark.createDataFrame([], state_ddl), 0, None,
            )
        else:
            _, src = prev
            state_prev, dst, prev_bytes = (
                slots.read(src), 1 - src, slots.table_bytes(src),
            )
        s = state_prev.select(
            "bkey",
            F.col("version").alias("_sv"),
            F.col("last_seq").alias("_sls"),
            F.col("valid_from").alias("_svf"),
            F.col("cdc_action").alias("_sac"),
            *[F.col(c).alias(f"_sp_{c}") for c in payload_cols],
        )
        w = Window.partitionBy("bkey").orderBy("seq")
        evs = (
            keyed.join(s, "bkey", "left")
            .filter(F.col("seq") > F.coalesce(F.col("_sls"), F.lit(-1)))
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_next_ts", F.lead("_ts").over(w))
            .withColumn("_v", F.coalesce(F.col("_sv"), F.lit(0)) + F.col("_rn"))
        )

        def payload_as(prefix: str) -> list[Column]:
            return [F.col(f"{prefix}{c}").alias(c) for c in payload_cols]

        closed_batch = evs.filter(F.col("_next_ts").isNotNull()).select(
            "tbl", "rid", F.col("_v").alias("version"), "cdc_action",
            F.col("_ts").alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
            *payload_as("_p_"),
        )
        closed_prior = evs.filter(
            (F.col("_rn") == 1) & F.col("_sv").isNotNull()
        ).select(
            "tbl", "rid", F.col("_sv").alias("version"),
            F.col("_sac").alias("cdc_action"),
            F.col("_svf").alias("valid_from"),
            F.col("_ts").alias("valid_to"),
            *payload_as("_sp_"),
        )
        closed_batch.unionByName(closed_prior).write.mode("overwrite").parquet(
            os.path.join(emissions_dir, f"batch_id={batch_id}")
        )
        opens = evs.filter(F.col("_next_ts").isNull()).select(
            "bkey", "tbl", "rid", F.col("_v").alias("version"),
            F.col("seq").alias("last_seq"),
            F.col("_ts").alias("valid_from"), "cdc_action",
            *payload_as("_p_"),
        )
        touched = evs.select("bkey").distinct()
        new_state = state_prev.join(
            F.broadcast(touched), "bkey", "left_anti"
        ).unionByName(opens)
        slots.write(new_state, dst, auto_bucket_count(prev_bytes, lo=16, default=16))
        slots.commit(batch_id, dst)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out_ddl = (
        "tbl string, rid string, cdc_action string, valid_from string, "
        "valid_to string, is_current boolean, version int" + payload_ddl
    )
    meta = slots.load_meta()
    if not meta:  # empty source: no batch ever fired
        return spark.createDataFrame([], out_ddl)
    last_slot = meta[str(max(int(b) for b in meta))]
    open_rows = slots.read(last_slot).select(
        "tbl", "rid", "cdc_action", "valid_from",
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.col("version").cast("int").alias("version"),
        *payload_cols,
    )
    try:
        closed = spark.read.parquet(emissions_dir).select(
            "tbl", "rid", "cdc_action", "valid_from", "valid_to",
            F.lit(False).alias("is_current"),
            F.col("version").cast("int").alias("version"),
            *payload_cols,
        )
    except Exception:
        # every batch emitted zero closed versions (e.g. one event/key)
        return open_rows
    return closed.unionByName(open_rows)


def run_compaction_pipeline_dual_sink_jvm(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    emissions_dir: str,
    csv_dir: str,
    state_dir: str,
    snapshot_dir: str,
    date_col: str = "cdc_ts",
    fmt: str = "yyyyMM",
    max_files_per_trigger: int | None = None,
    fs=None,
) -> DataFrame:
    """The reference's COMPOSED loop — cdc.py (binlog tail) → rcache.py
    (keyed cache merge) → dump2csv.py (date-partitioned CSV dump) — as
    ONE streaming query, pure-JVM end to end (the foreachBatch twin of
    ``run_compaction_pipeline_dual_sink``, zero Python row crossings):

    * the micro-batch folds to transition tuples and merges into the
      bucketed ping-pong state slots exactly like
      ``run_compaction_stream_jvm``;
    * sink 1 (K5): the batch's emission rows — one row per TOUCHED key
      carrying its post-merge (cdc_action, last_seq, payload), with
      annihilated keys emitted as explicit ``ACTION_FOLD_SENTINEL``
      tombstones — overwrite ``emissions_dir/batch_id=N``: an
      exactly-once commit log (an upgrade over the pandas twin's
      at-least-once append + ``_batch_id`` stamp);
    * sink 2 (K1): the same batch's LIVE rows accrete into the
      date-partitioned CSV dump (``mode='append'`` — each poll adds
      files under its date partitions exactly like the reference's
      periodic dumps; a retried batch may re-append, and exactly like
      the pandas twin the finalize below is immune because it reads
      sink 1, not the CSVs);
    * sink 3 (K4): after the availableNow run terminates, the finalized
      compacted state is dumped table-partitioned to ``snapshot_dir``
      (the durable Redis-state analog) and returned.

    Finalize-from-emissions (last emission per key by batch_id, drop
    tombstones) equals the final state slot AND the batch compactor —
    pinned by tests/test_streaming_parity_jvm.py."""
    if date_col not in payload_cols:
        raise ValueError(f"date_col {date_col!r} must be in payload_cols")
    from ..operators.dump import dump_state_parquet, dump_to_csv

    slots = _StateSlots(spark, state_dir, fs=fs)

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        delta = compact_batch_transitions(batch_df, pk_cols, payload_cols)
        prev = slots.latest_before(batch_id)
        if prev is None:
            new_state = _delta_to_state(delta, payload_cols)
            dst, prev_bytes = 0, None
        else:
            _, src = prev
            new_state = merge_state_jvm(slots.read(src), delta, payload_cols)
            dst, prev_bytes = 1 - src, slots.table_bytes(src)
        slots.write(new_state, dst, auto_bucket_count(prev_bytes, lo=16, default=16))
        # emissions read the WRITTEN slot (one computation of the merge);
        # annihilated keys become explicit tombstones carrying the seq
        # that killed them, so a per-key max_by(last_seq) finalize over
        # the emission/CSV logs is total (a tombstone supersedes the
        # key's earlier live rows; a re-insert supersedes the tombstone)
        touched = delta.select("bkey", "tbl", "rid", "last_seq")
        live = slots.read(dst).join(
            F.broadcast(touched.select("bkey")), "bkey", "left_semi"
        )
        gone = (
            touched.join(slots.read(dst).select("bkey"), "bkey", "left_anti")
            .select(
                "bkey", "tbl", "rid",
                F.lit(ACTION_FOLD_SENTINEL).alias("cdc_action"),
                "last_seq",
                *[
                    F.lit(None).cast(source_schema[c].dataType).alias(c)
                    for c in payload_cols
                ],
            )
        )
        emit = live.unionByName(gone).select(
            "tbl", "rid", "cdc_action", "last_seq", *payload_cols
        )
        emit.write.mode("overwrite").parquet(
            os.path.join(emissions_dir, f"batch_id={batch_id}")
        )
        # tombstones ride into the CSV dump too (the pandas twin's
        # emissions do the same): without them the dump's finalize
        # could resurrect a key annihilated in a later poll.  Their
        # date partition falls back to the dump's null-date bucket.
        dump_to_csv(emit, csv_dir, date_col=date_col, fmt=fmt, mode="append")
        slots.commit(batch_id, dst)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    meta = slots.load_meta()
    if not meta:  # empty source: no batch ever fired
        return spark.createDataFrame(
            [],
            "tbl string, rid string, cdc_action string"
            + "".join(f", {c} {source_schema[c].dataType.simpleString()}"
                      for c in payload_cols),
        )
    last_slot = meta[str(max(int(b) for b in meta))]
    final = slots.read(last_slot).select("tbl", "rid", "cdc_action", *payload_cols)
    dump_state_parquet(final, snapshot_dir)
    return spark.read.parquet(snapshot_dir).select(
        "tbl", "rid", "cdc_action", *payload_cols
    )


def drop_state_jvm(spark: SparkSession, state_dir: str) -> None:
    """Dispose of a pipeline's state tables + commit log (the K6-style
    destructive clear for this twin)."""
    import shutil

    slots = _StateSlots(spark, state_dir)
    slots.drop_all()
    shutil.rmtree(state_dir, ignore_errors=True)
