"""Streaming-vs-batch parity (SURVEY.md §5.4): the applyInPandasWithState
compactor over a chunked file stream must equal the batch window-dedup
result on the same changelog — the live-vs-replay equivalence implied by
loadcsv.py:68.  Plus checkpoint-resume (K5/T1)."""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from mysql_cdc_redis_spark.operators.compaction import compact
from mysql_cdc_redis_spark.sources.changelog import (
    ORDERS_PAYLOAD,
    ORDERS_PK,
    orders_changelog,
)
from mysql_cdc_redis_spark.streaming import run_compaction_stream
from mysql_cdc_redis_spark.streaming.changelog_files import stage_changelog_files


def _rows(df, cols):
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


def _tmp(name):
    return os.path.join(tempfile.gettempdir(), f"{name}_{uuid.uuid4().hex[:8]}")


def test_stream_equals_batch(spark, sf_dir):
    ch = orders_changelog(spark, sf_dir)
    source_dir = _tmp("chglog")
    stage_changelog_files(ch, source_dir, n_chunks=4)
    batch = compact(ch, ORDERS_PK, ORDERS_PAYLOAD)
    streamed = run_compaction_stream(
        spark,
        source_dir,
        ch.schema,
        ORDERS_PK,
        ORDERS_PAYLOAD,
        checkpoint_dir=_tmp("ckpt"),
        emissions_dir=_tmp("emit"),
        max_files_per_trigger=1,  # force one micro-batch per chunk
    )
    cols = ["tbl", "rid", "cdc_action", *ORDERS_PAYLOAD]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_checkpoint_resume_processes_only_new_files(spark, sf_dir):
    """K5/T1: offsets live in the checkpoint; a restarted stream resumes
    past already-consumed files and state carries over."""
    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey") % 10 == 3)
    # k=3 keys have [insert(e0), update(e1)]; split events into two files
    first = ch.filter(F.col("seq") % 4 == 0)   # the inserts
    second = ch.filter(F.col("seq") % 4 == 1)  # the updates
    d = _tmp("resume_src")
    ckpt = _tmp("resume_ckpt")
    emit = _tmp("resume_emit")
    stage_changelog_files(first, d, n_chunks=1)

    out1 = run_compaction_stream(
        spark, d, ch.schema, ORDERS_PK, ORDERS_PAYLOAD, ckpt, emit
    )
    r1 = {r["rid"]: r["cdc_action"] for r in out1.collect()}
    assert r1 and set(r1.values()) == {"insert"}
    n_emissions_run1 = spark.read.parquet(emit).count()

    # append the update events as a new file, same checkpoint
    tmp = f"{d}/_stage_x"
    second.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = f"{d}/chunk-9999.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (time.time(), time.time()))

    out2 = run_compaction_stream(
        spark, d, ch.schema, ORDERS_PK, ORDERS_PAYLOAD, ckpt, emit
    )
    # the second run appended ONLY re-emitted keys from the new file
    # (offset resume skipped the already-committed first file)...
    assert spark.read.parquet(emit).count() == n_emissions_run1 + second.count()
    # ...and state carried over: insert+update folds to insert (M2)
    r2 = {r["rid"]: r["cdc_action"] for r in out2.collect()}
    assert set(r2.values()) == {"insert"}
    assert set(r2) == set(r1)


def test_composed_pipeline_dual_sink_equals_batch(spark, sf_dir):
    """The reference's IDENTITY is the composed loop cdc.py → rcache.py →
    dump2csv.py; T7's fan-out and the K1/K4 sinks are each tested
    elsewhere — this pins the COMPOSITION (round-4 verdict item 7): one
    streaming query tails the changelog, compacts with keyed state, and
    fans out per micro-batch to the emissions log AND the
    date-partitioned CSV dump, with the K4 state parquet written at
    termination.  Checkpoint-resume happens MIDWAY: half the changelog,
    run; append the rest, run again on the same checkpoint.  Every sink
    must then agree with the one-shot batch compaction of the full
    changelog."""
    from mysql_cdc_redis_spark.operators.dump import read_dump
    from mysql_cdc_redis_spark.streaming import run_compaction_pipeline_dual_sink
    from pyspark.sql.types import StructType

    ch = orders_changelog(spark, sf_dir)
    payload = ORDERS_PAYLOAD  # already carries cdc_ts (the reference keeps it in the row hash)
    # split by seq parity-ish: first file carries each key's early
    # events, second the late ones, so per-key state MUST span the
    # restart for the final fold to be right
    first = ch.filter(F.col("seq") % 4 <= 1)
    second = ch.filter(F.col("seq") % 4 >= 2)
    src = _tmp("dual_src")
    ckpt = _tmp("dual_ckpt")
    emit = _tmp("dual_emit")
    csv_dir = _tmp("dual_csv")
    state_dir = _tmp("dual_state")
    stage_changelog_files(first, src, n_chunks=2)

    args = (spark, src, ch.schema, ORDERS_PK, payload)
    kw = dict(
        checkpoint_dir=ckpt,
        emissions_dir=emit,
        csv_dir=csv_dir,
        state_dir=state_dir,
        date_col="cdc_ts",
        fmt="yyyyMM",
        max_files_per_trigger=1,
    )
    run_compaction_pipeline_dual_sink(*args, **kw)
    n_csv_files_mid = sum(
        len([f for f in files if f.endswith(".csv")])
        for _, _, files in os.walk(csv_dir)
    )
    assert n_csv_files_mid > 0, "first run must have dumped CSV"

    # stage the second half as NEW files (same source dir + checkpoint)
    tmp = f"{src}/_stage_late"
    second.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = f"{src}/chunk-9999.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (time.time(), time.time()))

    state = run_compaction_pipeline_dual_sink(*args, **kw)

    batch = compact(ch, ORDERS_PK, ORDERS_PAYLOAD)
    cols = ["tbl", "rid", "cdc_action", *ORDERS_PAYLOAD]
    # K4 state parquet == batch compaction (resume carried state over)
    assert _rows(state.select(*cols), cols) == _rows(batch.select(*cols), cols)

    # K1 CSV accretion: finalize the read-back (max last_seq per key,
    # drop annihilated) — must equal the same batch state, proving the
    # per-batch appends lost nothing and superseded rows finalize away
    csv_schema = (
        StructType()
        .add("tbl", "string")
        .add("rid", "string")
        .add("cdc_action", "string")
        .add("last_seq", "long")
    )
    for c in payload:
        csv_schema = csv_schema.add(ch.schema[c])
    back = read_dump(spark, csv_dir, schema=csv_schema)
    finalized_csv = (
        back.groupBy("tbl", "rid")
        .agg(
            F.max_by(
                F.struct("cdc_action", *ORDERS_PAYLOAD), F.col("last_seq")
            ).alias("m")
        )
        .select("tbl", "rid", "m.*")
        .filter(F.col("cdc_action") != "#absent#")
    )
    assert _rows(finalized_csv.select(*cols), cols) == _rows(batch.select(*cols), cols)

    # the dump accreted across batches (append mode): more files than
    # the midway count, date-partitioned layout
    n_csv_files_end = sum(
        len([f for f in files if f.endswith(".csv")])
        for _, _, files in os.walk(csv_dir)
    )
    assert n_csv_files_end > n_csv_files_mid
    assert any(d.startswith("dt=") for d in os.listdir(csv_dir)), "K1 layout"


def test_emissions_carry_batch_id(spark, sf_dir):
    """Round-5 advice: foreachBatch emission appends are at-least-once,
    so the K5 log stamps _batch_id — an exact-log consumer can drop
    replayed batches by keeping one copy per (key, last_seq, _batch_id)
    or per max _batch_id.  The finalize path stays immune regardless."""
    ch = orders_changelog(spark, sf_dir).filter(F.col("o_orderkey") % 50 == 9)
    src = _tmp("bid_src")
    emit = _tmp("bid_emit")
    stage_changelog_files(ch, src, n_chunks=2)
    run_compaction_stream(
        spark, src, ch.schema, ORDERS_PK, ORDERS_PAYLOAD,
        checkpoint_dir=_tmp("bid_ckpt"), emissions_dir=emit,
        max_files_per_trigger=1,
    )
    log = spark.read.parquet(emit)
    assert "_batch_id" in log.columns
    batch_ids = {r["_batch_id"] for r in log.select("_batch_id").distinct().collect()}
    assert len(batch_ids) >= 2, "per-chunk micro-batches must stamp distinct ids"
    # a simulated replay of batch 0 dedups away by (content, _batch_id)
    b0 = log.filter(F.col("_batch_id") == 0)
    replayed = log.unionByName(b0)
    assert replayed.dropDuplicates(
        ["tbl", "rid", "last_seq", "_batch_id"]
    ).count() == log.dropDuplicates(["tbl", "rid", "last_seq", "_batch_id"]).count()


def _protobuf_available() -> bool:
    # transformWithState's Python<->JVM state protocol rides on protobuf;
    # absent/broken protobuf crashes the streaming runner at init.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf (not in this container)",
)
def test_tws_stream_equals_batch(spark, sf_dir):
    """The transformWithStateInPandas twin (streaming/compact_tws.py)
    must equal both the batch compaction and, transitively, the
    applyInPandasWithState twin."""
    from mysql_cdc_redis_spark.streaming.compact_tws import run_compaction_stream_tws

    ch = orders_changelog(spark, sf_dir)
    source_dir = _tmp("tws_src")
    stage_changelog_files(ch, source_dir, n_chunks=4)
    out = run_compaction_stream_tws(
        spark,
        source_dir,
        ch.schema,
        ORDERS_PK,
        ORDERS_PAYLOAD,
        checkpoint_dir=_tmp("tws_ckpt"),
        emissions_dir=_tmp("tws_emit"),
        max_files_per_trigger=1,
    )
    batch = compact(ch, ORDERS_PK, ORDERS_PAYLOAD)
    cols = batch.columns
    assert _rows(out.select(*cols), cols) == _rows(batch, cols)


def test_tws_processor_fold_logic():
    """The StatefulProcessor's per-key fold (no Spark): feed micro-batch
    slices through CompactionProcessor.handleInputRows with a fake state
    handle and check the M2 algebra incl. annihilation epoch-reset."""
    import pandas as pd

    from mysql_cdc_redis_spark.streaming.compact_tws import CompactionProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def clear(self):
            self._v = None

    proc = CompactionProcessor()
    proc._state = FakeState()

    def feed(events):  # events: list of (seq, action, payload)
        pdf = pd.DataFrame(
            [{"seq": s, "cdc_action": a, "payload_json": p} for s, a, p in events]
        )
        return list(proc.handleInputRows(("t", "1"), iter([pdf]), None))[0].iloc[0]

    r1 = feed([(1, "insert", "a"), (2, "update", "b")])
    assert (r1["cdc_action"], r1["payload_json"]) == ("insert", "b")
    r2 = feed([(3, "delete", "c")])  # insert+delete annihilates
    assert r2["cdc_action"] == "#absent#"
    assert not proc._state.exists()  # epoch reset
    r3 = feed([(4, "insert", "d")])  # fresh epoch
    assert (r3["cdc_action"], r3["payload_json"]) == ("insert", "d")


def test_retraction_stream_slicing_invariant(spark, sf_dir):
    """The summed retraction deltas must equal the batch aggregate of the
    live compacted state under ANY micro-batch slicing — 1 chunk
    (single batch) and 4 chunks (per-key state spanning batches) give
    identical results."""
    from mysql_cdc_redis_spark.streaming.compact_stream import run_retraction_stream

    ch = orders_changelog(spark, sf_dir)
    payload = ("o_orderstatus", "o_totalprice")

    def agg_of(deltas):
        rows = (
            deltas.groupBy("o_orderstatus")
            .agg(
                F.sum("sign").alias("n"),
                F.sum(
                    F.col("sign") * F.col("o_totalprice").cast("decimal(18,2)")
                ).alias("v"),
            )
            .filter(F.col("n") > 0)
            .collect()
        )
        return {r["o_orderstatus"]: (r["n"], str(r["v"])) for r in rows}

    results = []
    for chunks in (1, 4):
        src = _tmp(f"retract_par_src_{chunks}")
        stage_changelog_files(ch, src, n_chunks=chunks)
        deltas = run_retraction_stream(
            spark, src, ch.schema, ORDERS_PK, payload,
            checkpoint_dir=_tmp(f"retract_par_ckpt_{chunks}"),
            deltas_dir=_tmp(f"retract_par_out_{chunks}"),
            max_files_per_trigger=1,
        )
        results.append(agg_of(deltas))

    live = compact(ch, ORDERS_PK, ORDERS_PAYLOAD).filter(
        F.col("cdc_action") != "delete"
    )
    batch = {
        r["o_orderstatus"]: (r["n"], str(r["v"]))
        for r in live.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("v"),
        )
        .collect()
    }
    assert results[0] == results[1] == batch
