"""Parity + durability for the streaming MinHash-LSH corpus dedup
(streaming/dedup_stream.py): the accumulated emissions must equal the
one-shot batch ``minhash_lsh_pairs`` under any micro-batch slicing,
survive a checkpoint restart, replay exactly-once, keep the cache clean,
and stay correct across an LSM state compaction."""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from mysql_cdc_redis_spark.operators.dedup import minhash_lsh_pairs
from mysql_cdc_redis_spark.sources import load_table
from mysql_cdc_redis_spark.streaming import (
    compact_lsh_state,
    run_dedup_stream_minhash,
)
from mysql_cdc_redis_spark.streaming.changelog_files import stage_changelog_files


def _tmp(name):
    return os.path.join(tempfile.gettempdir(), f"{name}_{uuid.uuid4().hex[:8]}")


def _pairs(df):
    return sorted(
        (r["a"], r["b"], round(r["jaccard"], 6)) for r in df.collect()
    )


def _run(spark, source_dir, schema, dirs=None, **kw):
    dirs = dirs or {
        "checkpoint_dir": _tmp("dstream_ckpt"),
        "state_dir": _tmp("dstream_state"),
        "pairs_dir": _tmp("dstream_pairs"),
    }
    out = run_dedup_stream_minhash(
        spark, source_dir, schema, max_files_per_trigger=1, **dirs, **kw
    )
    return out, dirs


def _cleanup(*paths):
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def test_stream_dedup_equals_batch_any_slicing(spark, sf_dir):
    """Telescoping parity: 1-chunk (single batch, within-pairs only) and
    4-chunk (cross-batch probes dominate) slicings both reproduce the
    one-shot batch pair set exactly."""
    docs = load_table(spark, sf_dir, "documents")
    expected = _pairs(minhash_lsh_pairs(docs, n=3, k=16, bands=4, threshold=0.2))
    assert expected  # fixture plants near-dup groups; empty would be vacuous
    for n_chunks in (1, 4):
        src = _tmp("dstream_src")
        stage_changelog_files(docs, src, n_chunks=n_chunks, key_col="doc_id")
        out, dirs = _run(spark, src, docs.schema)
        assert _pairs(out) == expected, f"n_chunks={n_chunks}"
        _cleanup(src, *dirs.values())


def test_stream_dedup_checkpoint_resume_midway(spark, sf_dir):
    """K5: ingest half the corpus, run to completion; add the rest as
    new files and re-run on the same checkpoint + state — cross pairs
    between the halves must appear, and the final set must equal the
    batch run over the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = _tmp("dstream_resume_src")
    stage_changelog_files(first, src, n_chunks=2, key_col="doc_id")
    out1, dirs = _run(spark, src, docs.schema)
    assert _pairs(out1) == _pairs(
        minhash_lsh_pairs(first, n=3, k=16, bands=4, threshold=0.2)
    )

    # append the second half as later-mtime files, same checkpoint
    tmp = f"{src}/_stage_x"
    second.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = f"{src}/chunk-9999.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (time.time(), time.time()))

    out2, _ = _run(spark, src, docs.schema, dirs=dirs)
    assert _pairs(out2) == _pairs(
        minhash_lsh_pairs(docs, n=3, k=16, bands=4, threshold=0.2)
    )
    _cleanup(src, *dirs.values())


def test_stream_dedup_rerun_is_idempotent(spark, sf_dir):
    """Exactly-once: re-running availableNow on a drained source (same
    checkpoint/state/pairs dirs) fires no batches and returns the
    identical accumulated pair set."""
    docs = load_table(spark, sf_dir, "documents")
    src = _tmp("dstream_idem_src")
    stage_changelog_files(docs, src, n_chunks=3, key_col="doc_id")
    out1, dirs = _run(spark, src, docs.schema)
    p1 = _pairs(out1)
    out2, _ = _run(spark, src, docs.schema, dirs=dirs)
    assert _pairs(out2) == p1
    _cleanup(src, *dirs.values())


def test_stream_dedup_crashed_partial_run_is_replaced(spark, sf_dir):
    """A crashed attempt leaves partial ingest_id partitions but no meta
    commit; the retry (same batch over the same dirs) must overwrite
    them, not double-count.  Simulated by pre-planting garbage rows in
    the partition dirs the first real batch will claim."""
    docs = load_table(spark, sf_dir, "documents")
    src = _tmp("dstream_crash_src")
    stage_changelog_files(docs, src, n_chunks=1, key_col="doc_id")
    dirs = {
        "checkpoint_dir": _tmp("dstream_crash_ckpt"),
        "state_dir": _tmp("dstream_crash_state"),
        "pairs_dir": _tmp("dstream_crash_pairs"),
    }
    # partial state/pairs from a "crashed attempt" of batch 0
    junk_sig = spark.createDataFrame(
        [(999_999_999, 0, "deadbeef")], "doc_id long, band int, bkey string"
    )
    junk_sig.write.parquet(
        os.path.join(dirs["state_dir"], "sig", "ingest_id=0")
    )
    spark.createDataFrame(
        [(999_999_999, 1_234_567_890_123)], "doc_id long, h long"
    ).write.parquet(os.path.join(dirs["state_dir"], "sh", "ingest_id=0"))
    spark.createDataFrame(
        [(1, 2, 0.999999)], "a long, b long, jaccard double"
    ).write.parquet(os.path.join(dirs["pairs_dir"], "ingest_id=0"))

    out, _ = _run(spark, src, docs.schema, dirs=dirs)
    got = _pairs(out)
    assert got == _pairs(minhash_lsh_pairs(docs, n=3, k=16, bands=4, threshold=0.2))
    assert (999_999_999, 999_999_999, 1.0) not in got
    assert (1, 2, 0.999999) not in got
    _cleanup(src, *dirs.values())


def test_stream_dedup_lsm_compaction_preserves_results(spark, sf_dir):
    """compact_lsh_state merges the runs without changing what later
    batches see: ingest half, compact, ingest the rest — final pairs
    still equal the full-corpus batch run, and each state relation is
    down to a single run before the second ingest."""
    docs = load_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    src = _tmp("dstream_lsm_src")
    stage_changelog_files(first, src, n_chunks=3, key_col="doc_id")
    out1, dirs = _run(spark, src, docs.schema)
    out1.count()  # drain

    compact_lsh_state(spark, dirs["state_dir"])
    for rel in ("sig", "sh"):
        runs = os.listdir(os.path.join(dirs["state_dir"], rel))
        assert len([r for r in runs if r.startswith("ingest_id=")]) == 1, rel

    tmp = f"{src}/_stage_x"
    second.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = f"{src}/chunk-9999.parquet"
    shutil.move(f"{tmp}/{part}", dst)
    shutil.rmtree(tmp)
    os.utime(dst, (time.time(), time.time()))

    out2, _ = _run(spark, src, docs.schema, dirs=dirs)
    assert _pairs(out2) == _pairs(
        minhash_lsh_pairs(docs, n=3, k=16, bands=4, threshold=0.2)
    )
    _cleanup(src, *dirs.values())


def test_stream_dedup_leaves_no_persisted_rdds(spark, sf_dir):
    """The per-batch persists (shingles + signatures) are scope-released
    inside foreachBatch — the two-discipline staging lifecycle."""
    docs = load_table(spark, sf_dir, "documents")
    src = _tmp("dstream_hyg_src")
    stage_changelog_files(docs, src, n_chunks=2, key_col="doc_id")
    out, dirs = _run(spark, src, docs.schema)
    out.count()
    assert not spark.sparkContext._jsc.getPersistentRDDs().size()
    _cleanup(src, *dirs.values())
