"""Streaming MinHash-LSH corpus dedup — near-dup detection AS DATA
ARRIVES, the streaming twin of ``minhash_lsh_pairs`` /
``minhash_lsh_new_vs_corpus`` (operators/dedup.py).

A 100-TB training corpus is not deduplicated once; it is INGESTED, and
every ingest batch must be checked against everything already accepted
without re-pairing the whole corpus (the reference's poll-loop shape:
cdc.py:101-117 consumes deltas forever, rcache.py:224-259 folds each
poll into durable state).  This module keeps the LSH index as durable
Spark-native state and makes each micro-batch cost proportional to the
BATCH, never the corpus:

* **State = an LSM of immutable sorted BUCKETED runs.**  Each
  micro-batch appends two runs under ``state_dir``: the batch's banded
  MinHash digests (``sig/ingest_id=N/bucket=B``, bucketed by
  ``pmod(xxhash64(bkey), n_buckets)`` and key-sorted within buckets)
  and its shingle inverted index (``sh/ingest_id=N/bucket=B``, bucketed
  on doc id the same way).  Runs are written once and never rewritten —
  the partition-dir-per-batch layout is exactly-once under foreachBatch
  replay (a retried batch OVERWRITES its own ``ingest_id=N`` dirs,
  never duplicates them).
* **Probe I/O scales with the batch, not the corpus** (the round-6
  perf-weak fix).  The batch's probe-key set is small and known before
  the state read, so it prunes at TWO granularities: (1) the touched
  bucket ids become a partition filter — untouched ``bucket=B`` dirs
  are eliminated at file listing, their footers never opened; (2) when
  the key set is below ``_KEY_PUSH_CAP`` it is also pushed as a literal
  IN predicate, which the key-sorted runs' tight row-group min/max
  footers turn into row-group skips WITHIN touched buckets.  Per-batch
  read cost is O(row-groups containing batch keys), independent of
  accumulated corpus size; at cluster scale ``n_buckets`` comes from
  ``auto_bucket_count`` (operators/scale.py) so each bucket stays
  ~256 MB.  Pinned by test_plan_quality.py (PartitionFilters +
  PushedFilters) and by a behavioral test that corrupts every untouched
  bucket's files and still probes correctly (test_streaming_dedup.py).
  Pruning is ADAPTIVE (``prune_min_state_ratio``): while the state
  holds fewer than ratio × batch docs, the footprint collects and
  pushed predicates cost more than the batch-sized scan they would
  save (measured 5-10× per-batch slowdown when un-gated), so the probe
  reads the runs whole — still O(batch) I/O, since the gate bounds the
  state itself.  Either branch is O(batch), never O(corpus).
* **Probe = broadcast the batch, never shuffle the corpus.**  New-vs-
  corpus candidates come from ``state_sig ⋈ broadcast(batch_bands)`` on
  (band, bkey); exact-Jaccard verification reads only the state shingle
  rows of candidate docs via a broadcast semi-join.  The corpus-side
  relations are never exchanged; per-batch shuffle volume is
  O(batch + candidates).
* **Emissions are exactly-once**: each batch's verified pairs overwrite
  ``pairs_dir/ingest_id=N`` BEFORE the commit-log append, so a replay
  replaces — never duplicates — its pairs (same contract as the
  retraction twin, streaming/compact_jvm.py).
* **Telescoping parity**: every unordered near-dup pair {x, y} is
  emitted exactly once — by the batch that ingests the later member
  (cross pairs) or by their shared batch (within pairs) — so the union
  of all emissions equals the one-shot batch ``minhash_lsh_pairs`` over
  the full corpus under ANY batch slicing.  Pairs are canonicalized to
  (a, b) = (least, greatest) so the equality is literal; pinned by
  tests/test_streaming_dedup.py and the catalog entry's DuckDB oracle
  (the SAME oracle as the batch all-pairs form).
* **Compaction is automatic, replay-safe, and crash-safe**
  (``compact_lsh_state``): run count stays bounded under a long-lived
  ingest loop, the possibly-replayable newest run is never a compaction
  target, and the root swap is recoverable at every crash point.

Everything is JVM expression algebra — zero Python row crossings.  The
only collects are the per-batch probe-key collects, bounded by
O(min(batch keys, _KEY_PUSH_CAP) + n_buckets) — proportional to the
batch by construction, never the corpus.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import (
    _banded,
    _verify_jaccard_pairs,
    minhash_signatures,
    shingle_hashes,
)

# Push the probe-key set as a literal IN predicate (row-group skipping
# inside touched buckets) only while it stays cheap to ship.  MEASURED
# (sf1, 2,500-doc batches = 10k band keys): a 10k-literal IN cost ~20 s
# of driver time PER BATCH — ~2 ms per literal across py4j transfer,
# Catalyst analysis, and parquet filter conversion — versus ~0 saved,
# while bucket-dir pruning alone was within noise of the unpruned scan.
# So the cap is small: the IN push is a bonus for tiny probe batches
# (point lookups, trickle ingests); the load-bearing prune at scale is
# the bucket-dir partition filter, whose granularity auto_bucket_count
# keeps at ~256 MB per bucket — still O(batch) buckets read.
_KEY_PUSH_CAP = 1_024

_DEFAULT_BUCKETS = 16


def _bucket_of(col: Column, n_buckets: int) -> Column:
    """Stable bucket id for a run key: pmod (never abs%, see
    operators/scale.py:salt_from_hash) of the 64-bit hash.  The SAME
    expression assigns buckets at write time and derives the touched
    set at probe time — determinism across JVMs is what makes the
    partition filter sound."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_meta.json")


def _load_meta(state_dir: str) -> dict:
    """{"n_buckets": int, "batches": {int batch_id: int n_docs}} —
    empty dict if no batch ever committed."""
    p = _meta_path(state_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        raw = json.load(f)
    return {
        "n_buckets": int(raw["n_buckets"]),
        "batches": {int(k): int(v) for k, v in raw["batches"].items()},
    }


def _save_meta(state_dir: str, meta: dict) -> None:
    tmp = _meta_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "n_buckets": int(meta["n_buckets"]),
                "batches": {str(k): int(v) for k, v in meta["batches"].items()},
            },
            f,
        )
    os.replace(tmp, _meta_path(state_dir))  # atomic on POSIX


def _commit(state_dir: str, batch_id: int, n_docs: int, n_buckets: int) -> None:
    meta = _load_meta(state_dir) or {"n_buckets": n_buckets, "batches": {}}
    meta["batches"][int(batch_id)] = int(n_docs)
    _save_meta(state_dir, meta)


def _write_run(
    df: DataFrame,
    root: str,
    batch_id: int,
    sort_col: str,
    n_buckets: int = _DEFAULT_BUCKETS,
) -> None:
    """One immutable sorted bucketed run: overwrite this batch's
    partition dir (idempotent under replay — static overwrite replaces
    the WHOLE ``ingest_id=N`` tree, so no stale bucket dir from a
    crashed attempt survives a retry that happens to produce fewer
    buckets), bucketed by the probe key's hash so probes prune at the
    directory level, and key-sorted within buckets so row-group
    min/max statistics are disjoint and tight for the pushed IN
    predicate."""
    bucketed = df.withColumn("bucket", _bucket_of(F.col(sort_col), n_buckets))
    (
        # hash-repartition on the bucket id, NOT repartitionByRange:
        # range partitioning runs a sampling job per write (two extra
        # jobs per micro-batch), and all it buys here is splitting an
        # oversized bucket across tasks — but auto_bucket_count sizes
        # buckets to ~256 MB precisely so one-task-per-bucket is right.
        # Each bucket value still lands whole in one task, key-sorted,
        # so per-file row-group min/max stats stay disjoint and tight.
        bucketed.repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", sort_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(os.path.join(root, f"ingest_id={batch_id}"))
    )


def _read_runs(
    spark: SparkSession,
    root: str,
    before_batch_id: int,
    key_col: str | None = None,
    keys: list | None = None,
    buckets: list[int] | None = None,
    schema: str | None = None,
) -> DataFrame | None:
    """Union of the committed runs strictly OLDER than the running
    batch, pruned to the batch's probe footprint.  foreachBatch is
    sequential, so every ``ingest_id < before_batch_id`` dir is fully
    committed; the filter is a partition prune, which also excludes a
    partial ``ingest_id=before_batch_id`` dir left by a crashed attempt
    of the batch now retrying.

    ``buckets`` prunes at file-listing time (untouched ``bucket=B``
    dirs are never listed, their footers never read); ``keys`` (when
    the caller's key set fit under _KEY_PUSH_CAP) is pushed to the
    parquet reader as a literal IN, skipping row groups inside touched
    buckets via the runs' sorted min/max footers.  Both are semantic
    no-ops — the downstream joins already restrict to these keys — so
    correctness never depends on them.  ``schema`` (DDL string,
    including the ingest_id/bucket partition columns) skips schema
    inference — without it the reader opens ONE arbitrary footer to
    infer, which may belong to a bucket the probe never touches."""
    if not os.path.isdir(root):
        return None
    reader = spark.read.option("basePath", root)
    if schema is not None:
        reader = reader.schema(schema)
    runs = reader.parquet(root).filter(F.col("ingest_id") < before_batch_id)
    if buckets is not None and "bucket" in runs.columns:
        runs = runs.filter(F.col("bucket").isin([int(b) for b in buckets]))
    if keys is not None and key_col is not None:
        runs = runs.filter(F.col(key_col).isin(keys))
    return runs


def _probe_footprint(
    df: DataFrame, col: str, n_buckets: int
) -> tuple[list | None, list[int]]:
    """(keys, touched bucket ids) of the batch's probe-key column —
    the literals that prune the state read.  One bounded collect:
    ≤ _KEY_PUSH_CAP distinct (key, bucket) rows (the overflow path
    collects only the ≤ n_buckets distinct bucket ids instead), i.e.
    O(batch), never O(corpus) — a licensed collect."""
    kb = (
        df.select(
            F.col(col).alias("k"), _bucket_of(F.col(col), n_buckets).alias("b")
        )
        .distinct()
        .limit(_KEY_PUSH_CAP + 1)
        .collect()
    )
    if len(kb) <= _KEY_PUSH_CAP:
        return [r["k"] for r in kb], sorted({r["b"] for r in kb})
    buckets = (
        df.select(_bucket_of(F.col(col), n_buckets).alias("b")).distinct().collect()
    )
    return None, sorted(r["b"] for r in buckets)


def _cross_candidates(state_sig: DataFrame, banded_b: DataFrame) -> DataFrame:
    """Corpus × batch candidates: broadcast the batch's band digests so
    the state scan is streamed through a BroadcastHashJoin — the corpus
    side is read but NEVER exchanged, the plan property that makes the
    per-batch cost independent of corpus size (pinned by
    tests/test_plan_quality.py::test_stream_dedup_probe_never_shuffles_state)."""
    return (
        state_sig.select(F.col("doc_id").alias("a"), "band", "bkey")
        .join(
            F.broadcast(banded_b.select(F.col("doc_id").alias("b"), "band", "bkey")),
            ["band", "bkey"],
        )
        .select("a", "b")
        .distinct()
    )


def _recover_root(root: str) -> None:
    """Undo a compaction crash between the two root renames: the old
    root was moved aside but the new one never moved in — restore it.
    Idempotent; called before any compaction and before a stream run."""
    old = root + ".old"
    if not os.path.isdir(root) and os.path.isdir(old):
        os.rename(old, root)


def run_dedup_stream_minhash(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    checkpoint_dir: str,
    state_dir: str,
    pairs_dir: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
    n_buckets: int = _DEFAULT_BUCKETS,
    auto_compact_runs: int | None = 8,
    prune_min_state_ratio: float = 8.0,
) -> DataFrame:
    """availableNow run of the streaming dedup: tail a file-backed
    document stream, emit each batch's verified near-dup pairs (within
    the batch + against the accumulated corpus), and append the batch to
    the LSH state runs.  Returns the accumulated canonical pair set
    (a, b, jaccard) == ``minhash_lsh_pairs`` over everything ingested so
    far (all runs of the same dirs, across restarts).

    ``n_buckets`` fixes the state runs' bucket layout on the FIRST run
    and is thereafter read back from the state meta (a probe computed
    with a different modulus than the writes would prune wrong — the
    stored value always wins).  ``auto_compact_runs`` bounds LSM growth:
    when more than that many committed runs exist after the stream
    drains, ``compact_lsh_state`` folds them (the stream has terminated,
    so the no-live-query precondition holds by construction).

    ``prune_min_state_ratio`` gates the probe pruning ADAPTIVELY: the
    footprint collects and pushed predicates are pure overhead while
    the accumulated state is small (measured: un-gated pruning made
    sf1 micro-batches 5-10× SLOWER than the full-state scan it
    replaced — the scan of a batch-sized state is nearly free, the
    prune machinery is not), so a batch only pays for pruning when the
    state holds more than ``ratio × batch`` docs.  Below the gate the
    probe reads the runs whole — which is still O(batch) I/O, because
    the gate itself bounds the state at ratio × batch.  Above it, the
    bucket-dir prune bounds I/O by the batch's key footprint.  Either
    branch, per-batch cost is O(batch), never O(corpus); set 0 to
    force pruning (tests), ``inf`` to disable."""
    mh_cols = [f"mh{i}" for i in range(k)]
    os.makedirs(state_dir, exist_ok=True)
    sig_root = os.path.join(state_dir, "sig")
    sh_root = os.path.join(state_dir, "sh")
    for root in (sig_root, sh_root):
        _recover_root(root)  # a compaction crash must not look like empty state
    meta0 = _load_meta(state_dir)
    eff_buckets = meta0["n_buckets"] if meta0 else n_buckets
    # explicit run schemas (incl. partition cols): state reads must
    # never infer — inference opens an arbitrary footer, which defeats
    # the bucket prune's "untouched files are never opened" guarantee
    id_type = source_schema[id_col].dataType.simpleString()
    sig_schema = f"doc_id {id_type}, band int, bkey string, ingest_id int, bucket int"
    sh_schema = f"doc_id {id_type}, h bigint, ingest_id int, bucket int"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        sh_b = shingle_hashes(batch_df, n, id_col, text_col).persist()
        sig_b = minhash_signatures(sh_b, k, with_sizes=True).persist()
        banded_b = _banded(sig_b.select("doc_id", *mh_cols), k, bands).persist()
        cand_cross = None
        try:
            sizes_b = sig_b.select("doc_id", "n_sh")
            # one bounded count over the persisted batch digests: feeds
            # the adaptive prune gate here and the meta commit below
            n_b = sig_b.count()
            state_docs = sum(
                v
                for kid, v in _load_meta(state_dir).get("batches", {}).items()
                if kid < batch_id
            )
            do_prune = state_docs > prune_min_state_ratio * max(n_b, 1)

            # within-batch pairs: the ordinary pairwise form over the
            # (small) batch — both sides' shingles are batch-local
            cand_within = (
                banded_b.select(F.col("doc_id").alias("a"), "band", "bkey")
                .join(
                    banded_b.select(F.col("doc_id").alias("b"), "band", "bkey"),
                    ["band", "bkey"],
                )
                .where(F.col("a") < F.col("b"))
                .select("a", "b")
                .distinct()
            )
            pairs = _verify_jaccard_pairs(cand_within, sh_b, sizes_b, threshold)

            bkeys, bkts = (
                _probe_footprint(banded_b, "bkey", eff_buckets)
                if do_prune
                else (None, None)
            )
            probe = bool(bkts) if do_prune else bool(n_b and state_docs)
            state_sig = (
                _read_runs(
                    spark, sig_root, batch_id,
                    key_col="bkey", keys=bkeys, buckets=bkts, schema=sig_schema,
                )
                if probe  # empty batch (or empty state) probes nothing
                else None
            )
            if state_sig is not None:
                # corpus × batch: broadcast the batch's band digests —
                # the (pruned) state scan never exchanges, candidates
                # are Σ_bucket |state_bucket ∩ batch_bucket| rows
                cand_cross = _cross_candidates(state_sig, banded_b).persist()
                if do_prune:
                    a_ids, a_bkts = _probe_footprint(cand_cross, "a", eff_buckets)
                    have_cands = bool(a_bkts)
                else:
                    a_ids, a_bkts = None, None
                    have_cands = not cand_cross.isEmpty()
                if have_cands:  # zero candidates: skip the sh state read entirely
                    # verify reads ONLY candidate docs' state shingle
                    # rows (bucket+IN prune at the scan, broadcast
                    # semi-join for exactness: no state shuffle), and
                    # their n_sh falls out of the same filtered rows
                    sh_a = _read_runs(
                        spark, sh_root, batch_id,
                        key_col="doc_id", keys=a_ids, buckets=a_bkts,
                        schema=sh_schema,
                    ).join(
                        F.broadcast(
                            cand_cross.select(F.col("a").alias("doc_id")).distinct()
                        ),
                        "doc_id",
                        "left_semi",
                    )
                    sizes_a = sh_a.groupBy("doc_id").agg(
                        F.count(F.lit(1)).alias("n_sh")
                    )
                    cross = _verify_jaccard_pairs(
                        cand_cross, sh_a, sizes_a, threshold,
                        sh_b=sh_b, sizes_b=sizes_b,
                    )
                    pairs = pairs.unionByName(cross)

            # canonical order makes the accumulated union literally
            # equal the batch all-pairs output (and its DuckDB oracle)
            canon = pairs.select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                "jaccard",
            )
            # pairs partition BEFORE state runs BEFORE the meta commit:
            # a crash between any two steps leaves only this batch's
            # partitions partial, and the retry overwrites all of them
            canon.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, f"ingest_id={batch_id}")
            )
            _write_run(
                banded_b.select("doc_id", "band", "bkey"),
                sig_root, batch_id, "bkey", eff_buckets,
            )
            _write_run(
                sh_b.select("doc_id", "h"), sh_root, batch_id, "doc_id", eff_buckets
            )
            _commit(state_dir, batch_id, n_b, eff_buckets)
        finally:
            for df in (cand_cross, banded_b, sig_b, sh_b):
                if df is not None:
                    df.unpersist()

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    meta = _load_meta(state_dir)
    if auto_compact_runs and len(meta.get("batches", ())) > auto_compact_runs:
        compact_lsh_state(spark, state_dir)

    empty = spark.createDataFrame([], f"a {id_type}, b {id_type}, jaccard double")
    if not meta:  # empty source: no batch ever fired
        return empty
    # zero-pairs detection is a directory pre-check, not an exception
    # net: a genuine read failure (corrupt file, permissions) must
    # propagate, never masquerade as "no near-dups" (round-6 advice)
    part_files = [
        f
        for d in os.listdir(pairs_dir)
        if d.startswith("ingest_id=")
        for f in os.listdir(os.path.join(pairs_dir, d))
        if f.startswith("part-") and f.endswith(".parquet")
    ] if os.path.isdir(pairs_dir) else []
    if not part_files:
        return empty
    return spark.read.parquet(pairs_dir).select("a", "b", "jaccard")


def compact_lsh_state(spark: SparkSession, state_dir: str) -> bool:
    """LSM compaction for the dedup stream's state: merge every
    committed run EXCEPT the newest into ONE sorted bucketed run per
    relation, at the second-highest committed ingest_id.  Returns True
    iff a compaction ran.  Run between stream runs — it rewrites state,
    so it must not race a live query (``run_dedup_stream_minhash``
    invokes it itself after the availableNow query terminates, which
    satisfies the precondition by construction).

    REPLAY SAFETY (round-6 advice #1): ``_commit`` runs inside
    foreachBatch BEFORE the streaming checkpoint commits the batch, so
    the HIGHEST meta batch may be a batch a restarted stream will
    replay — compacting it away (or into itself) would make the
    replay's ``ingest_id < top`` probe see an empty corpus and its run
    overwrite destroy the merged state.  Every batch BELOW the max is
    provably checkpoint-committed (foreachBatch is sequential: batch
    N+1 appearing in meta implies N's checkpoint commit preceded it),
    so the merge target is the SECOND-highest id: the newest run is
    never rewritten, and a replayed top batch sees exactly the same
    row set through its ``< top`` filter before and after compaction.

    CRASH SAFETY (round-6 advice #2): the new root — merged run PLUS
    the preserved newest run — is built COMPLETE in a temp dir, the old
    root is renamed aside (``root -> root.old``), the new root renamed
    in, then ``root.old`` deleted.  A crash before the first rename
    leaves the old root untouched (temp leftovers are cleared on the
    next call); between the renames, ``_recover_root`` (called here and
    at stream start) restores the old root; after the second rename,
    the new root is already complete and the leftover ``root.old`` is
    cleared on the next call.  No window leaves the root missing-and-
    unrecoverable or half-populated.

    Bucket layout is preserved (same n_buckets, re-sorted per bucket),
    so probe pruning semantics are identical before and after; on a
    cluster this is where ``auto_bucket_count`` (operators/scale.py)
    would re-size the merged run's bucket count — power-of-two counts
    keep old and new layouts co-partition-compatible."""
    meta = _load_meta(state_dir)
    batches = meta.get("batches", {})
    if len(batches) < 2:
        return False  # nothing safely mergeable below the newest run
    ids = sorted(batches)
    target, newest = ids[-2], ids[-1]
    n_buckets = meta["n_buckets"]
    for rel, key in (("sig", "bkey"), ("sh", "doc_id")):
        root = os.path.join(state_dir, rel)
        _recover_root(root)
        old = root + ".old"
        if os.path.isdir(old):  # leftover of a crash AFTER a completed swap
            shutil.rmtree(old)
        tmp = os.path.join(state_dir, f"_compact_{rel}")
        shutil.rmtree(tmp, ignore_errors=True)
        merged = (
            spark.read.option("basePath", root)
            .parquet(root)
            .filter(F.col("ingest_id") <= target)
            .drop("ingest_id")
        )
        (
            # same layout discipline as _write_run: hash on the bucket
            # id (no range-sampler job), whole buckets per task,
            # key-sorted so the merged run's row-group stats stay tight
            merged.repartition(n_buckets, "bucket")
            .sortWithinPartitions("bucket", key)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(tmp, f"ingest_id={target}"))
        )
        # preserve runs newer than the target (COPY, not move: the old
        # root must stay complete until the atomic swap)
        for d in os.listdir(root):
            if d.startswith("ingest_id=") and int(d.split("=", 1)[1]) > target:
                shutil.copytree(os.path.join(root, d), os.path.join(tmp, d))
        os.rename(root, old)
        os.rename(tmp, root)
        shutil.rmtree(old)
    _save_meta(
        state_dir,
        {
            "n_buckets": n_buckets,
            "batches": {
                target: sum(v for b, v in batches.items() if b <= target),
                newest: batches[newest],
            },
        },
    )
    return True
