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

* **State = an LSM of immutable sorted runs.**  Each micro-batch
  appends two runs under ``state_dir``: the batch's banded MinHash
  digests (``sig/ingest_id=N``, sorted by band key) and its shingle
  inverted index (``sh/ingest_id=N``, sorted by doc id).  Runs are
  written once and never rewritten — the partition-dir-per-batch layout
  is exactly-once under foreachBatch replay (a retried batch OVERWRITES
  its own ``ingest_id=N`` dirs, never duplicates them), and sorting
  within runs keeps parquet row-group min/max statistics tight so
  probes prune.  ``compact_lsh_state`` merges accumulated runs into one
  (the LSM compaction step) — on a cluster the merged run would be the
  bucketed warehouse table of operators/scale.py.
* **Probe = broadcast the batch, never shuffle the corpus.**  New-vs-
  corpus candidates come from ``state_sig ⋈ broadcast(batch_bands)`` on
  (band, bkey); exact-Jaccard verification reads only the state shingle
  rows of candidate docs via a broadcast semi-join.  The corpus-side
  relations are scanned but never exchanged; the per-batch shuffle
  volume is O(batch + candidates).
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

Everything is JVM expression algebra — zero Python row crossings.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedup import (
    _banded,
    _verify_jaccard_pairs,
    minhash_signatures,
    shingle_hashes,
)


def _meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_meta.json")


def _load_meta(state_dir: str) -> dict[str, int]:
    p = _meta_path(state_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {str(k): int(v) for k, v in json.load(f).items()}


def _commit(state_dir: str, batch_id: int, n_docs: int) -> None:
    meta = _load_meta(state_dir)
    meta[str(batch_id)] = n_docs
    tmp = _meta_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(state_dir))  # atomic on POSIX


def _write_run(
    df: DataFrame, root: str, batch_id: int, sort_col: str, n_files: int = 1
) -> None:
    """One immutable sorted run: overwrite this batch's partition dir
    (idempotent under replay), globally range-sorted on the probe key so
    row-group statistics are disjoint and tight.  ``n_files`` scales the
    run's write parallelism with batch size (range partitioning keeps
    the global sort)."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(os.path.join(root, f"ingest_id={batch_id}"))
    )


def _read_runs(
    spark: SparkSession, root: str, before_batch_id: int
) -> DataFrame | None:
    """Union of the committed runs strictly OLDER than the running
    batch.  foreachBatch is sequential, so every ``ingest_id <
    before_batch_id`` dir is fully committed; the filter is a partition
    prune, which also excludes a partial ``ingest_id=before_batch_id``
    dir left by a crashed attempt of the batch now retrying."""
    if not os.path.isdir(root):
        return None
    runs = spark.read.option("basePath", root).parquet(root).filter(
        F.col("ingest_id") < before_batch_id
    )
    return runs


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
    run_files: int = 1,
) -> DataFrame:
    """availableNow run of the streaming dedup: tail a file-backed
    document stream, emit each batch's verified near-dup pairs (within
    the batch + against the accumulated corpus), and append the batch to
    the LSH state runs.  Returns the accumulated canonical pair set
    (a, b, jaccard) == ``minhash_lsh_pairs`` over everything ingested so
    far (all runs of the same dirs, across restarts)."""
    mh_cols = [f"mh{i}" for i in range(k)]
    os.makedirs(state_dir, exist_ok=True)
    sig_root = os.path.join(state_dir, "sig")
    sh_root = os.path.join(state_dir, "sh")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        sh_b = shingle_hashes(batch_df, n, id_col, text_col).persist()
        sig_b = minhash_signatures(sh_b, k, with_sizes=True).persist()
        try:
            banded_b = _banded(sig_b.select("doc_id", *mh_cols), k, bands)
            sizes_b = sig_b.select("doc_id", "n_sh")

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

            state_sig = _read_runs(spark, sig_root, batch_id)
            if state_sig is not None:
                # corpus × batch: broadcast the batch's band digests —
                # the state scan never exchanges, candidates are
                # Σ_bucket |state_bucket ∩ batch_bucket| rows
                cand_cross = _cross_candidates(state_sig, banded_b)
                # verify reads ONLY candidate docs' state shingle rows
                # (broadcast semi-join: no state shuffle), and their
                # n_sh falls out of the same filtered rows — the sizes
                # never need separate state
                sh_a = _read_runs(spark, sh_root, batch_id).join(
                    F.broadcast(cand_cross.select(F.col("a").alias("doc_id")).distinct()),
                    "doc_id",
                    "left_semi",
                )
                sizes_a = sh_a.groupBy("doc_id").agg(
                    F.count(F.lit(1)).alias("n_sh")
                )
                cross = _verify_jaccard_pairs(
                    cand_cross, sh_a, sizes_a, threshold, sh_b=sh_b, sizes_b=sizes_b
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
                sig_root, batch_id, "bkey", run_files,
            )
            _write_run(sh_b.select("doc_id", "h"), sh_root, batch_id, "doc_id", run_files)
            _commit(state_dir, batch_id, sig_b.count())
        finally:
            sig_b.unpersist()
            sh_b.unpersist()

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

    empty = spark.createDataFrame(
        [], f"a {source_schema[id_col].dataType.simpleString()}, "
            f"b {source_schema[id_col].dataType.simpleString()}, jaccard double"
    )
    if not _load_meta(state_dir):  # empty source: no batch ever fired
        return empty
    try:
        out = spark.read.parquet(pairs_dir)
    except Exception:
        return empty  # every batch emitted zero pairs: nothing to infer
    return out.select("a", "b", "jaccard")


def compact_lsh_state(spark: SparkSession, state_dir: str) -> None:
    """LSM compaction for the dedup stream's state: merge all committed
    runs into ONE sorted run per relation (at the max committed
    ingest_id, so the ``ingest_id < batch_id`` probe filter of any later
    batch still sees exactly the same rows).  Run OFFLINE between stream
    runs — it rewrites state, so it must not race a live query.  On a
    cluster the merged run is where the bucketed-table layout
    (operators/scale.py) takes over; here it bounds run-count growth so
    probe listing and row-group pruning stay O(1) in batches ingested."""
    import shutil

    meta = _load_meta(state_dir)
    if not meta:
        return
    top = max(int(b) for b in meta)
    for rel, key in (("sig", "bkey"), ("sh", "doc_id")):
        root = os.path.join(state_dir, rel)
        merged = (
            spark.read.option("basePath", root)
            .parquet(root)
            .filter(F.col("ingest_id") <= top)
            .drop("ingest_id")
        )
        tmp = os.path.join(state_dir, f"_compact_{rel}")
        (
            merged.repartitionByRange(1, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.rmtree(root)
        os.makedirs(root)
        os.replace(tmp, os.path.join(root, f"ingest_id={top}"))
