"""File-backed changelog stream staging (S1).

The reference tails an ordered binlog (cdc.py:87-100).  The file-source
stand-in must preserve that ordering across micro-batches, so the
changelog is written as seq-range chunks whose modification times
increase with the range — Spark's FileStreamSource picks oldest-first,
giving in-order delivery with maxFilesPerTrigger=N."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame


def stage_changelog_files(
    changelog: DataFrame,
    out_dir: str,
    n_chunks: int = 4,
    key_col: str = "seq",
    drop_key: bool = False,
) -> None:
    """Write the changelog as n_chunks key-ordered parquet files with
    strictly increasing mtimes.

    The mtimes are the load-bearing part: FileStreamSource replays files
    oldest-mtime-first, and a parallel ``df.write`` finishes its part
    files in ARBITRARY order — staged that way, an early-time chunk can
    be listed after a later one, land entirely below the advanced
    watermark, and be dropped wholesale as late data (observed at
    sf0.1).  Sequential per-chunk writes + explicit utime make replay
    order deterministic.

    ``key_col`` must be numeric (default: the changelog's seq); pass
    ``drop_key=True`` when it is a helper column that must not appear in
    the staged schema."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    bounds = changelog.selectExpr(
        *[
            f"percentile_approx({key_col}, {i / n_chunks}, 10000) as b{i}"
            for i in range(1, n_chunks)
        ]
    ).collect()[0]
    cuts = [None, *[bounds[f"b{i}"] for i in range(1, n_chunks)], None]
    base = time.time() - 3600
    for i in range(n_chunks):
        chunk = changelog
        if cuts[i] is not None:
            chunk = chunk.filter(f"{key_col} > {cuts[i]}")
        if cuts[i + 1] is not None:
            chunk = chunk.filter(f"{key_col} <= {cuts[i + 1]}")
        if drop_key:
            chunk = chunk.drop(key_col)
        tmp = f"{out_dir}/_stage_{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{out_dir}/chunk-{i:04d}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))


def stage_event_files(events: DataFrame, out_dir: str, n_chunks: int = 2) -> None:
    """Stage an events-shaped DataFrame as ts-ordered chunks with
    increasing mtimes (see stage_changelog_files for why) — the
    deterministic replacement for ``orderBy(ts).coalesce(n).write``
    in the streaming fixtures."""
    from pyspark.sql import functions as F

    keyed = events.withColumn("_stage_key", F.unix_micros("ts"))
    stage_changelog_files(
        keyed, out_dir, n_chunks=n_chunks, key_col="_stage_key", drop_key=True
    )
