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


def stage_changelog_files(changelog: DataFrame, out_dir: str, n_chunks: int = 4) -> None:
    """Write the changelog as n_chunks seq-ordered parquet files with
    strictly increasing mtimes."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    bounds = changelog.selectExpr(
        *[
            f"percentile_approx(seq, {i / n_chunks}, 10000) as b{i}"
            for i in range(1, n_chunks)
        ]
    ).collect()[0]
    cuts = [None, *[bounds[f"b{i}"] for i in range(1, n_chunks)], None]
    base = time.time() - 3600
    for i in range(n_chunks):
        chunk = changelog
        if cuts[i] is not None:
            chunk = chunk.filter(f"seq > {cuts[i]}")
        if cuts[i + 1] is not None:
            chunk = chunk.filter(f"seq <= {cuts[i + 1]}")
        tmp = f"{out_dir}/_stage_{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{out_dir}/chunk-{i:04d}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))
