"""Z-order write layout: files must cover disjoint Morton-key ranges
(range partitioning) so parquet footer min/max stats prune scans on
either source dimension."""

from __future__ import annotations

import glob
import os
import tempfile
import uuid

import pyarrow.parquet as pq

from mysql_cdc_redis_spark.operators.scale import write_zordered, zorder_key
from mysql_cdc_redis_spark.sources import load_table

from pyspark.sql import functions as F


def test_zordered_files_have_disjoint_key_ranges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tsec")
    )
    out = os.path.join(tempfile.gettempdir(), f"zorder_{uuid.uuid4().hex[:8]}")
    write_zordered(
        ev.withColumn("tmin", (F.col("tsec") / 60).cast("bigint")),
        out,
        x_col="user_id",
        y_col="tmin",
        n_files=8,
    )
    ranges = []
    for f in sorted(glob.glob(os.path.join(out, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "_z"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4, "expected several z-partitioned files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file key ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_zorder_key_matches_catalog_query_math(spark, sf_dir):
    # the operator and the catalog query must encode the same curve
    ev = load_table(spark, sf_dir, "events").limit(100)
    df = ev.select(
        zorder_key(
            F.col("user_id"),
            (F.unix_timestamp("ts") / 60).cast("bigint"),
        ).alias("z")
    )
    assert df.filter(F.col("z") < 0).count() == 0
    assert df.count() == 100


def test_small_file_compaction_layout(spark, sf_dir):
    # the layout_compact_small_files catalog entry checks CONTENT
    # equality via its oracle; this checks the LAYOUT claims: ~16x fewer
    # files and disjoint per-file o_orderkey ranges after
    # repartitionByRange
    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(tempfile.gettempdir(), f"compactlay_{uuid.uuid4().hex[:8]}")
    frag, tidy = f"{base}/frag", f"{base}/tidy"
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    spark.read.parquet(frag).repartitionByRange(4, "o_orderkey").write.mode(
        "overwrite"
    ).parquet(tidy)
    tidy_files = sorted(glob.glob(os.path.join(tidy, "*.parquet")))
    assert n_frag >= 32 and len(tidy_files) <= 8, (n_frag, len(tidy_files))

    ranges = []
    for f in tidy_files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_orderkey"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"compacted file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"
