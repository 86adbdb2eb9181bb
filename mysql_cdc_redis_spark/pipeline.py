"""End-to-end CDC pipeline — the Spark composition of the reference's
three entry points (SURVEY.md §3):

  cdc.py   (stream → filter → annotate → keyed save)  →  ingest()
  dump2csv (cache → group → dated CSV → warehouse)     →  dump()
  loadcsv  (CSV → re-save through the same merge)      →  replay()

One process, one SparkSession; offsets live in the stream checkpoint
(K5), compacted state in a table-partitioned parquet dir (K4), dumps in
date-partitioned chunked CSV (K1).  Usage:

    from mysql_cdc_redis_spark.pipeline import CdcPipeline
    p = CdcPipeline(spark, work_dir, pk_cols, payload_cols, schema)
    p.ingest(changelog_dir)     # consume available binlog files
    p.dump(csv_out)             # dated CSV dump of current state
    p.replay(csv_out)           # prove dump→replay is a fixpoint
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .operators.compaction import compact, merge_state
from .operators.dump import dump_to_csv, read_dump
from .streaming.compact_stream import run_compaction_stream


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        pk_cols: tuple[str, ...],
        payload_cols: tuple[str, ...],
        changelog_schema: StructType,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.pk_cols = pk_cols
        self.payload_cols = payload_cols
        self.schema = changelog_schema
        self.checkpoint_dir = os.path.join(work_dir, "checkpoint")  # K5 offsets
        self.emissions_dir = os.path.join(work_dir, "emissions")
        self.state_dir = os.path.join(work_dir, "state")  # K4 cache

    # -- cdc.py analog ----------------------------------------------------
    def ingest(self, changelog_dir: str) -> DataFrame:
        """Consume all currently-available changelog files (blocking=False
        mode), fold through the keyed state, snapshot compacted state to
        the durable parquet dir.  Returns the new state."""
        state = run_compaction_stream(
            self.spark,
            changelog_dir,
            self.schema,
            self.pk_cols,
            self.payload_cols,
            checkpoint_dir=self.checkpoint_dir,
            emissions_dir=self.emissions_dir,
        )
        state.write.mode("overwrite").parquet(self.state_dir)
        return self.state()

    def state(self) -> DataFrame:
        return self.spark.read.parquet(self.state_dir)

    # -- dump2csv analog --------------------------------------------------
    def dump(self, csv_dir: str, max_rows_per_file: int = 1_000_000) -> None:
        """K1: dated, header'd, chunked CSV dump of the live state (the
        upload/BQ-load stages collapse into the sink path — dump.py)."""
        dump_to_csv(
            self.state(),
            csv_dir,
            date_col="cdc_ts",
            max_rows_per_file=max_rows_per_file,
        )

    # -- loadcsv analog ---------------------------------------------------
    def replay(self, csv_dir: str) -> DataFrame:
        """M4: read a dump back and re-merge it into the current state via
        the same algebra; returns the post-replay state (must equal the
        pre-replay state — M5)."""
        state_schema = self.state().schema
        dumped = read_dump(self.spark, csv_dir, schema=state_schema).drop("dt")
        replayed_events = dumped.withColumn("seq", F.lit(0).cast("long"))
        new_state = merge_state(
            self.state(), replayed_events, self.pk_cols, self.payload_cols
        )
        return new_state
