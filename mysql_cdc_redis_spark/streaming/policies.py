"""Operational policies of the reference's event loop re-expressed on
Spark (SURVEY.md §2.8 T2/T3, §2.4 A5).

* T3 flush policy: the reference dumps the cache when it exceeds
  cache_max_rows=2,000,000 (cdc.py:130-133, cdc_config.py:42) or on
  Redis OOM (FullError → shell-out dump → retry, rcache.py:255-257).
  On Spark, state-store spill is automatic; the *policy* survives as a
  foreachBatch flush hook that snapshots compacted state to the durable
  sink whenever the tracked key count crosses the threshold.
* A5/P5 progress + latency metrics: the reference logs every 1000 rows
  (cdc.py:135-136) and warns when events lag behind wall clock by more
  than binlog_max_latency (cdc.py:101-103).  Spark spelling: observe()
  metrics on the stream — numInputRows, max event lag — surfaced through
  StreamingQueryProgress without touching the data path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_progress_metrics(
    changelog: DataFrame,
    max_latency_s: int = 60_000,
    ts_col: str = "cdc_ts",
    name: str = "cdc_ingest",
) -> DataFrame:
    """Attach observe() metrics: event count (A5 progress counter), count
    of late events and max observed lag vs processing time (P5/T2).
    Works on both batch and streaming DataFrames; results appear in
    df.observe listeners / StreamingQueryProgress.observedMetrics."""
    lag = F.unix_timestamp(F.current_timestamp()) - F.unix_timestamp(F.col(ts_col))
    return changelog.observe(
        name,
        F.count(F.lit(1)).alias("n_events"),
        F.sum((lag > max_latency_s).cast("long")).alias("n_late"),
        F.max(lag).alias("max_lag_s"),
    )


def latency_alert_feed(
    changelog: DataFrame,
    now,
    max_latency_s: int = 60_000,
    ts_col: str = "cdc_ts",
    table_col: str = "tbl",
) -> DataFrame:
    """P5/T2 alert SINK analog of the reference's operational alerting
    (mwlogger.py:176-218 structured syslog/UDP events; cdc.py:101-103
    fires one per late binlog event).  A per-event alert stream would be
    noise at scale, and the reference's logger throttles delivery at the
    transport; the declarative spelling of that throttle is one
    structured alert row per (table, day bucket): name, severity, first
    bucket instant, late count and worst observed lag.  Works identically
    on the batch changelog and inside foreachBatch on micro-batches
    (observe() metrics in with_progress_metrics carry the same counts for
    the monitoring side-channel).

    ``now`` is a Column so replays are deterministic (pin a literal) and
    streaming callers can pass the batch's processing time."""
    lag_s = F.unix_timestamp(now) - F.unix_timestamp(F.col(ts_col))
    late = changelog.filter(lag_s > max_latency_s)
    return (
        late.groupBy(
            F.col(table_col).alias("tbl"),
            F.date_trunc("day", F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.max(lag_s).alias("max_lag_s"),
        )
        .select(
            F.lit("binlog_max_latency").alias("alert"),
            F.lit("warn").alias("severity"),
            "tbl",
            "bucket",
            "n_late",
            "max_lag_s",
        )
    )


class FlushPolicy:
    """T3: dump-when-big.  Tracks the live key count across micro-batches
    (driver-side, O(1) memory) and snapshots the compacted state to the
    durable sink when it crosses max_rows — the Spark analog of
    _trigger_dumping (cdc.py:51-58) without the subprocess hop.

    Use inside foreachBatch:

        policy = FlushPolicy(max_rows=2_000_000, flush=snapshot_fn)
        def sink(batch_df, batch_id):
            ...write emissions...
            policy.observe(batch_df)
    """

    def __init__(self, max_rows: int, flush, count_col: str = "rid"):
        self.max_rows = max_rows  # cache_max_rows, cdc_config.py:42 (0 = off)
        self._flush = flush
        self._count_col = count_col
        self.seen_keys = 0
        self.flushes = 0

    def observe(self, batch_df: DataFrame) -> None:
        # emissions carry one row per touched key; distinct keys per batch
        self.seen_keys += batch_df.select(self._count_col).distinct().count()
        if self.max_rows and self.seen_keys >= self.max_rows:
            self._flush()
            self.seen_keys = 0
            self.flushes += 1
