"""Second streaming twin of the compaction operator, on Spark 4's
transformWithStateInPandas (the successor API to applyInPandasWithState;
SURVEY.md §2.8 T4).

Same semantics as streaming/compact_stream.py — state per (tbl, rid) is
(fold_state, last_seq, payload_json), the rcache.py:196-222 action
algebra folds per event, annihilation clears the key's state so a later
insert starts a fresh epoch — but expressed as a StatefulProcessor:

* ``init`` acquires a named ValueState from the processor handle (the
  state-store column family replacing applyInPandasWithState's single
  implicit state tuple — richer state shapes, e.g. ListState/MapState,
  become available without re-encoding).
* ``handleInputRows`` receives each key's micro-batch rows; ordering
  inside the batch is restored by an explicit seq sort (the binlog
  position — arrival order is a semantic input of the reference's
  merge, rcache.py:246-254).
* TTL is deliberately None: the reference's cache is unbounded between
  dumps (cdc_config.py:42 flush policy lives a layer above, in
  streaming/policies.py::FlushPolicy).

Both twins must produce byte-identical finalized state; the parity test
runs batch ≡ applyInPandasWithState ≡ transformWithStateInPandas on the
same changelog, and the catalog entry hash-checks this path against the
*batch* DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType

from ..operators.compaction import ACTION_FOLD_SENTINEL, rid_expr
from .compact_stream import (
    _OUTPUT_SCHEMA,
    _STATE_SCHEMA,
    _fold,
    finalize_stream_output,
)


class CompactionProcessor(StatefulProcessor):
    """The keyed cache (rcache.py:224-259) as a StatefulProcessor."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("cache", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        tbl, rid = key
        if self._state.exists():
            fold_state, last_seq, payload_json = self._state.get()
        else:
            fold_state, last_seq, payload_json = ACTION_FOLD_SENTINEL, -1, None

        for pdf in rows:
            pdf = pdf.sort_values("seq")
            for action in pdf["cdc_action"]:
                fold_state = _fold(fold_state, action)
            tail = pdf.iloc[-1]
            if int(tail["seq"]) > last_seq:
                last_seq = int(tail["seq"])
                payload_json = tail["payload_json"]

        if fold_state == ACTION_FOLD_SENTINEL:
            self._state.clear()  # fresh epoch on a future insert
        else:
            self._state.update((fold_state, last_seq, payload_json))
        yield pd.DataFrame(
            [
                {
                    "tbl": tbl,
                    "rid": rid,
                    "cdc_action": fold_state,
                    "last_seq": last_seq,
                    "payload_json": payload_json,
                }
            ]
        )

    def close(self) -> None:
        pass


def compact_stream_tws(
    changelog: DataFrame,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    table_col: str = "tbl",
) -> DataFrame:
    """Wire the StatefulProcessor onto a streaming changelog; returns the
    update-mode emission stream (same shape as compact_stream)."""
    keyed = (
        changelog.withColumn("rid", rid_expr(pk_cols))
        .filter(F.col("rid").isNotNull())  # M3 reject path
        .withColumn(
            "payload_json", F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
        )
        .select(
            F.col(table_col).alias("tbl"), "rid", "seq", "cdc_action", "payload_json"
        )
    )
    return keyed.groupBy("tbl", "rid").transformWithStateInPandas(
        CompactionProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def run_compaction_stream_tws(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType,
    pk_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    checkpoint_dir: str,
    emissions_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """availableNow end-to-end run, mirroring run_compaction_stream.

    transformWithState is backed by the RocksDB state store only (the
    default HDFS-backed provider doesn't implement column families), so
    the provider conf is pinned here; checkpointed offsets/state live
    under checkpoint_dir exactly as before."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    emissions = compact_stream_tws(stream, pk_cols, payload_cols)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(emissions_dir)

    q = (
        emissions.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    payload_schema = StructType([source_schema[c] for c in payload_cols])
    return finalize_stream_output(spark.read.parquet(emissions_dir), payload_schema)
