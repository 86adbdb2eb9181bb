"""Debezium envelope → changelog adapter (S1, production path).

In production the reference's binlog tail (BinLogStreamReader,
cdc.py:87-97) is replaced by Debezium publishing row events to Kafka;
Spark consumes them with spark.readStream.format("kafka") and this
module turns the JSON envelope into the engine's changelog schema:

  envelope: {"payload": {"before": {...}, "after": {...},
             "op": "c|u|d|r", "ts_ms": ..., "source": {"db", "table",
             "pos"|"lsn"...}}}

Mapping to reference semantics (cdc.py:60-74):
  op c/r → insert (r = snapshot read), u → update, d → delete
  row image: after for c/u/r, before for d (the reference uses
    values/after_values and drops before-images on update — we keep the
    delete's before-image as the payload because delete has no after)
  cdc_ts ← ts_ms; seq ← source position; db/tbl ← source metadata

All parsing is from_json/JVM — the stream never touches Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

OP_TO_ACTION = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def action_from_op(op: Column) -> Column:
    expr = F.when(op.isin("c", "r"), F.lit("insert")).when(op == "u", F.lit("update"))
    return expr.when(op == "d", F.lit("delete")).otherwise(F.lit(None))


def _envelope_schema(row_schema: StructType) -> StructType:
    payload = (
        StructType()
        .add("before", row_schema)
        .add("after", row_schema)
        .add("op", "string")
        .add("ts_ms", "long")
        .add(
            "source",
            StructType().add("db", "string").add("table", "string").add("pos", "long"),
        )
    )
    return StructType().add("payload", payload)


def classify_debezium(
    raw: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
) -> DataFrame:
    """Production hardening around parse_debezium — the message classes a
    real Kafka consumer of a Debezium topic must handle without poisoning
    the stream:

    * ``kafka_tombstone`` — a NULL message value.  Debezium publishes one
      after each delete so log-compacted topics drop the key; it carries
      no row data and must be skipped (the delete itself was the
      preceding message).
    * ``heartbeat`` — an envelope whose payload has no ``op`` (Debezium
      heartbeat/transaction-metadata messages): liveness signals, not row
      events.
    * ``corrupt`` — unparseable JSON; ``from_json`` yields NULL.  Routed
      to a dead-letter disposition instead of failing the job (the batch
      analog is cdc_dead_letter_routing).
    * ``event`` — a well-formed row envelope for parse_debezium.

    Returns the input with ``disposition`` plus the parsed envelope
    struct (NULL except for events/heartbeats); all JVM expressions."""
    parsed = F.from_json(F.col(value_col), _envelope_schema(row_schema))
    disposition = (
        F.when(F.col(value_col).isNull(), F.lit("kafka_tombstone"))
        .when(parsed.isNull() | parsed["payload"].isNull(), F.lit("corrupt"))
        .when(parsed["payload"]["op"].isNull(), F.lit("heartbeat"))
        .otherwise(F.lit("event"))
    )
    return raw.withColumn("envelope", parsed).withColumn("disposition", disposition)


def parse_debezium(
    raw: DataFrame,
    row_schema: StructType,
    value_col: str = "value",
) -> DataFrame:
    """Parse a DataFrame of Debezium JSON strings (e.g. the `value` of a
    Kafka source) into changelog rows: seq, db, tbl, cdc_action, cdc_ts,
    + the typed row image columns of row_schema."""
    env = StructType()
    payload = (
        StructType()
        .add("before", row_schema)
        .add("after", row_schema)
        .add("op", "string")
        .add("ts_ms", "long")
        .add(
            "source",
            StructType().add("db", "string").add("table", "string").add("pos", "long"),
        )
    )
    env = env.add("payload", payload)
    parsed = raw.select(F.from_json(F.col(value_col), env).alias("e")).select("e.payload.*")
    image = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    return parsed.select(
        F.col("source.pos").alias("seq"),
        F.col("source.db").alias("db"),
        F.col("source.table").alias("tbl"),
        action_from_op(F.col("op")).alias("cdc_action"),
        F.timestamp_millis(F.col("ts_ms")).alias("cdc_ts"),
        image.alias("row"),
    ).select("seq", "db", "tbl", "cdc_action", "cdc_ts", "row.*")
