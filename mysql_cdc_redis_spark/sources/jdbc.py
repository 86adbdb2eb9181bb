"""JDBC source scaffolding (S9; BASELINE.json's 'Structured Streaming +
JDBC source' approach).

No MySQL server exists in the test container, so nothing here executes
against a live database in CI; the partitioning math — the part that
matters at 100 TB — is a pure function with unit tests, and
``read_partitioned`` is a thin assembly of the standard JDBC options.

Design notes for the production path:
* snapshot reads (the initial load before binlog tailing) MUST be
  partitioned — a single-connection JDBC read serializes the whole
  table through one executor.  partitionColumn/lowerBound/upperBound/
  numPartitions give range-partitioned parallel scans.
* pushdown: Catalyst pushes filters/projections into the JDBC query
  (`PushedFilters` in explain), so declarative plans keep working.
* the change stream itself comes from Debezium (sources/debezium.py);
  JDBC covers the S9 information_schema scan and snapshot bootstrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def partition_bounds(lower: int, upper: int, n_partitions: int) -> list[tuple[int, int]]:
    """Range partition [lower, upper] into n half-open strides — the same
    stride logic Spark's JDBCRelation uses, exposed for testing and for
    building predicate-based partitioning (`predicates=` API) when the
    key space is sparse or skewed."""
    if n_partitions <= 0:
        raise ValueError("n_partitions must be positive")
    if upper < lower:
        raise ValueError("upper < lower")
    n = min(n_partitions, max(1, upper - lower + 1))
    stride = (upper - lower + 1) // n or 1
    bounds = []
    start = lower
    for i in range(n):
        end = upper + 1 if i == n - 1 else start + stride
        bounds.append((start, end))
        start = end
    return bounds


def read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    n_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC snapshot read.  Not exercised in CI (no server);
    kept to a thin, obviously-correct assembly of the standard options."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(n_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def information_schema_query(db: str) -> str:
    """The reference's schema-inference scan (bq_schema_from_mysql.py:
    150-151), ready for spark.read.jdbc(query=...)."""
    return (
        "SELECT table_name, column_name, data_type, ordinal_position "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{db}' ORDER BY table_name, ordinal_position"
    )
