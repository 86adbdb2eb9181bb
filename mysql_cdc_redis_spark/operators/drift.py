"""Schema fingerprinting + drift detection (SURVEY.md P4/A4).

The reference detects ALTER TABLE drift at dump time by fingerprinting
each row's sorted field-name tuple and grouping on it (`group_by_field`,
dump2csv.py:50-60); >1 fingerprint per table means "table maybe altered"
and the odd groups are quarantined to `.tmp` files (dump2csv.py:78-87).

Spark is schema-first, so for fixed-schema DataFrames the fingerprint is
a constant; the dynamic per-row dict case is modeled as a map-typed
payload column, fingerprinted with real map_keys."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dataframe_fingerprint(df: DataFrame) -> tuple[str, ...]:
    """P4 for a fixed-schema DataFrame: tuple(sorted(columns)) — the
    direct analog of dump2csv.py:54-59 where a row's schema is its dict
    keys."""
    return tuple(sorted(df.columns))


def schema_fingerprint(map_col: Column) -> Column:
    """P4 for dynamic (map-typed) rows: comma-joined sorted key names.
    All JVM built-ins: map_keys -> array_sort -> array_join."""
    return F.array_join(F.array_sort(F.map_keys(map_col)), ",")


def drift_groups(df: DataFrame, map_col: str, table_col: str = "tbl") -> DataFrame:
    """A4: group rows by fingerprint per table and flag drift (more than
    one fingerprint observed — dump2csv.py:78-80).  Returns one row per
    (table, fingerprint) with counts and the drift flag; the caller
    routes drifted groups to the `.tmp` quarantine sink."""
    from pyspark.sql.window import Window

    fp = df.select(
        F.col(table_col).alias("tbl"), schema_fingerprint(F.col(map_col)).alias("fingerprint")
    )
    per_table = Window.partitionBy("tbl")
    return (
        fp.groupBy("tbl", "fingerprint")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("drifted", F.count(F.lit(1)).over(per_table) > 1)
    )
