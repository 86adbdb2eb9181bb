"""Audit the DuckDB oracle result types against the Spark result schema
for every catalog query, and emit the cast map that makes them agree.

Why: the driver's value-hash is type-sensitive.  DuckDB types
``sum(<int>)`` as HUGEINT and some rounded decimal aggregates as
DECIMAL(38,x); Spark emits bigint/double for the same expressions.  The
cell VALUES are identical but the hashes differ (round-1 VERDICT.md,
"What's wrong #1").  This script binds every oracle (no execution) and
analyzes every Spark plan (schema only) and reports each column whose
DuckDB type is not equivalent to the Spark type, together with the
DuckDB cast target derived from the Spark type.

NOTE: plans/catalog.py already applies plans/oracle_casts.py at
registration, so this audit sees the WRAPPED oracles — a clean run
prints an empty cast map, which is the expected steady state.  To
regenerate the map from scratch, temporarily empty ORACLE_CASTS first.

Output: JSON on stdout —
  {query: {"cols": [ordered oracle column names],
           "casts": {col: "BIGINT" | "DOUBLE" | ...}}}
for every query needing at least one cast.  tools/gen_oracle_casts.py
turns this into mysql_cdc_redis_spark/plans/oracle_casts.py.

Usage: python tools/audit_oracle_types.py [sf_dir] > /tmp/oracle_audit.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mysql_cdc_redis_spark.plans import all_queries  # noqa: E402
from mysql_cdc_redis_spark.plans.typecheck import (  # noqa: E402
    duck_cast_for_spark,
    oracle_type_mismatches,
)
from mysql_cdc_redis_spark.session import get_spark  # noqa: E402
from mysql_cdc_redis_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(app_name="oracle-type-audit")

    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(all_queries().items()):
        if not q.oracle:
            continue
        try:
            rel = con.sql(q.oracle)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"duck: {e}"
            continue
        try:
            df = q.fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"spark: {e}"
            continue
        mism = oracle_type_mismatches(df, rel)
        casts: dict[str, str] = {}
        for col, (st, dk) in mism.items():
            tgt = duck_cast_for_spark(st)
            if tgt is None:
                errors[name] = f"no cast target for spark type {st} (col {col}, duck {dk})"
            else:
                casts[col] = tgt
        if casts:
            out[name] = {"cols": [c.lower() for c in rel.columns], "casts": casts}
    json.dump({"casts": out, "errors": errors}, sys.stdout, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
