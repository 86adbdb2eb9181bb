"""Catalog-wide EXACT value sweep — no float rounding, no tolerance.

The tests/conftest.py harness collapses float noise below 9 dp because
the catalog convention says both engines round explicitly; this audit
drops that allowance and reports every query whose Spark and DuckDB
results are not IDENTICAL Python values (floats compared bit-for-bit,
-0.0 distinct from 0.0).  Queries listed here are at risk if the
driver's value-hash is byte-exact.

Usage: python tools/audit_float_exactness.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mysql_cdc_redis_spark.plans import all_queries  # noqa: E402
from mysql_cdc_redis_spark.session import get_spark  # noqa: E402
from mysql_cdc_redis_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v  # EXACT — the whole point of this audit
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(app_name="float-exactness-audit")
    bad = []
    for name, q in sorted(all_queries().items()):
        if not q.oracle:
            continue
        try:
            df = q.fn(spark, SF_DIR)
            s = multiset([c.lower() for c in df.columns], [tuple(r) for r in df.collect()])
            rel = con.sql(q.oracle)
            d = multiset([c.lower() for c in rel.columns], rel.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", file=sys.stderr)
            bad.append(name)
            continue
        if s != d:
            diffs = [(a, b) for a, b in zip(s, d) if a != b][:2]
            print(f"ULP-DIFF {name}: {diffs}")
            bad.append(name)
    print(f"\n{len(bad)} of {sum(1 for q in all_queries().values() if q.oracle)} "
          f"queries not byte-exact: {bad}")


if __name__ == "__main__":
    main()
