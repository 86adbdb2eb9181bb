"""Turn tools/audit_oracle_types.py output into plans/oracle_casts.py.

Usage:
    python tools/audit_oracle_types.py > /tmp/oracle_audit.json
    python tools/gen_oracle_casts.py /tmp/oracle_audit.json
"""

from __future__ import annotations

import json
import os
import sys

HEADER = '''"""DuckDB oracle type-alignment map (GENERATED — do not hand-edit).

Regenerate with:
    python tools/audit_oracle_types.py > /tmp/oracle_audit.json
    python tools/gen_oracle_casts.py /tmp/oracle_audit.json

Why this exists: the driver's correctness gate hashes values
type-sensitively.  DuckDB binds ``sum(<integer>)`` as HUGEINT,
``count``-arithmetic as BIGINT where Spark emits int, and some rounded
aggregates as DECIMAL — the VALUES are identical but the hash differs
(round-1 VERDICT.md "What's wrong #1").  plans/catalog.py wraps each
affected oracle in a projection that CASTs the offending columns to the
exact type Spark produces, so both engines hand the driver the same
logical and physical type.

``ORACLE_CASTS[name] = (ordered_output_columns, {column: duckdb_cast})``
"""

from __future__ import annotations

ORACLE_CASTS: dict[str, tuple[tuple[str, ...], dict[str, str]]] = {
'''


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_audit.json"
    data = json.load(open(src))
    if data.get("errors"):
        raise SystemExit(f"audit has unresolved errors: {data['errors']}")
    lines = [HEADER]
    for name in sorted(data["casts"]):
        v = data["casts"][name]
        cols = tuple(v["cols"])
        casts = {c: v["casts"][c] for c in sorted(v["casts"])}
        lines.append(f"    {name!r}: (\n        {cols!r},\n        {casts!r},\n    ),\n")
    lines.append("}\n")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mysql_cdc_redis_spark", "plans", "oracle_casts.py",
    )
    with open(out, "w") as f:
        f.write("".join(lines))
    print(f"wrote {out}: {len(data['casts'])} queries")


if __name__ == "__main__":
    main()
