"""Cross-engine type equivalence for the oracle harness.

The driver's value-hash is type-sensitive: a DuckDB HUGEINT column with
values identical to Spark's bigint still hash-mismatches (round-1
VERDICT.md).  These helpers canonicalize DuckDB type names into Spark's
``simpleString`` vocabulary so the audit tool (tools/audit_oracle_types
.py), the generated cast map (plans/oracle_casts.py) and the regression
test (tests/test_oracle_types.py) all agree on what "same type" means.
"""

from __future__ import annotations

import re


def canon_duck(t: str) -> str:
    """Canonicalize a DuckDB type string to Spark's simpleString vocabulary."""
    t = t.strip()
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        return f"array<{canon_duck(m.group(1))}>"
    u = t.upper()
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", u)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    mapping = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "HUGEINT": "hugeint",
        "UBIGINT": "ubigint",
        "UINTEGER": "uint",
        "DOUBLE": "double",
        "FLOAT": "float",
        "REAL": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "TIMESTAMP_NS": "timestamp",
        "BLOB": "binary",
        "INTERVAL": "interval",
    }
    return mapping.get(u, u.lower())


def canon_spark(simple: str) -> str:
    """Canonicalize a Spark simpleString for comparison against canon_duck.

    timestamp_ntz ≡ DuckDB TIMESTAMP (both naive wall-clock; the session
    timezone is pinned UTC so instants agree — driver-verified in r01)."""
    if simple == "timestamp_ntz":
        return "timestamp"
    m = re.fullmatch(r"array<(.+)>", simple)
    if m:
        return f"array<{canon_spark(m.group(1))}>"
    return simple


def duck_cast_for_spark(simple: str) -> str | None:
    """DuckDB cast target that makes an oracle column match a Spark type."""
    m = re.fullmatch(r"array<(.+)>", simple)
    if m:
        inner = duck_cast_for_spark(m.group(1))
        return f"{inner}[]" if inner else None
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", simple)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    mapping = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "smallint": "SMALLINT",
        "tinyint": "TINYINT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BLOB",
    }
    return mapping.get(simple)


def oracle_type_mismatches(df, rel) -> dict[str, tuple[str, str]]:
    """{column: (spark_type, duck_type)} where the two disagree.

    ``df`` is the (unexecuted) Spark DataFrame, ``rel`` the (unexecuted)
    bound DuckDB relation for the oracle."""
    s_types = {f.name.lower(): canon_spark(f.dataType.simpleString()) for f in df.schema}
    out: dict[str, tuple[str, str]] = {}
    for col, dt in zip(rel.columns, rel.types):
        c = col.lower()
        st = s_types.get(c)
        dk = canon_duck(str(dt))
        if st is not None and st != dk:
            out[c] = (st, dk)
    return out
