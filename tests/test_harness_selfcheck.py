"""Self-check for the differential harness's two comparison paths.

conftest.compare_with_oracle has a slow path (per-cell Python
normalization mirroring the driver's type-sensitive multiset hash) and,
above _FAST_PATH_MIN_ROWS, a vectorized DuckDB EXCEPT-ALL fast path
(introduced when the sf1 sweep showed ~3.6M-row cdc state results take
tens of minutes through to_pylist).  These tests pin the two paths to
the SAME verdict on the tricky value classes the slow path was built
around: float rounding at hash granularity, the -0.0/0.0 sign split,
NaN self-equality, NULLs, naive-vs-UTC timestamps, and genuine
mismatches in each class.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pytest

from .conftest import _fast_multiset_equal, rows_to_multiset


def _slow_equal(s_tbl: pa.Table, d_tbl: pa.Table) -> bool:
    s_cols = [c.lower() for c in s_tbl.column_names]
    d_cols = [c.lower() for c in d_tbl.column_names]
    s_rows = [tuple(r[c] for c in s_tbl.column_names) for r in s_tbl.to_pylist()]
    d_rows = [tuple(r[c] for c in d_tbl.column_names) for r in d_tbl.to_pylist()]
    return rows_to_multiset(s_cols, s_rows) == rows_to_multiset(d_cols, d_rows)


def _fast_equal(s_tbl: pa.Table, d_tbl: pa.Table):
    handled, ok, _ = _fast_multiset_equal(
        s_tbl, d_tbl, sorted(c.lower() for c in s_tbl.column_names)
    )
    return handled, ok


UTC = dt.timezone.utc

CASES = [
    # (name, spark-side rows, duck-side rows, schema)
    (
        "identical_flat",
        {"k": [1, 2, None], "v": [1.25, -0.5, None], "s": ["a", "b", None]},
        {"k": [2, 1, None], "v": [-0.5, 1.25, None], "s": ["b", "a", None]},
        None,
    ),
    (
        "float_noise_below_granularity",
        {"v": [0.1234567891234]},
        {"v": [0.1234567891999]},  # differs only past the 9th decimal
        None,
    ),
    (
        "float_mismatch_above_granularity",
        {"v": [0.123456789]},
        {"v": [0.123456790]},
        None,
    ),
    ("neg_zero_vs_zero", {"v": [-0.0]}, {"v": [0.0]}, None),
    ("nan_equals_nan", {"v": [float("nan")]}, {"v": [float("nan")]}, None),
    ("nan_vs_null", {"v": [float("nan")]}, {"v": [None]}, None),
    ("int_mismatch", {"k": [1, 2, 3]}, {"k": [1, 2, 4]}, None),
    (
        "multiset_cardinality",  # same value set, different multiplicity
        {"k": [1, 1, 2]},
        {"k": [1, 2, 2]},
        None,
    ),
]


@pytest.mark.parametrize("name,s_data,d_data,schema", CASES, ids=[c[0] for c in CASES])
def test_fast_path_agrees_with_slow_path(name, s_data, d_data, schema):
    s_tbl = pa.table(s_data, schema=schema)
    d_tbl = pa.table(d_data, schema=schema)
    slow = _slow_equal(s_tbl, d_tbl)
    handled, fast = _fast_equal(s_tbl, d_tbl)
    assert handled, "flat-typed table must be handled by the fast path"
    assert fast == slow, f"fast={fast} slow={slow} on case {name}"


def test_fast_path_timestamp_tz_normalization():
    """Spark's arrow timestamps are tz=UTC, DuckDB's are naive; with the
    session tz pinned UTC they name the same instant and must compare
    equal on both paths."""
    instants = [dt.datetime(2024, 5, 1, 12, 30, 15, 123456)]
    s_tbl = pa.table(
        {"ts": pa.array([i.replace(tzinfo=UTC) for i in instants], pa.timestamp("us", "UTC"))}
    )
    d_tbl = pa.table({"ts": pa.array(instants, pa.timestamp("us"))})
    assert _slow_equal(s_tbl, d_tbl)
    handled, fast = _fast_equal(s_tbl, d_tbl)
    assert handled and fast


def test_fast_path_declines_nested_types():
    t = pa.table({"v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    handled, _ok = _fast_equal(t, t)
    assert not handled  # nested types stay on the slow path


def test_fast_path_mismatch_reports_rows():
    s = pa.table({"k": list(range(10)), "v": [float(i) for i in range(10)]})
    d = pa.table({"k": list(range(10)), "v": [float(i) for i in range(9)] + [99.0]})
    handled, ok, msg = _fast_multiset_equal(s, d, ["k", "v"])
    assert handled and not ok
    assert "symmetric difference" in msg
