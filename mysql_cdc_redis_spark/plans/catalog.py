"""Query catalog — the single registry behind __spark_entry__.py.

Every operator from SURVEY.md §2 lands here as a named query: a PySpark
builder ``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle string over the same parquet views.  The driver — and our
own tests/conftest.py harness — runs both sides and compares row count,
schema and an order-insensitive value hash.

Conventions that keep the hash comparison honest:
* alias every computed column identically in the Spark plan and the SQL;
* round floating-point aggregates on BOTH sides (shuffle-order float
  addition differs from DuckDB's sequential scan in the last ulp);
* pin any "now" to a literal so reruns are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def _load_all_modules() -> None:
    # Import side-effect registers every query; keep imports lazy so a
    # syntax error in one module doesn't hide the rest during development.
    from . import (  # noqa: F401
        advanced,
        cdc,
        llm,
        mlops,
        relational,
        sciops,
        stats2,
        streaming_queries,
        tooling,
        tpch,
    )


def all_queries() -> dict[str, Query]:
    _load_all_modules()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return all_queries()[name]
