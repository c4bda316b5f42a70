"""Query registry backing __spark_entry__.queries() / oracle_sql().

Contract (driver, __spark_entry__.py:22-37):
- ``queries()[name](spark, sf_dir) -> DataFrame``
- ``oracle_sql()[name]`` = equivalent DuckDB SQL over pre-registered
  views, or absent for non-SQL-expressible ops (rows-only check).
- Column names AND value representation must match the oracle: alias
  every computed column identically on both sides, and round floating
  aggregates identically on both sides (SURVEY.md §5.2, §7.3 — hash
  matching on doubles is the biggest silent-failure risk).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
