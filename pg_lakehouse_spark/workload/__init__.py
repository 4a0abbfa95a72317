"""The oracle-checked query workload (driver contract).

Every operator claimed in SURVEY.md §2 gets a named query here with
(a) a Spark DataFrame implementation and, where ANSI-SQL-expressible,
(b) an equivalent DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports this registry.

Float discipline: the driver hash-compares values, and double
aggregation order differs between Spark and DuckDB, so every floating
aggregate is rounded (2-6 decimals) identically on both sides.
Column-name discipline: every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the suite."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every workload module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from pg_lakehouse_spark.workload import (  # noqa: F401
        core,
        functions_q,
        lake_q,
        llm_q,
        streaming_q,
        tpch_more,
        udf_q,
        windows_q,
    )

    _LOADED = True
