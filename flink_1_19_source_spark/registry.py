"""Query registry — the SURVEY §2 coverage contract.

Every implemented operator registers a named query:

- ``fn(spark, sf_dir) -> DataFrame``  — the PySpark implementation
- ``oracle``                          — equivalent DuckDB SQL (or None for
                                        non-SQL-expressible ops; the driver
                                        then records a rows-only check)

Column names/aliases MUST match between the two sides (the driver sorts
columns by name before value-hashing).
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
    oracle: str | None
    survey_ids: tuple[str, ...]  # SURVEY.md §2 row ids this query covers
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, survey: str | tuple[str, ...] = (),
             tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation with its DuckDB oracle."""
    if isinstance(survey, str):
        survey = tuple(survey.split())

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(survey), tuple(tags))
        return fn

    return deco


def _ensure_loaded() -> None:
    # Importing the queries package populates REGISTRY via decorators.
    # (importlib, not `from . import queries`: the parent package re-exports
    # a *function* named `queries`, which would shadow the subpackage.)
    import importlib

    importlib.import_module(".queries", __package__)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
