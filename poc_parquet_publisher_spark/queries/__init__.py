"""Query registry: the DECLARED QUERY SET (SURVEY.md section 2.2) plus
LLM-pipeline extension queries (SURVEY.md section 2.4).

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (``None`` for ops that are not
SQL-expressible; the driver then records a weaker rows-only check).

Determinism contract (SURVEY.md section 5.3): every floating aggregate is
computed in DECIMAL (exact, partition-order independent -- essential because
Spark's shuffle order is nondeterministic) then cast to DOUBLE and rounded
to 4 decimals in BOTH engines; every LIMIT/OFFSET sits under a total ORDER
BY; all column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a Spark query builder under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


def _ensure_loaded() -> None:
    # Import for registration side effects.
    from . import declared as _declared  # noqa: F401
    from . import extensions as _extensions  # noqa: F401


__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register",
    "all_queries",
    "all_oracles",
]
