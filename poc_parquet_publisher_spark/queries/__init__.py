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


# Driver-window rotation. The external correctness driver hash-checks only
# the FIRST 50 registry entries (49 declared + 1 extension slot); every
# oracle-backed extension is pytest-hash-verified on every run regardless
# (tests/test_queries_oracle.py parametrizes the whole registry). Rotating
# which 8 oracle-backed extensions lead the block gets each one a driver
# artifact row across successive rounds without ever letting a rows-only
# entry into the hashed window.
#   rounds 1-2: x01 x02 x24 x03 x05 x07 x09 x10 (driver-green in
#               CORRECTNESS_r01/r02)
#   round 3:    x11 (driver-green in CORRECTNESS_r03)
#   round 4:    x12 (driver-green in CORRECTNESS_r04)
#   round 5:    x13 (driver-green in CORRECTNESS_r05)
#   round 6:    x14 (driver-green in CORRECTNESS_r06)
#   round 7:    x18 (driver-green in CORRECTNESS_r07)
#   round 8:    x19 (driver-green in CORRECTNESS_r08)
#   round 9:    x104_pagerank (driver-green in CORRECTNESS_r09 -- the
#               round-8 verdict asked for a never-driver-checked
#               HEAVYWEIGHT rather than continuing down the x20..
#               sequence)
#   round 10:   x23_curate_pipeline (the round-9 verdict's pick: the
#               end-to-end composition entry -- scrub -> gates -> dedup
#               -> near-dup -> split -- whose oracle composes six
#               already-verified stage oracles)
#   round 11:   x102_source_overlap (the other heavyweight the round-9
#               verdict named; promoted per round-10 verdict task #2)
#   round 12:   x03_dedup_ngram_jaccard (promoted per round-11 verdict
#               task #2)
#   round 13:   x20_text_scrub (promoted per round-12 verdict task #8;
#               x03 retired after its r12 driver-green row)
#   next rounds: x21 x22 x25 x26
#   x27 x29 x30 x31 x33, then later oracle-backed additions (rows-only
#   entries stay out of the hashed window by design).
#   With the declared set at 49 (q38-q42 added round 3), only ONE
#   rotated name lands in the driver's 50-entry hashed window per
#   round; each round, move the newly driver-checked head to the
#   retired list above and promote the next entry.
_WINDOW_FIRST: list[str] = [
    "x20_text_scrub",
    "x21_sessionize",
    "x22_histogram",
    "x25_stratified_sample",
    "x26_boilerplate_ngrams",
]


def _apply_window_rotation() -> None:
    """Reorder REGISTRY: declared set, then _WINDOW_FIRST, then the other
    oracle-backed extensions, then rows-only (oracle=None) entries last."""
    declared = [n for n in REGISTRY if not n.startswith("x")]
    rotated = [n for n in _WINDOW_FIRST if n in REGISTRY]
    oracle_rest = [
        n
        for n, s in REGISTRY.items()
        if n.startswith("x") and s.oracle is not None and n not in rotated
    ]
    rows_only = [
        n for n, s in REGISTRY.items()
        if n.startswith("x") and s.oracle is None
    ]
    ordered = declared + rotated + oracle_rest + rows_only
    assert len(ordered) == len(REGISTRY)
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for n in ordered:
        REGISTRY[n] = snapshot[n]


def _ensure_loaded() -> None:
    # Import for registration side effects.
    from . import declared as _declared  # noqa: F401
    from . import extensions as _extensions  # noqa: F401

    _apply_window_rotation()


__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register",
    "all_queries",
    "all_oracles",
]
