"""Query + oracle registry.

Every operator from SURVEY.md §2 (and the scale-out extensions) registers
one named Spark query plus, when SQL-expressible, a DuckDB oracle twin.
The driver contract (__spark_entry__.py) reads QUERIES/ORACLES from here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL.

    Column names must match exactly between the Spark result and the oracle
    (the driver sorts columns by name before hashing values) — alias every
    computed column identically on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every query-bearing module exactly once."""
    global _LOADED
    if _LOADED:
        return
    # imports are side-effecting (decorators populate QUERIES/ORACLES)
    from history_collector_spark.queries import (  # noqa: F401
        aggregates,
        asof,
        dedup,
        explode,
        joins,
        multimodal,
        pipeline_parity,
        relational,
        scalar,
        similarity,
        text,
        windows,
    )

    _LOADED = True
