"""Query-local persist registry.

Several queries pin (persist) a multiply-consumed intermediate frame so
its expensive subtree (shingle explodes, Arrow kernels, self-join feeds)
executes once per materialization instead of once per consumer. Those
pins are QUERY-LOCAL: unlike the session-memoized index/pair tables
(``dedup.refresh_pair_tables``, ``catalog.refresh_tables``), nothing
outside the one returned plan ever reads them, so leaving them persisted
for the whole session both accumulates cache memory across a 300+-query
run and lets repeat materializations of the same query read a warm cache
instead of recomputing.

``pin_local`` persists a frame and records it here; the registry's query
wrapper calls ``evict_local_pins`` at every TOP-LEVEL query invocation,
so at most one query's local pins are ever live and a re-invocation of
the same query recomputes from the parquet inputs (no cross-run result
caching). Unpersisting a lazy frame that a still-unmaterialized plan
references is safe — Spark just recomputes the subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_DEPTH = 0


def pin_local(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for eviction at
    the next top-level query invocation."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(df)
    return df


def evict_local_pins() -> None:
    """Unpersist every live query-local pin (the eviction hook)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def enter_query() -> None:
    """Called by the registry wrapper on query entry: a TOP-LEVEL entry
    (depth 0 -> 1) evicts the previous query's local pins; nested calls
    (a registered query reusing another's builder) leave them alone."""
    global _DEPTH
    if _DEPTH == 0:
        evict_local_pins()
    _DEPTH += 1


def leave_query() -> None:
    global _DEPTH
    _DEPTH = max(0, _DEPTH - 1)
