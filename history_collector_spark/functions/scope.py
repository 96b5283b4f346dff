"""Scoped session-conf helpers."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Temporarily set spark.sql.shuffle.partitions to `n`.

    Used wherever a bounded sub-computation (an iterative loop over a
    subgraph, a stream over a bounded fixture) should not inherit the
    corpus-sized session default: partition count is a per-stage sizing
    decision, and Spark only exposes it as session state."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)
