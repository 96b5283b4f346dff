"""Streaming runtime sizing helpers."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

from history_collector_spark.functions.scope import scoped_shuffle_partitions

# State-store parallelism for the driver-gated e2e streams. A stateful
# streaming query fixes its number of state partitions at FIRST start
# (it is baked into the checkpoint), and every micro-batch then runs
# that many state tasks per stateful operator — so an oversized value
# multiplies fixed per-task overhead across every trigger while an
# undersized one caps the stream's aggregate throughput. The e2e
# queries here replay bounded fixtures (thousands of rows across <=6
# micro-batches), where a handful of partitions is the right size; a
# production 100 TB ingest would start its (long-lived, checkpointed)
# query once with partitions sized to peak state volume instead —
# this knob scopes the choice per query instead of inheriting whatever
# batch-oriented session default is active.
STREAM_STATE_PARTITIONS = 8


@contextmanager
def scoped_state_partitions(
    spark: SparkSession, n: int = STREAM_STATE_PARTITIONS
) -> Iterator[None]:
    """Temporarily set spark.sql.shuffle.partitions around a streaming
    query's start+drain so its state stores are sized for the stream,
    then restore the session's batch setting."""
    with scoped_shuffle_partitions(spark, n):
        yield


def python_state_partitions(spark: SparkSession) -> int:
    """State-partition count for PYTHON stateful operators
    (applyInPandasWithState). Unlike JVM state stores — where extra
    partitions only multiply per-task init cost — every Python state
    partition is a concurrent Arrow round-trip through a worker
    process, so the binding constraint is Python-side parallelism,
    not store count. Measured on the near-dup bucket tracker at
    sf0.1/local[32] (queries/neardup_stream.py): 4 partitions 11.8 s,
    8 partitions 7.4 s, 32 partitions 4.9 s. Sizing to
    defaultParallelism saturates the executor cores on any cluster
    shape; JVM-stateful streams keep the small default above."""
    return spark.sparkContext.defaultParallelism
