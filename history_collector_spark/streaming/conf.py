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
