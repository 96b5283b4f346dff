"""JDBC dual-table sink — S5 of SURVEY.md §2.1, with the reference's
commit-visibility semantics.

The reference writes payments + creations + the `lastfile` checkpoint
in ONE Postgres transaction (python/adapters/hc_storage_adapter.py:
47-59, python/adapters/postgres_storage_adapter.py:48-51). Spark's JDBC
writer commits per-partition, so cross-table atomicity cannot come from
the writer itself. This sink keeps exactly-once the same way the
parquet sink does (sinks/exactly_once.py): every row carries its
epoch_id, data lands first, the checkpoint row moves last, and READERS
only trust rows whose epoch_id <= the committed checkpoint — the
completion-marker design (python/adapters/s3_storage_adapter.py:64-78)
expressed as a visibility predicate instead of a filesystem marker.

No JDBC driver ships in this environment, so the network write is a
thin, untested-at-runtime wrapper; the replay guard and the visibility
predicate — the actual semantics — are pure DataFrame logic and are
unit-tested (tests/test_sinks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def committed_view(rows: DataFrame, committed_epoch: int | None) -> DataFrame:
    """Reader-side visibility: only rows from fully-committed epochs.

    `rows` must carry the epoch_id column the sink stamps; an
    uncommitted (crashed mid-write) epoch is invisible, so at-least-once
    appends still present exactly-once results."""
    if committed_epoch is None:
        return rows.limit(0)
    return rows.filter(F.col("epoch_id") <= committed_epoch)


class JdbcDualSink:
    """foreachBatch body writing payments/creations/lastfile over JDBC.

    mirrors ExactlyOnceDualSink: skip replayed epochs, stamp epoch_id,
    data before checkpoint."""

    def __init__(
        self,
        url: str,
        properties: dict | None = None,
        payments_table: str = "payments",
        creations_table: str = "creations",
        lastfile_table: str = "lastfile",
    ):
        self.url = url
        self.properties = properties or {}
        self.payments_table = payments_table
        self.creations_table = creations_table
        self.lastfile_table = lastfile_table

    def last_committed(self, spark) -> int | None:
        df = spark.read.jdbc(
            self.url, self.lastfile_table, properties=self.properties
        )
        row = df.select(F.max("epoch_id").alias("e")).collect()[0]
        return row["e"]

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = self.last_committed(spark)
        if committed is not None and epoch_id <= committed:
            return  # replayed epoch — already visible to readers

        tagged = batch_df.withColumn("epoch_id", F.lit(epoch_id))
        for kind, tbl in (
            ("payment", self.payments_table),
            ("creation", self.creations_table),
        ):
            rows = tagged.filter(F.col("type") == kind).drop("type")
            if rows.isEmpty():
                continue  # empty batches still advance the checkpoint
            rows.write.jdbc(
                self.url, tbl, mode="append", properties=self.properties
            )

        # checkpoint LAST: a crash above leaves invisible rows, never a
        # committed-but-missing epoch (batchsize etc. ride properties)
        spark.createDataFrame([(epoch_id,)], "epoch_id bigint").write.jdbc(
            self.url, self.lastfile_table, mode="append", properties=self.properties
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.write_batch(batch_df, epoch_id)
