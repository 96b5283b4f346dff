"""Data-layout utilities for the 100 TB lake: small-file compaction
and range-clustered writes.

The reference's S3 sink emits exactly one CSV object per 64-ledger
batch (python/adapters/s3_storage_adapter.py:216-221) — at production
rates that is millions of tiny objects, the classic small-file problem
that kills scan throughput (per-file open cost dominates) and driver
memory (file listing). These utilities restate the layout decisions a
lake needs:

- compact(): rewrite a directory into ~target-sized files. Uses a
  count + repartition rather than coalesce so the rewrite itself is
  parallel and the output sizes are even (coalesce merges without a
  shuffle but inherits input skew).
- write_range_layout(): repartitionByRange + sortWithinPartitions on
  the clustering key before writing, so every parquet file covers a
  narrow, non-overlapping key range. Parquet min/max footer stats then
  prune whole files for range predicates — the poor man's Z-order,
  native to Spark.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite `in_path` (parquet) into even files of ~target rows at
    `out_path`. Returns the number of output files chosen.

    One count + one shuffle; the shuffle is what buys even output
    sizes regardless of input skew. At 100 TB, run per partition
    (e.g. per ledger-day) so each compaction unit is bounded.
    """
    df = spark.read.parquet(in_path)
    n_files = max(1, math.ceil(df.count() / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_range_layout(
    df: DataFrame,
    out_path: str,
    range_cols: list[str],
    n_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write `df` clustered by `range_cols`: each output file covers a
    contiguous, (nearly) non-overlapping range of the clustering key,
    so footer min/max stats prune files for range/point predicates.

    repartitionByRange samples the key distribution, so the files are
    even under skew; sortWithinPartitions keeps row groups internally
    ordered for page-level pruning.
    """
    writer = (
        df.repartitionByRange(n_files, *range_cols)
        .sortWithinPartitions(*range_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)
