"""Replay-fixture writer shared by the streaming e2e queries.

Every streaming e2e replays a bounded corpus as ordered micro-batches
by materializing it into N parquet files with strictly increasing
pinned mtimes (the file source orders batches by modification time)
and reading them back with ``maxFilesPerTrigger=1``.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_replay_files(
    feed: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bucket_col: str = "file_no",
    prefix: str = "hc_replay_",
) -> str:
    """Materialize ``feed`` as at most one parquet file per
    ``bucket_col`` value, named in bucket order with strictly
    increasing pinned mtimes, and return the flat directory.

    ONE Spark job: hash-repartition on the bucket column into
    ``n_files`` partitions (every bucket's rows land in exactly one
    task, so dynamic partitionBy emits exactly one file per non-empty
    bucket) — replacing the former n_files sequential
    filter+coalesce(1) passes over the feed. Measured at sf0.1: the
    6-bucket events feed dropped ~9 s -> ~1.5 s, which used to
    dominate the cold cost of whichever stateful e2e ran first in a
    session. Buckets with no rows produce no file — the stream simply
    has one fewer micro-batch, which no consumer's equality contract
    depends on (state still crosses every remaining boundary).
    """
    landing = tempfile.mkdtemp(prefix=prefix)
    flat = tempfile.mkdtemp(prefix=prefix + "flat_")
    (
        feed.repartition(n_files, bucket_col)
        .select(*cols, bucket_col)
        .write.partitionBy(bucket_col)
        .mode("overwrite")
        .parquet(landing)
    )
    # numeric sort: lexicographic would put bucket 10 before bucket 2
    dirs = sorted(
        glob.glob(os.path.join(landing, f"{bucket_col}=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    i = 0
    for d in dirs:
        for p in sorted(glob.glob(os.path.join(d, "part-*.parquet"))):
            dst = os.path.join(flat, f"{i:02d}.parquet")
            shutil.copy(p, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
            i += 1
    shutil.rmtree(landing, ignore_errors=True)
    return flat
