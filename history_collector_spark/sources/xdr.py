"""XDR-shaped archive source — S1/S3/S4 of SURVEY.md §2.1.

The reference downloads `{type}-<8-hex-seq>.xdr.gz` file triplets from
an S3 archive and parses them with an external XDR codec
(python/main.py:76-105,257-266). Spark-side equivalent:

- file discovery: `spark.read.format("binaryFile")` over a path glob —
  executors fetch files in parallel (vs the reference's one-at-a-time
  driver download);
- decode: an Arrow-batched ``mapInPandas`` UDF turning each compressed
  blob into nested tx-entry rows. The REAL XDR codec is a pluggable
  stand-in point — this environment ships none, so the stub codec is
  gzip+JSON with the same nested shape (clearly marked; swap
  `_parse_payload` for an xdrparser call in production);
- sequencing: the monotone 64-ledger file sequence and its validity
  rule (python/main.py:205-228, python/build_database.py:24-27), plus
  the gapless "stall, don't skip" check (python/main.py:88-105) as a
  plan-level assertion usable from batch or foreachBatch.
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LEDGERS_PER_FILE = 64

# Nested transaction-entry schema (SURVEY §1.1): unions are structs of
# nullable arms, optionals are arrays probed with try_element_at.
OPERATION_TYPE = StructType(
    [
        StructField("type", IntegerType()),  # 0=create, 1=payment
        StructField("destination", StringType()),
        StructField("amount", LongType()),
        StructField("starting_balance", LongType()),
        StructField(
            "asset",
            StructType(
                [
                    StructField("assetCode", StringType()),
                    StructField("issuer", StringType()),
                ]
            ),
        ),
        StructField("sourceAccount", ArrayType(StringType())),
    ]
)

TX_TYPE = StructType(
    [
        StructField("hash", StringType()),
        StructField("fee", IntegerType()),
        StructField("memo", StringType()),
        StructField("source", StringType()),
        StructField("operations", ArrayType(OPERATION_TYPE)),
    ]
)

ENTRY_SCHEMA = StructType(
    [
        StructField("file_seq", StringType()),
        StructField("ledger_seq", LongType()),
        StructField("txs", ArrayType(TX_TYPE)),
    ]
)


def file_sequence_start(first: str = "0000003f") -> int:
    return int(first, 16)


def next_file_seq(seq: str) -> str:
    """hex(int(seq,16)+64) zero-padded to 8 (python/main.py:205-228)."""
    return format(int(seq, 16) + LEDGERS_PER_FILE, "08x")


def is_valid_file_seq(seq: str) -> bool:
    """(seq+1) % 64 == 0 (python/build_database.py:24-27)."""
    return (int(seq, 16) + 1) % LEDGERS_PER_FILE == 0


def write_archive_file(path: str, file_seq: str, entries: list[dict]) -> str:
    """Test/demo helper: write one gzip archive file in the STUB codec
    (JSON standing in for XDR — same nesting, different bytes)."""
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"transactions-{file_seq}.xdr.gz")
    with gzip.open(fname, "wt") as f:
        json.dump({"file_seq": file_seq, "entries": entries}, f)
    return fname


def _parse_payload(raw: bytes) -> list[dict]:
    """STUB codec: gzip+JSON. A real deployment replaces this body with
    the XDR parse (python/main.py:263-266: parser.parse(file,
    with_hash=..., network_id=...)) — signature and output shape stay."""
    doc = json.loads(gzip.decompress(raw).decode("utf-8"))
    return [
        {
            "file_seq": doc["file_seq"],
            "ledger_seq": e["ledger_seq"],
            "txs": e.get("txs", []),
        }
        for e in doc["entries"]
    ]


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[dict] = []
        for raw in pdf["content"]:
            rows.extend(_parse_payload(bytes(raw)))
        yield pd.DataFrame(
            rows, columns=["file_seq", "ledger_seq", "txs"]
        ) if rows else pd.DataFrame(
            {"file_seq": [], "ledger_seq": [], "txs": []}
        )


def read_archive(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan + distributed decode -> nested entry rows."""
    files = spark.read.format("binaryFile").load(path_glob).select("content")
    return files.mapInPandas(_decode_batches, schema=ENTRY_SCHEMA)


def assert_gapless(df: DataFrame, start_seq: str) -> None:
    """Stall-don't-skip (python/main.py:88-105): every 64-ledger file
    from `start_seq` to max(file_seq) must be present exactly once.
    Raises on the first gap — the caller stalls instead of skipping.
    Distributed check: one small agg, no collect of data rows."""
    seqs = (
        df.select(F.conv("file_seq", 16, 10).cast("long").alias("s"))
        .distinct()
        .agg(
            F.count("*").alias("n"),
            F.min("s").alias("lo"),
            F.max("s").alias("hi"),
        )
        .collect()[0]
    )
    lo = file_sequence_start(start_seq)
    if seqs["n"] == 0:
        return
    if seqs["lo"] != lo:
        raise RuntimeError(f"archive gap: first file {seqs['lo']:08x} != {lo:08x}")
    expected = (seqs["hi"] - lo) // LEDGERS_PER_FILE + 1
    if seqs["n"] != expected:
        raise RuntimeError(
            f"archive gap: {seqs['n']} files present, {expected} expected "
            f"in [{lo:08x}, {seqs['hi']:08x}] — stalling, not skipping"
        )


def wait_for_file(
    path: str,
    max_retries: int = 5,
    sleep_seconds: float = 180.0,
    sleep_fn=None,
    exists_fn=None,
) -> bool:
    """S4: retry-with-backoff availability check (python/main.py:88-105).

    "File not yet published" is tail-of-stream, not an error: poll up to
    `max_retries` times with the reference's 180 s cadence, then give
    up (the caller stalls/alerts — never skips ahead). `sleep_fn` /
    `exists_fn` are injectable for tests and for S3-style existence
    probes."""
    import time as _time

    sleep_fn = sleep_fn or _time.sleep
    exists_fn = exists_fn or os.path.exists
    for attempt in range(max_retries + 1):
        if exists_fn(path):
            return True
        if attempt < max_retries:
            sleep_fn(sleep_seconds)
    return False
