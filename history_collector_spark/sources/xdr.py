"""XDR-shaped archive source — S1/S3/S4 of SURVEY.md §2.1.

The reference downloads `{type}-<8-hex-seq>.xdr.gz` file triplets from
an S3 archive and parses them with an external XDR codec
(python/main.py:76-105,257-266). Spark-side equivalent:

- file discovery: `spark.read.format("binaryFile")` over a path glob —
  executors fetch files in parallel (vs the reference's one-at-a-time
  driver download);
- decode: an Arrow-batched ``mapInPandas`` UDF turning each compressed
  blob into nested tx-entry rows. Two payload codecs behind one seam:
  the REAL RFC 4506 binary codec (xdr_codec.py — record-marked
  LedgerHeaderHistoryEntry / TransactionHistoryEntry /
  TransactionHistoryResultEntry streams, with per-tx
  sha256(network_id || ENVELOPE_TYPE_TX || tx_bytes) hashes matching
  python/main.py:263-266), plus the legacy gzip+JSON stand-in for
  fixtures. The codec is auto-detected per blob: JSON payloads start
  with '{' after gunzip, XDR record marks start with a high bit;
- sequencing: the monotone 64-ledger file sequence and its validity
  rule (python/main.py:205-228, python/build_database.py:24-27), plus
  the gapless "stall, don't skip" check (python/main.py:88-105) as a
  plan-level assertion usable from batch or foreachBatch.
"""

from __future__ import annotations

import gzip
import json
import os
import re
from collections.abc import Iterator

from history_collector_spark.sources import xdr_codec

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
    """Test/demo helper: write one gzip archive file in the JSON fixture
    codec (same nesting as the XDR decode output, different bytes)."""
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"transactions-{file_seq}.xdr.gz")
    with gzip.open(fname, "wt") as f:
        json.dump({"file_seq": file_seq, "entries": entries}, f)
    return fname


def write_xdr_archive_file(
    path: str, kind: str, file_seq: str, records: list[bytes]
) -> str:
    """Write one REAL binary archive file: gzip over a record-marked XDR
    stream (records come from xdr_codec.build_*_entry). `kind` is
    'transactions' | 'ledger' | 'results' — the reference's triplet
    naming (python/main.py:257-260)."""
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"{kind}-{file_seq}.xdr.gz")
    with gzip.open(fname, "wb") as f:
        for rec in records:
            f.write(rec)
    return fname


# The passphrase is deployment config (reference env NETWORK_PASSPHRASE,
# python/main.py:35); the public Stellar testnet phrase is the default.
DEFAULT_NETWORK_PASSPHRASE = "Test SDF Network ; September 2015"

_FILE_SEQ_RE = re.compile(r"-([0-9a-f]{8})\.xdr\.gz$")


def _op_to_row(op: dict) -> dict:
    """xdr_codec operation dict -> flat OPERATION_TYPE row."""
    body = op["body"]
    if body["type"] == xdr_codec.OP_PAYMENT:
        p = body["paymentOp"]
        a = p["asset"]
        named = a["alphaNum4"] or a["alphaNum12"]
        asset = (
            {
                "assetCode": named["assetCode"],
                "issuer": named["issuer"]["ed25519"],
            }
            if named
            else None
        )
        dest, amount, balance = p["destination"]["ed25519"], p["amount"], None
    else:
        c = body["createAccountOp"]
        dest, amount, balance = (
            c["destination"]["ed25519"],
            None,
            c["startingBalance"],
        )
        asset = None
    return {
        "type": body["type"],
        "destination": dest,
        "amount": amount,
        "starting_balance": balance,
        "asset": asset,
        "sourceAccount": [s["ed25519"] for s in op["sourceAccount"]],
    }


def _parse_payload(
    raw: bytes,
    file_seq: str | None = None,
    network_passphrase: str = DEFAULT_NETWORK_PASSPHRASE,
) -> list[dict]:
    """Decode one archive blob into ENTRY_SCHEMA rows.

    Codec auto-detect after gunzip: a JSON fixture payload begins with
    '{' (0x7b); a record-marked XDR stream begins with a mark byte whose
    high bit is set (>= 0x80), so the two can never collide. The XDR
    path is the real thing (python/main.py:263-266 semantics, incl.
    with_hash tx hashing); JSON remains for hand-written fixtures."""
    payload = gzip.decompress(raw)
    if payload[:1] == b"{":
        doc = json.loads(payload.decode("utf-8"))
        return [
            {
                "file_seq": doc["file_seq"],
                "ledger_seq": e["ledger_seq"],
                "txs": e.get("txs", []),
            }
            for e in doc["entries"]
        ]
    entries = xdr_codec.parse_transactions(
        payload, with_hash=True, network_passphrase=network_passphrase
    )
    out = []
    for e in entries:
        txs = [
            {
                "hash": env["hash"],
                "fee": env["tx"]["fee"],
                "memo": env["tx"]["memo"]["text"],
                "source": env["tx"]["sourceAccount"]["ed25519"],
                "operations": [_op_to_row(op) for op in env["tx"]["operations"]],
            }
            for env in e["txSet"]["txs"]
        ]
        out.append(
            {"file_seq": file_seq, "ledger_seq": e["ledgerSeq"], "txs": txs}
        )
    return out


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[dict] = []
        for path, raw in zip(pdf["path"], pdf["content"]):
            m = _FILE_SEQ_RE.search(str(path))
            rows.extend(
                _parse_payload(bytes(raw), file_seq=m.group(1) if m else None)
            )
        yield pd.DataFrame(
            rows, columns=["file_seq", "ledger_seq", "txs"]
        ) if rows else pd.DataFrame(
            {"file_seq": [], "ledger_seq": [], "txs": []}
        )


def read_archive(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan + distributed decode -> nested entry rows."""
    files = (
        spark.read.format("binaryFile").load(path_glob).select("path", "content")
    )
    return files.mapInPandas(_decode_batches, schema=ENTRY_SCHEMA)


# ---------------------------------------------------------------------------
# Ledger + results archive readers — the other two files of the triplet
# (python/main.py:257-266). Same binaryFile + mapInPandas shape; each
# yields the flat columns the reference's dictionary-builders extract.
# ---------------------------------------------------------------------------

LEDGER_SCHEMA = StructType(
    [
        StructField("file_seq", StringType()),
        StructField("ledger_seq", LongType()),
        StructField("close_time", LongType()),
    ]
)

OP_RESULT_TYPE = StructType(
    [
        StructField("op_index", IntegerType()),
        StructField("op_type", IntegerType()),
        StructField("code", IntegerType()),
    ]
)

RESULT_SCHEMA = StructType(
    [
        StructField("file_seq", StringType()),
        StructField("ledger_seq", LongType()),
        StructField("tx_hash", StringType()),
        StructField("fee_charged", LongType()),
        StructField("tx_status", StringType()),
        StructField("op_results", ArrayType(OP_RESULT_TYPE)),
    ]
)


def _decode_ledger_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, raw in zip(pdf["path"], pdf["content"]):
            m = _FILE_SEQ_RE.search(str(path))
            fs = m.group(1) if m else None
            for led in xdr_codec.parse_ledgers(gzip.decompress(bytes(raw))):
                rows.append(
                    {
                        "file_seq": fs,
                        "ledger_seq": led["header"]["ledgerSeq"],
                        "close_time": led["header"]["scpValue"]["closeTime"],
                    }
                )
        yield pd.DataFrame(
            rows, columns=["file_seq", "ledger_seq", "close_time"]
        )


def _decode_result_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, raw in zip(pdf["path"], pdf["content"]):
            m = _FILE_SEQ_RE.search(str(path))
            fs = m.group(1) if m else None
            for ent in xdr_codec.parse_results(gzip.decompress(bytes(raw))):
                for pair in ent["txResultSet"]["results"]:
                    res = pair["result"]
                    ops = [
                        {
                            "op_index": i,
                            "op_type": (o["tr"] or {}).get("type", -1),
                            "code": (
                                (o["tr"] or {}).get("createAccountResult")
                                or (o["tr"] or {}).get("paymentResult")
                                or {"code": o["code"]}
                            )["code"],
                        }
                        for i, o in enumerate(res["result"]["results"])
                    ]
                    rows.append(
                        {
                            "file_seq": fs,
                            "ledger_seq": ent["ledgerSeq"],
                            "tx_hash": pair["transactionHash"],
                            "fee_charged": res["feeCharged"],
                            "tx_status": str(res["result"]["code"]),
                            "op_results": ops,
                        }
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "file_seq", "ledger_seq", "tx_hash",
                "fee_charged", "tx_status", "op_results",
            ],
        )


def read_ledger_archive(spark: SparkSession, path_glob: str) -> DataFrame:
    """ledger-*.xdr.gz -> (file_seq, ledger_seq, close_time) — the
    distributed twin of get_ledgers_dictionary (python/main.py:107-110)."""
    files = (
        spark.read.format("binaryFile").load(path_glob).select("path", "content")
    )
    return files.mapInPandas(_decode_ledger_batches, schema=LEDGER_SCHEMA)


def read_results_archive(spark: SparkSession, path_glob: str) -> DataFrame:
    """results-*.xdr.gz -> one row per tx result — the distributed twin
    of get_result_dictionary (python/main.py:113-122)."""
    files = (
        spark.read.format("binaryFile").load(path_glob).select("path", "content")
    )
    return files.mapInPandas(_decode_result_batches, schema=RESULT_SCHEMA)


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
