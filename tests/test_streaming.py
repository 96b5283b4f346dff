"""Streaming ingest tests — §2.7: backfill with AvailableNow,
checkpoint resume after restart (python/main.py:246-249 semantics),
watermarked dedup."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from history_collector_spark.sinks.exactly_once import ExactlyOnceDualSink
from history_collector_spark.sources.xdr import write_archive_file
from history_collector_spark.streaming.ingest import (
    start_ingest,
    watermarked_event_dedup,
)


def _entries(base: int, n_txs: int = 2) -> list[dict]:
    return [
        {
            "ledger_seq": base,
            "txs": [
                {
                    "hash": f"h{base}-{i}",
                    "fee": 10,
                    "memo": "1-abcd-1",
                    "source": "S",
                    "operations": [
                        {
                            "type": i % 2,
                            "destination": "D",
                            "amount": 5,
                            "starting_balance": 7,
                            "asset": {"assetCode": "KIN", "issuer": "ISS0"},
                            "sourceAccount": [],
                        }
                    ],
                }
                for i in range(n_txs)
            ],
        }
    ]


def _flatten(entries):
    txs = entries.select("ledger_seq", F.explode("txs").alias("tx"))
    ops = txs.select(
        "ledger_seq",
        F.col("tx.hash").alias("hash"),
        F.explode("tx.operations").alias("op"),
    )
    return ops.select(
        F.when(F.col("op.type") == 1, "payment").otherwise("creation").alias("type"),
        "ledger_seq",
        "hash",
        F.col("op.destination").alias("destination"),
        F.col("op.amount").alias("amount"),
    )


def test_ingest_backfill_and_resume(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    sink = ExactlyOnceDualSink(out)

    write_archive_file(landing, "0000003f", _entries(63))
    write_archive_file(landing, "0000007f", _entries(127))

    q = start_ingest(spark, landing, ckpt, sink, transform=_flatten)
    q.awaitTermination(120)
    assert sink.last_committed() is not None
    total1 = spark.read.parquet(sink.payments_dir).count() + spark.read.parquet(
        sink.creations_dir
    ).count()
    assert total1 == 4  # 2 files x 2 txs x 1 op

    # restart with a new file: only the new file is processed
    write_archive_file(landing, "000000bf", _entries(191))
    q2 = start_ingest(spark, landing, ckpt, sink, transform=_flatten)
    q2.awaitTermination(120)
    total2 = spark.read.parquet(sink.payments_dir).count() + spark.read.parquet(
        sink.creations_dir
    ).count()
    assert total2 == 6  # +2, no reprocessing of old files


def test_watermarked_dedup(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "a"),
            ("2024-01-01 00:00:10", "a"),  # dup within watermark
            ("2024-01-01 00:05:00", "b"),
        ],
        "ts_s string, tx_hash string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "tx_hash").write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, tx_hash string").parquet(src)
    deduped = watermarked_event_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["tx_hash"] for r in spark.sql("SELECT * FROM dedup_sink").collect()}
    assert got == {"a", "b"}
    assert spark.sql("SELECT count(*) n FROM dedup_sink").collect()[0]["n"] == 2
