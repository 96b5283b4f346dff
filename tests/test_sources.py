"""Archive source tests — file sequencing, stub-codec decode, gapless
stall semantics (reference: python/main.py:76-105,205-228,
python/build_database.py:24-27)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.sources.xdr import (
    assert_gapless,
    is_valid_file_seq,
    next_file_seq,
    read_archive,
    write_archive_file,
)


def _entries(ledger_seq: int) -> list[dict]:
    return [
        {
            "ledger_seq": ledger_seq + i,
            "txs": [
                {
                    "hash": f"h{ledger_seq + i}",
                    "fee": 100,
                    "memo": "1-abcd-42",
                    "source": "S1",
                    "operations": [
                        {
                            "type": 1,
                            "destination": "D1",
                            "amount": 5,
                            "starting_balance": None,
                            "asset": {"assetCode": "KIN", "issuer": "ISS0"},
                            "sourceAccount": [],
                        }
                    ],
                }
            ],
        }
        for i in range(2)
    ]


def test_file_sequence_rules():
    assert next_file_seq("0000003f") == "0000007f"
    assert next_file_seq("0000007f") == "000000bf"
    assert is_valid_file_seq("0000003f")
    assert not is_valid_file_seq("00000040")


def test_read_archive_decodes_nested(spark, tmp_path):
    d = str(tmp_path / "archive")
    for seq in ("0000003f", "0000007f", "000000bf"):
        write_archive_file(d, seq, _entries(int(seq, 16) - 1))
    df = read_archive(spark, d)
    rows = df.collect()
    assert len(rows) == 6  # 3 files x 2 entries
    assert {r["file_seq"] for r in rows} == {"0000003f", "0000007f", "000000bf"}
    op = rows[0]["txs"][0]["operations"][0]
    assert op["type"] == 1 and op["asset"]["assetCode"] == "KIN"


def test_gapless_passes_and_stalls(spark, tmp_path):
    d = str(tmp_path / "archive")
    write_archive_file(d, "0000003f", _entries(62))
    write_archive_file(d, "0000007f", _entries(126))
    assert_gapless(read_archive(spark, d), "0000003f")  # contiguous: ok

    d2 = str(tmp_path / "gappy")
    write_archive_file(d2, "0000003f", _entries(62))
    write_archive_file(d2, "000000bf", _entries(190))  # 0000007f missing
    with pytest.raises(RuntimeError, match="stalling, not skipping"):
        assert_gapless(read_archive(spark, d2), "0000003f")


def test_wait_for_file_polls_then_gives_up(tmp_path):
    from history_collector_spark.sources.xdr import wait_for_file

    target = str(tmp_path / "transactions-000000ff.xdr.gz")
    sleeps = []

    # appears after 2 polls
    state = {"n": 0}

    def fake_exists(_p):
        state["n"] += 1
        return state["n"] > 2

    assert wait_for_file(
        target, max_retries=5, sleep_seconds=180, sleep_fn=sleeps.append,
        exists_fn=fake_exists,
    )
    assert sleeps == [180, 180]  # two sleeps, then found

    # never appears: retries exhausted, no skip
    sleeps2 = []
    assert not wait_for_file(
        target, max_retries=3, sleep_seconds=180, sleep_fn=sleeps2.append,
        exists_fn=lambda p: False,
    )
    assert sleeps2 == [180, 180, 180]
