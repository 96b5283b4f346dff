"""Round-trip tests for the real RFC 4506 XDR codec: hand-built binary
archive triplets (writer side) decoded through the parsers and through
the Spark read paths, with the per-tx hash law checked independently
(sha256(network_id || uint32(ENVELOPE_TYPE_TX) || tx_bytes) — the
xdrparser with_hash semantics of python/main.py:263-266).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from history_collector_spark.sources import xdr_codec as xc
from history_collector_spark.sources.xdr import (
    DEFAULT_NETWORK_PASSPHRASE,
    read_archive,
    read_ledger_archive,
    read_results_archive,
    write_xdr_archive_file,
)

SRC = bytes(range(32))
DST = bytes(range(32, 64))
ISSUER = bytes(range(64, 96))
OPSRC = bytes(range(96, 128))


def _fixture_tx_bytes():
    """One tx: KIN payment (op-level source override) + create-account."""
    ops = [
        xc.build_operation(
            xc.OP_PAYMENT, DST, 1500, asset_code="KIN",
            asset_issuer=ISSUER, source=OPSRC,
        ),
        xc.build_operation(xc.OP_CREATE_ACCOUNT, DST, 10_000),
    ]
    return xc.build_transaction(
        SRC, fee=200, seq_num=42, memo_text="1-anon-test", operations=ops
    )


def test_primitives_round_trip():
    w = xc.XdrWriter()
    w.uint32(7).int32(-3).uint64(2**40).int64(-(2**40)).bool(True)
    w.opaque_fixed(b"abc")  # padded to 4
    w.opaque_var(b"hello")  # 4-byte len + 5 bytes + 3 pad
    w.string("héllo")
    r = xc.XdrReader(w.getvalue())
    assert r.uint32() == 7
    assert r.int32() == -3
    assert r.uint64() == 2**40
    assert r.int64() == -(2**40)
    assert r.bool() is True
    assert r.opaque_fixed(3) == b"abc"
    assert r.opaque_var() == b"hello"
    assert r.string() == "héllo"
    assert r.done()


def test_record_marking_multi_fragment():
    body = b"x" * 10
    # split into two fragments: first without the last-bit, second with
    two_frag = (
        struct.pack(">I", 4) + body[:4]
        + struct.pack(">I", 0x80000000 | 6) + body[4:]
    )
    assert list(xc.iter_records(two_frag)) == [body]
    assert list(xc.iter_records(xc.frame_record(body))) == [body]


def test_transaction_entry_decodes_and_hash_matches():
    tx_bytes = _fixture_tx_bytes()
    rec = xc.build_transaction_entry(640, [xc.build_envelope(tx_bytes)])
    entries = xc.parse_transactions(
        b"" + rec, with_hash=True,
        network_passphrase=DEFAULT_NETWORK_PASSPHRASE,
    )
    assert len(entries) == 1
    e = entries[0]
    assert e["ledgerSeq"] == 640
    env = e["txSet"]["txs"][0]
    # the hash law, computed independently of the codec
    expected = hashlib.sha256(
        hashlib.sha256(DEFAULT_NETWORK_PASSPHRASE.encode()).digest()
        + struct.pack(">I", xc.ENVELOPE_TYPE_TX)
        + tx_bytes
    ).hexdigest()
    assert env["hash"] == expected
    tx = env["tx"]
    assert tx["sourceAccount"]["ed25519"] == SRC.hex()
    assert tx["fee"] == 200
    assert tx["memo"]["text"] == "1-anon-test"
    pay, create = tx["operations"]
    assert pay["body"]["type"] == xc.OP_PAYMENT
    assert pay["body"]["paymentOp"]["amount"] == 1500
    assert pay["body"]["paymentOp"]["asset"]["alphaNum4"]["assetCode"] == "KIN"
    assert (
        pay["body"]["paymentOp"]["asset"]["alphaNum4"]["issuer"]["ed25519"]
        == ISSUER.hex()
    )
    assert pay["sourceAccount"][0]["ed25519"] == OPSRC.hex()  # override
    assert create["body"]["type"] == xc.OP_CREATE_ACCOUNT
    assert create["body"]["createAccountOp"]["startingBalance"] == 10_000
    assert create["sourceAccount"] == []


def test_ledger_and_result_entries_decode():
    led = xc.parse_ledgers(xc.build_ledger_entry(640, close_time=1_535_594_286))
    assert led[0]["header"]["ledgerSeq"] == 640
    assert led[0]["header"]["scpValue"]["closeTime"] == 1_535_594_286

    tx_hash = b"\xab" * 32
    res = xc.parse_results(
        xc.build_result_entry(
            640,
            [(tx_hash, 100, 0, [(xc.OP_PAYMENT, 0)]),
             (tx_hash[::-1], 100, -6, [])],
        )
    )
    pairs = res[0]["txResultSet"]["results"]
    assert pairs[0]["transactionHash"] == tx_hash.hex()
    assert pairs[0]["result"]["feeCharged"] == 100
    assert pairs[0]["result"]["result"]["code"] == "txSUCCESS"
    assert (
        pairs[0]["result"]["result"]["results"][0]["tr"]["paymentResult"]["code"]
        == 0
    )
    assert pairs[1]["result"]["result"]["code"] == "txBAD_AUTH"
    assert pairs[1]["result"]["result"]["results"] == []


def test_unsupported_shapes_raise_not_guess():
    w = xc.XdrWriter()
    w.int32(99)  # unknown PublicKey type
    with pytest.raises(ValueError, match="PublicKey"):
        xc._account_id(xc.XdrReader(w.getvalue()))
    w2 = xc.XdrWriter().int32(7)  # unknown Asset type
    with pytest.raises(ValueError, match="Asset"):
        xc._asset(xc.XdrReader(w2.getvalue()))


def test_read_archive_decodes_binary_xdr(spark, tmp_path):
    """End-to-end: binary triplet on disk -> Spark DataFrames, including
    codec auto-detect (this file is real XDR, not the JSON fixture) and
    file_seq derived from the archive file name."""
    tx_bytes = _fixture_tx_bytes()
    env = xc.build_envelope(tx_bytes)
    tx_hash = hashlib.sha256(
        hashlib.sha256(DEFAULT_NETWORK_PASSPHRASE.encode()).digest()
        + struct.pack(">I", xc.ENVELOPE_TYPE_TX)
        + tx_bytes
    ).hexdigest()

    d = str(tmp_path)
    write_xdr_archive_file(
        d, "transactions", "0000003f",
        [xc.build_transaction_entry(63, [env]),
         xc.build_transaction_entry(64, [])],
    )
    write_xdr_archive_file(
        d, "ledger", "0000003f",
        [xc.build_ledger_entry(63, 1_535_594_286),
         xc.build_ledger_entry(64, 1_535_594_291)],
    )
    write_xdr_archive_file(
        d, "results", "0000003f",
        [xc.build_result_entry(
            63, [(bytes.fromhex(tx_hash), 200, 0,
                  [(xc.OP_PAYMENT, 0), (xc.OP_CREATE_ACCOUNT, 0)])]
        )],
    )

    entries = read_archive(spark, f"{d}/transactions-*.xdr.gz")
    rows = {r["ledger_seq"]: r for r in entries.collect()}
    assert set(rows) == {63, 64}
    assert rows[63]["file_seq"] == "0000003f"
    tx = rows[63]["txs"][0]
    assert tx["hash"] == tx_hash
    assert tx["memo"] == "1-anon-test"
    assert tx["source"] == SRC.hex()
    assert tx["operations"][0]["type"] == 1
    assert tx["operations"][0]["amount"] == 1500
    assert tx["operations"][0]["asset"]["assetCode"] == "KIN"
    assert tx["operations"][0]["sourceAccount"] == [OPSRC.hex()]
    assert tx["operations"][1]["type"] == 0
    assert tx["operations"][1]["starting_balance"] == 10_000
    assert rows[64]["txs"] == []

    led = {r["ledger_seq"]: r for r in
           read_ledger_archive(spark, f"{d}/ledger-*.xdr.gz").collect()}
    assert led[63]["close_time"] == 1_535_594_286
    assert led[64]["close_time"] == 1_535_594_291

    res = read_results_archive(spark, f"{d}/results-*.xdr.gz").collect()
    assert len(res) == 1
    assert res[0]["tx_hash"] == tx_hash
    assert res[0]["tx_status"] == "txSUCCESS"
    assert [o["op_type"] for o in res[0]["op_results"]] == [1, 0]


def test_json_fixture_codec_still_detected(spark, tmp_path):
    """The legacy JSON fixture payload and real XDR coexist: auto-detect
    routes each blob to the right codec."""
    from history_collector_spark.sources.xdr import write_archive_file

    d = str(tmp_path)
    write_archive_file(
        d, "0000007f",
        [{"ledger_seq": 100, "txs": [
            {"hash": "aa", "fee": 1, "memo": "m", "source": "s",
             "operations": []}]}],
    )
    rows = read_archive(spark, f"{d}/transactions-*.xdr.gz").collect()
    assert rows[0]["ledger_seq"] == 100
    assert rows[0]["file_seq"] == "0000007f"
    assert rows[0]["txs"][0]["hash"] == "aa"
