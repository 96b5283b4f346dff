"""Minimal pure-Python XDR (RFC 4506) codec for the three history-archive
record types the reference ingests (python/main.py:263-266):

- ``ledger-*.xdr.gz``       -> LedgerHeaderHistoryEntry stream
- ``transactions-*.xdr.gz`` -> TransactionHistoryEntry stream
- ``results-*.xdr.gz``      -> TransactionHistoryResultEntry stream

Archive files are gzip over an RFC 5531 record-marked stream: each
record is preceded by a 4-byte big-endian mark whose low 31 bits are the
fragment length and whose high bit flags the final fragment. Record
shapes follow the public stellar-core XDR definitions
(Stellar-ledger.x / Stellar-transaction.x, protocol-9 era — the vintage
the reference's xdrparser targets). Everything here is hand-derived
from those public specs; only the subset of fields the reference's ETL
reads (python/main.py:107-201) is modeled, and unions it never sees
raise rather than guess.

Per-transaction hash matches xdrparser's ``with_hash=True`` semantics:
``sha256(network_id || uint32(ENVELOPE_TYPE_TX) || tx_bytes)`` where
``network_id = sha256(network_passphrase)`` and ``tx_bytes`` is the
marshaled Transaction struct (signatures excluded). We hash the raw
input slice rather than re-marshaling, so the hash is exact by
construction.

The decoders return plain dicts shaped like xdrparser's output so the
reference's dictionary-builders (get_ledgers_dictionary /
get_result_dictionary, python/main.py:107-122) map 1:1.
"""

from __future__ import annotations

import hashlib
import struct

ENVELOPE_TYPE_TX = 2  # Stellar-transaction.x EnvelopeType

KEY_TYPE_ED25519 = 0

MEMO_NONE, MEMO_TEXT, MEMO_ID, MEMO_HASH, MEMO_RETURN = range(5)

OP_CREATE_ACCOUNT = 0
OP_PAYMENT = 1

ASSET_TYPE_NATIVE = 0
ASSET_TYPE_ALPHANUM4 = 1
ASSET_TYPE_ALPHANUM12 = 2

# TransactionResultCode (Stellar-transaction.x); names match what the
# reference stores as tx_status (python/main.py:152).
TX_RESULT_CODES = {
    0: "txSUCCESS",
    -1: "txFAILED",
    -2: "txTOO_EARLY",
    -3: "txTOO_LATE",
    -4: "txMISSING_OPERATION",
    -5: "txBAD_SEQ",
    -6: "txBAD_AUTH",
    -7: "txINSUFFICIENT_BALANCE",
    -8: "txNO_ACCOUNT",
    -9: "txINSUFFICIENT_FEE",
    -10: "txBAD_AUTH_EXTRA",
    -11: "txINTERNAL_ERROR",
}


def network_id(passphrase: str) -> bytes:
    """sha256 of the network passphrase — the hash-domain separator."""
    return hashlib.sha256(passphrase.encode("utf-8")).digest()


# ---------------------------------------------------------------------------
# RFC 4506 primitive reader / writer
# ---------------------------------------------------------------------------


class XdrReader:
    """Sequential big-endian XDR primitive reader over one bytes buffer."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError(
                f"XDR underrun: need {n} bytes at offset {self.pos}, "
                f"have {len(self.data) - self.pos}"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def uint32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def uint64(self) -> int:
        return struct.unpack(">Q", self._take(8))[0]

    def int64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def bool(self) -> bool:
        v = self.uint32()
        if v not in (0, 1):
            raise ValueError(f"XDR bool must be 0/1, got {v}")
        return v == 1

    def opaque_fixed(self, n: int) -> bytes:
        out = self._take(n)
        pad = (-n) % 4
        if pad:
            self._take(pad)
        return out

    def opaque_var(self) -> bytes:
        return self.opaque_fixed(self.uint32())

    def string(self) -> str:
        return self.opaque_var().decode("utf-8")

    def array_len(self) -> int:
        return self.uint32()

    def optional(self, parse_fn):
        return parse_fn(self) if self.bool() else None

    def done(self) -> bool:
        return self.pos >= len(self.data)


class XdrWriter:
    """Fixture-side twin of XdrReader (tests build binary archives)."""

    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def uint32(self, v: int) -> "XdrWriter":
        self.parts.append(struct.pack(">I", v))
        return self

    def int32(self, v: int) -> "XdrWriter":
        self.parts.append(struct.pack(">i", v))
        return self

    def uint64(self, v: int) -> "XdrWriter":
        self.parts.append(struct.pack(">Q", v))
        return self

    def int64(self, v: int) -> "XdrWriter":
        self.parts.append(struct.pack(">q", v))
        return self

    def bool(self, v: bool) -> "XdrWriter":
        return self.uint32(1 if v else 0)

    def opaque_fixed(self, b: bytes) -> "XdrWriter":
        self.parts.append(b)
        pad = (-len(b)) % 4
        if pad:
            self.parts.append(b"\x00" * pad)
        return self

    def opaque_var(self, b: bytes) -> "XdrWriter":
        self.uint32(len(b))
        return self.opaque_fixed(b)

    def string(self, s: str) -> "XdrWriter":
        return self.opaque_var(s.encode("utf-8"))

    def raw(self, b: bytes) -> "XdrWriter":
        self.parts.append(b)
        return self

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


# ---------------------------------------------------------------------------
# RFC 5531 record marking (the framing of history-archive .xdr streams)
# ---------------------------------------------------------------------------


def iter_records(data: bytes):
    """Yield each record's bytes from a record-marked stream."""
    pos = 0
    while pos < len(data):
        frags: list[bytes] = []
        while True:
            if pos + 4 > len(data):
                raise ValueError("truncated record mark")
            mark = struct.unpack(">I", data[pos : pos + 4])[0]
            pos += 4
            length = mark & 0x7FFFFFFF
            last = bool(mark & 0x80000000)
            if pos + length > len(data):
                raise ValueError("truncated record body")
            frags.append(data[pos : pos + length])
            pos += length
            if last:
                break
        yield b"".join(frags)


def frame_record(body: bytes) -> bytes:
    """Single-fragment record mark (high bit = last) + body."""
    return struct.pack(">I", 0x80000000 | len(body)) + body


# ---------------------------------------------------------------------------
# Shared sub-structures
# ---------------------------------------------------------------------------


def _account_id(r: XdrReader) -> str:
    """PublicKey union -> lowercase hex of the 32-byte ed25519 key (the
    reference compares these as opaque strings, python/main.py:163)."""
    key_type = r.int32()
    if key_type != KEY_TYPE_ED25519:
        raise ValueError(f"unsupported PublicKey type {key_type}")
    return r.opaque_fixed(32).hex()


def _asset(r: XdrReader) -> dict:
    """Asset union -> {alphaNum4: {assetCode, issuer: {ed25519}}} shaped
    like xdrparser output (python/main.py:161-163 probes exactly this)."""
    t = r.int32()
    if t == ASSET_TYPE_NATIVE:
        return {"type": t, "alphaNum4": None, "alphaNum12": None}
    if t == ASSET_TYPE_ALPHANUM4:
        code = r.opaque_fixed(4).rstrip(b"\x00").decode("ascii")
        issuer = _account_id(r)
        return {
            "type": t,
            "alphaNum4": {"assetCode": code, "issuer": {"ed25519": issuer}},
            "alphaNum12": None,
        }
    if t == ASSET_TYPE_ALPHANUM12:
        code = r.opaque_fixed(12).rstrip(b"\x00").decode("ascii")
        issuer = _account_id(r)
        return {
            "type": t,
            "alphaNum4": None,
            "alphaNum12": {"assetCode": code, "issuer": {"ed25519": issuer}},
        }
    raise ValueError(f"unsupported Asset type {t}")


def _memo(r: XdrReader) -> dict:
    t = r.int32()
    if t == MEMO_NONE:
        return {"type": t, "text": None}
    if t == MEMO_TEXT:
        return {"type": t, "text": r.string()}
    if t == MEMO_ID:
        return {"type": t, "text": None, "id": r.uint64()}
    if t in (MEMO_HASH, MEMO_RETURN):
        return {"type": t, "text": None, "hash": r.opaque_fixed(32).hex()}
    raise ValueError(f"unsupported Memo type {t}")


def _operation(r: XdrReader) -> dict:
    # optional op-level source account, exposed as a 0/1-element list so
    # callers probe it exactly like the reference does
    # (tx_operation['sourceAccount'][0]['ed25519'], python/main.py:172)
    src = r.optional(_account_id)
    source_list = [{"ed25519": src}] if src is not None else []
    op_type = r.int32()
    if op_type == OP_CREATE_ACCOUNT:
        body = {
            "type": op_type,
            "createAccountOp": {
                "destination": {"ed25519": _account_id(r)},
                "startingBalance": r.int64(),
            },
            "paymentOp": None,
        }
    elif op_type == OP_PAYMENT:
        body = {
            "type": op_type,
            "createAccountOp": None,
            "paymentOp": {
                "destination": {"ed25519": _account_id(r)},
                "asset": _asset(r),
                "amount": r.int64(),
            },
        }
    else:
        raise ValueError(f"unsupported OperationType {op_type}")
    return {"sourceAccount": source_list, "body": body}


def _ext_v0(r: XdrReader) -> None:
    v = r.int32()
    if v != 0:
        raise ValueError(f"unsupported ext version {v}")


# ---------------------------------------------------------------------------
# transactions-*.xdr: TransactionHistoryEntry stream
# ---------------------------------------------------------------------------


def _transaction(r: XdrReader) -> dict:
    source = _account_id(r)
    fee = r.uint32()
    seq_num = r.int64()
    time_bounds = r.optional(
        lambda rr: {"minTime": rr.uint64(), "maxTime": rr.uint64()}
    )
    memo = _memo(r)
    ops = [_operation(r) for _ in range(r.array_len())]
    _ext_v0(r)
    return {
        "sourceAccount": {"ed25519": source},
        "fee": fee,
        "seqNum": seq_num,
        "timeBounds": time_bounds,
        "memo": memo,
        "operations": ops,
    }


def _tx_envelope(r: XdrReader, net_id: bytes | None) -> dict:
    """TransactionEnvelope = Transaction + DecoratedSignature<20>.

    The tx hash is sha256 over the RAW Transaction byte slice (offsets
    captured around the struct parse), so no re-marshaling can drift
    from what was actually on the wire (xdrparser with_hash semantics,
    python/main.py:265-266)."""
    start = r.pos
    tx = _transaction(r)
    tx_bytes = r.data[start : r.pos]
    n_sigs = r.array_len()
    sigs = []
    for _ in range(n_sigs):
        hint = r.opaque_fixed(4).hex()
        sig = r.opaque_var().hex()
        sigs.append({"hint": hint, "signature": sig})
    env = {"tx": tx, "signatures": sigs}
    if net_id is not None:
        h = hashlib.sha256(
            net_id + struct.pack(">I", ENVELOPE_TYPE_TX) + tx_bytes
        ).hexdigest()
        env["hash"] = h
    return env


def parse_transactions(
    data: bytes, with_hash: bool = False, network_passphrase: str | None = None
) -> list[dict]:
    """Decode a TransactionHistoryEntry stream (already gunzipped).

    Entry layout (Stellar-ledger.x): uint32 ledgerSeq; TransactionSet
    {Hash previousLedgerHash; TransactionEnvelope txs<>}; ext v0.
    """
    net = (
        network_id(network_passphrase)
        if with_hash and network_passphrase is not None
        else None
    )
    out = []
    for rec in iter_records(data):
        r = XdrReader(rec)
        ledger_seq = r.uint32()
        prev_hash = r.opaque_fixed(32).hex()
        txs = [_tx_envelope(r, net) for _ in range(r.array_len())]
        _ext_v0(r)
        if not r.done():
            raise ValueError("trailing bytes in TransactionHistoryEntry")
        out.append(
            {
                "ledgerSeq": ledger_seq,
                "txSet": {"previousLedgerHash": prev_hash, "txs": txs},
            }
        )
    return out


# ---------------------------------------------------------------------------
# ledger-*.xdr: LedgerHeaderHistoryEntry stream
# ---------------------------------------------------------------------------


def parse_ledgers(data: bytes) -> list[dict]:
    """Decode a LedgerHeaderHistoryEntry stream (already gunzipped).

    Only header fields up to what get_ledgers_dictionary needs
    (ledgerSeq, scpValue.closeTime — python/main.py:107-110) are
    surfaced; the rest are parsed positionally to keep the cursor
    exact."""
    out = []
    for rec in iter_records(data):
        r = XdrReader(rec)
        entry_hash = r.opaque_fixed(32).hex()
        ledger_version = r.uint32()
        prev_hash = r.opaque_fixed(32).hex()
        # StellarValue
        tx_set_hash = r.opaque_fixed(32).hex()
        close_time = r.uint64()
        upgrades = [r.opaque_var() for _ in range(r.array_len())]
        _ext_v0(r)
        tx_set_result_hash = r.opaque_fixed(32).hex()
        bucket_list_hash = r.opaque_fixed(32).hex()
        ledger_seq = r.uint32()
        total_coins = r.int64()
        fee_pool = r.int64()
        inflation_seq = r.uint32()
        id_pool = r.uint64()
        base_fee = r.uint32()
        base_reserve = r.uint32()
        max_tx_set_size = r.uint32()
        skip_list = [r.opaque_fixed(32).hex() for _ in range(4)]
        _ext_v0(r)  # LedgerHeader.ext
        _ext_v0(r)  # LedgerHeaderHistoryEntry.ext
        if not r.done():
            raise ValueError("trailing bytes in LedgerHeaderHistoryEntry")
        out.append(
            {
                "hash": entry_hash,
                "header": {
                    "ledgerVersion": ledger_version,
                    "previousLedgerHash": prev_hash,
                    "scpValue": {
                        "txSetHash": tx_set_hash,
                        "closeTime": close_time,
                        "upgrades": upgrades,
                    },
                    "txSetResultHash": tx_set_result_hash,
                    "bucketListHash": bucket_list_hash,
                    "ledgerSeq": ledger_seq,
                    "totalCoins": total_coins,
                    "feePool": fee_pool,
                    "inflationSeq": inflation_seq,
                    "idPool": id_pool,
                    "baseFee": base_fee,
                    "baseReserve": base_reserve,
                    "maxTxSetSize": max_tx_set_size,
                    "skipList": skip_list,
                },
            }
        )
    return out


# ---------------------------------------------------------------------------
# results-*.xdr: TransactionHistoryResultEntry stream
# ---------------------------------------------------------------------------


def _operation_result(r: XdrReader) -> dict:
    code = r.int32()
    if code != 0:  # opINNER
        return {"code": code, "tr": None}
    op_type = r.int32()
    if op_type == OP_CREATE_ACCOUNT:
        return {
            "code": code,
            "tr": {
                "type": op_type,
                "createAccountResult": {"code": r.int32()},
                "paymentResult": None,
            },
        }
    if op_type == OP_PAYMENT:
        return {
            "code": code,
            "tr": {
                "type": op_type,
                "createAccountResult": None,
                "paymentResult": {"code": r.int32()},
            },
        }
    raise ValueError(f"unsupported OperationResult type {op_type}")


def parse_results(data: bytes) -> list[dict]:
    """Decode a TransactionHistoryResultEntry stream (already gunzipped).

    Output shape matches what get_result_dictionary walks
    (python/main.py:113-122) and write_data reads: feeCharged,
    result.code (named), result.results[i].tr.{payment,createAccount}Result.
    """
    out = []
    for rec in iter_records(data):
        r = XdrReader(rec)
        ledger_seq = r.uint32()
        pairs = []
        for _ in range(r.array_len()):
            tx_hash = r.opaque_fixed(32).hex()
            fee_charged = r.int64()
            code_int = r.int32()
            op_results = []
            if code_int in (0, -1):  # txSUCCESS / txFAILED carry results<>
                op_results = [
                    _operation_result(r) for _ in range(r.array_len())
                ]
            _ext_v0(r)  # TransactionResult.ext
            pairs.append(
                {
                    "transactionHash": tx_hash,
                    "result": {
                        "feeCharged": fee_charged,
                        "result": {
                            "code": TX_RESULT_CODES.get(code_int, code_int),
                            "results": op_results,
                        },
                    },
                }
            )
        _ext_v0(r)  # TransactionHistoryResultEntry.ext
        if not r.done():
            raise ValueError("trailing bytes in TransactionHistoryResultEntry")
        out.append({"ledgerSeq": ledger_seq, "txResultSet": {"results": pairs}})
    return out


# ---------------------------------------------------------------------------
# Fixture builders (writer side) — tests compose hand-built binary
# archives through these, then decode them through the parsers above.
# ---------------------------------------------------------------------------


def build_operation(
    op_type: int,
    destination: bytes,
    amount: int,
    asset_code: str | None = None,
    asset_issuer: bytes | None = None,
    source: bytes | None = None,
) -> bytes:
    w = XdrWriter()
    if source is None:
        w.bool(False)
    else:
        w.bool(True).int32(KEY_TYPE_ED25519).opaque_fixed(source)
    w.int32(op_type)
    w.int32(KEY_TYPE_ED25519).opaque_fixed(destination)
    if op_type == OP_PAYMENT:
        if asset_code is None:
            w.int32(ASSET_TYPE_NATIVE)
        else:
            w.int32(ASSET_TYPE_ALPHANUM4)
            w.opaque_fixed(asset_code.encode("ascii").ljust(4, b"\x00"))
            w.int32(KEY_TYPE_ED25519).opaque_fixed(asset_issuer)
    w.int64(amount)
    return w.getvalue()


def build_transaction(
    source: bytes,
    fee: int,
    seq_num: int,
    memo_text: str | None,
    operations: list[bytes],
) -> bytes:
    """Marshaled Transaction struct (the exact bytes the tx hash covers)."""
    w = XdrWriter()
    w.int32(KEY_TYPE_ED25519).opaque_fixed(source)
    w.uint32(fee)
    w.int64(seq_num)
    w.bool(False)  # no timeBounds
    if memo_text is None:
        w.int32(MEMO_NONE)
    else:
        w.int32(MEMO_TEXT).string(memo_text)
    w.uint32(len(operations))
    for op in operations:
        w.raw(op)
    w.int32(0)  # ext v0
    return w.getvalue()


def build_envelope(tx_bytes: bytes, n_fake_sigs: int = 1) -> bytes:
    w = XdrWriter()
    w.raw(tx_bytes)
    w.uint32(n_fake_sigs)
    for i in range(n_fake_sigs):
        w.opaque_fixed(bytes([i] * 4))
        w.opaque_var(bytes([i] * 64))
    return w.getvalue()


def build_transaction_entry(ledger_seq: int, envelopes: list[bytes]) -> bytes:
    w = XdrWriter()
    w.uint32(ledger_seq)
    w.opaque_fixed(b"\x00" * 32)  # previousLedgerHash
    w.uint32(len(envelopes))
    for env in envelopes:
        w.raw(env)
    w.int32(0)  # ext v0
    return frame_record(w.getvalue())


def build_ledger_entry(ledger_seq: int, close_time: int) -> bytes:
    w = XdrWriter()
    w.opaque_fixed(b"\x11" * 32)  # entry hash
    w.uint32(9)  # ledgerVersion
    w.opaque_fixed(b"\x22" * 32)  # previousLedgerHash
    w.opaque_fixed(b"\x33" * 32)  # scpValue.txSetHash
    w.uint64(close_time)
    w.uint32(0)  # upgrades<>
    w.int32(0)  # StellarValue.ext
    w.opaque_fixed(b"\x44" * 32)  # txSetResultHash
    w.opaque_fixed(b"\x55" * 32)  # bucketListHash
    w.uint32(ledger_seq)
    w.int64(10**15)  # totalCoins
    w.int64(0)  # feePool
    w.uint32(0)  # inflationSeq
    w.uint64(0)  # idPool
    w.uint32(100)  # baseFee
    w.uint32(0)  # baseReserve
    w.uint32(500)  # maxTxSetSize
    for _ in range(4):
        w.opaque_fixed(b"\x66" * 32)  # skipList
    w.int32(0)  # LedgerHeader.ext
    w.int32(0)  # entry.ext
    return frame_record(w.getvalue())


def build_result_entry(
    ledger_seq: int,
    tx_results: list[tuple[bytes, int, int, list[tuple[int, int]]]],
) -> bytes:
    """tx_results: [(tx_hash32, fee_charged, tx_code, [(op_type, op_code)])]."""
    w = XdrWriter()
    w.uint32(ledger_seq)
    w.uint32(len(tx_results))
    for tx_hash, fee_charged, tx_code, ops in tx_results:
        w.opaque_fixed(tx_hash)
        w.int64(fee_charged)
        w.int32(tx_code)
        if tx_code in (0, -1):
            w.uint32(len(ops))
            for op_type, op_code in ops:
                w.int32(0)  # opINNER
                w.int32(op_type)
                w.int32(op_code)
        w.int32(0)  # TransactionResult.ext
    w.int32(0)  # entry.ext
    return frame_record(w.getvalue())
