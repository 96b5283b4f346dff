"""Round-15 additions.

Covers the three ADVICE-r14 items on the from-scratch XZ decoder
(exception contract under truncation, leading-stream-padding parity
with stdlib, linear many-stream decode) plus the operators added this
round.
"""

from __future__ import annotations

import lzma
import time

import pytest

from history_collector_spark.functions.xz import XzDecodeError, decompress_xz


# ---------------------------------------------------------------------------
# ADVICE r14 (medium): the exception contract. Truncated or corrupt
# input must ALWAYS surface as XzDecodeError — never IndexError /
# struct.error — because _xz_ingest_batches' `except XzDecodeError`
# degrades a torn shard to its '__error__' row; any other exception
# type crashes the whole corpus_xz_ingest query instead.
# ---------------------------------------------------------------------------


def test_xz_truncation_exception_contract_exhaustive():
    """EVERY prefix of a real liblzma stream either decodes or raises
    XzDecodeError. Before the round-15 bounds checks, 8 truncation
    offsets escaped as IndexError/struct.error (block-padding loop,
    index-padding loop, index-CRC unpack)."""
    full = lzma.compress(b"the quick brown fox " * 50, check=lzma.CHECK_CRC64)
    for i in range(len(full)):
        try:
            decompress_xz(full[:i])
        except XzDecodeError:
            pass  # the contract
        # any other exception type propagates and fails the test

    # CRC32-checked and concatenated variants walk different branches
    two = lzma.compress(b"a" * 999, check=lzma.CHECK_CRC32) + lzma.compress(
        b"b" * 999
    )
    for i in range(len(two)):
        try:
            decompress_xz(two[:i])
        except XzDecodeError:
            pass


def test_xz_corruption_exception_contract_exhaustive():
    """Single-byte corruption at every offset: decode, XzDecodeError,
    or (never) another exception type."""
    full = lzma.compress(b"corrupt me " * 64, check=lzma.CHECK_CRC64)
    for i in range(len(full)):
        mut = bytearray(full)
        mut[i] ^= 0xFF
        try:
            decompress_xz(bytes(mut))
        except XzDecodeError:
            pass


# ---------------------------------------------------------------------------
# ADVICE r14 (low): leading stream padding. stdlib lzma and `xz -d`
# both REJECT null padding before the first stream; padding is legal
# only between/after streams.
# ---------------------------------------------------------------------------


def test_xz_leading_padding_rejected_like_stdlib():
    blob = lzma.compress(b"payload " * 40)
    with pytest.raises(XzDecodeError):
        decompress_xz(b"\x00" * 4 + blob)
    with pytest.raises(lzma.LZMAError):
        lzma.decompress(b"\x00" * 4 + blob)
    # between-stream and trailing padding stay accepted
    assert decompress_xz(blob + b"\x00" * 8 + blob) == b"payload " * 80
    assert decompress_xz(blob + b"\x00" * 4) == b"payload " * 40


# ---------------------------------------------------------------------------
# ADVICE r14 (low): many-stream concatenated files must decode in
# ~linear time. The pre-fix code sliced `data = data[start:]` (a full
# bytes copy) per stream — O(total^2) memory traffic.
# ---------------------------------------------------------------------------


def test_xz_many_stream_concat_linear():
    one = lzma.compress(b"x" * 100)
    blob = one * 2000
    t0 = time.time()
    assert decompress_xz(blob) == b"x" * 200_000
    elapsed = time.time() - t0
    # pre-fix this took quadratic time (>2 s at 2000 streams on this
    # box); the memoryview path runs ~0.15 s — 5 s is a loose ceiling
    # that still catches a quadratic regression
    assert elapsed < 5.0, f"many-stream decode took {elapsed:.1f}s"


# ---------------------------------------------------------------------------
# bpe_encode_corpus oracle (round 15): the encode side of the oracle
# replays merges IN RANK ORDER with a global left-to-right
# non-overlapping replace per merge; encode_word instead repeatedly
# merges the lowest-ranked pair present, one occurrence at a time.
# The two are equivalent because a merge can only create pairs of
# strictly higher rank than itself — pinned here on random corpora.
# ---------------------------------------------------------------------------


def _apply_global(sym: list[str], a: str, b: str) -> list[str]:
    """One merge pair applied globally, left to right, non-overlapping
    — the fold both the Spark F.aggregate and the DuckDB list_reduce
    oracle perform."""
    out: list[str] = []
    for s in sym:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def test_bpe_encode_word_equals_rank_order_global_replace():
    import random

    from history_collector_spark.queries.bpe import (
        _learn_merges,
        encode_word,
    )

    rng = random.Random(1509)
    for trial in range(25):
        alpha = "abcd"[: rng.randint(2, 4)]
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(5, 40))
        ]
        wc = [(w, rng.randint(1, 9)) for w in set(words)]
        merges = _learn_merges(wc, n_merges=rng.randint(1, 30))
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in wc:
            sym = list(w)
            for a, b in merges:  # rank order
                sym = _apply_global(sym, a, b)
            assert sym == encode_word(w, ranks), (w, merges)


def test_bpe_oracle_separator_absent_from_corpus():
    """chr(31) is the oracle's symbol delimiter — it must never occur
    in any document at any test SF or the sep-joined symbol strings
    would be ambiguous."""
    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        (bad,) = con.sql(
            "SELECT count(*) FROM "
            f"'/root/testdata/sf{sf}/documents.parquet' "
            "WHERE contains(text, chr(31))"
        ).fetchone()
        assert bad == 0, f"sf{sf}: {bad} documents contain chr(31)"
