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


# ---------------------------------------------------------------------------
# From-scratch Parquet reader (round 15): pinned against the real
# parquet-cpp writer (pyarrow) across the full codec / data-page /
# dictionary / row-group matrix, plus exhaustive truncation and
# corruption sweeps under the same exception contract as every other
# container codec in the package.
# ---------------------------------------------------------------------------


def _pq_table(n=600, seed=15):
    import random

    import pyarrow as pa

    rng = random.Random(seed)
    return pa.table(
        {
            "i32": pa.array(
                [rng.randint(-(2**31), 2**31 - 1)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int32(),
            ),
            "i64": pa.array(
                [rng.randint(-(2**62), 2**62)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int64(),
            ),
            "f64": pa.array(
                [rng.random() * 1e6
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.float64(),
            ),
            "f32": pa.array(
                [float(rng.randint(0, 100))
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.float32(),
            ),
            "s": pa.array(
                [f"w{rng.randint(0, 30)}"
                 if rng.random() > 0.1 else None for _ in range(n)]
            ),
            "b": pa.array(
                [rng.random() > 0.5
                 if rng.random() > 0.1 else None for _ in range(n)]
            ),
            "bin": pa.array(
                [bytes(rng.randint(0, 255)
                       for _ in range(rng.randint(0, 20)))
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.binary(),
            ),
            # high-cardinality column forces the dictionary-page
            # fallback to PLAIN mid-chunk
            "hi": pa.array(
                [f"unique-{i}-" + "x" * rng.randint(0, 50)
                 for i in range(n)]
            ),
        }
    )


def _pq_write(table, **kw):
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("codec", ["NONE", "SNAPPY", "GZIP", "ZSTD"])
@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_parquet_raw_matches_pyarrow_matrix(codec, dpv):
    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
    )

    t = _pq_table()
    exp = t.to_pydict()
    for use_dict in (True, False):
        for rgs in (None, 100):
            kw = dict(
                compression=codec,
                data_page_version=dpv,
                use_dictionary=use_dict,
            )
            if rgs:
                kw["row_group_size"] = rgs
            out = read_parquet_raw(_pq_write(t, **kw))
            assert out["num_rows"] == t.num_rows
            for name in exp:
                assert out["columns"][name] == exp[name], (name, kw)


def test_parquet_raw_required_columns_and_page_splits():
    import pyarrow as pa

    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
    )

    t = pa.table(
        {"a": pa.array(range(500), pa.int64()),
         "s": pa.array(["q"] * 500)}
    ).cast(
        pa.schema(
            [pa.field("a", pa.int64(), nullable=False),
             pa.field("s", pa.string(), nullable=False)]
        )
    )
    out = read_parquet_raw(_pq_write(t))
    assert out["columns"]["a"] == list(range(500))
    # tiny page size forces many pages per chunk on both versions
    big = _pq_table(n=400)
    for dpv in ("1.0", "2.0"):
        out = read_parquet_raw(
            _pq_write(big, compression="ZSTD", data_page_version=dpv,
                      data_page_size=1024)
        )
        assert out["columns"]["hi"] == big.to_pydict()["hi"]


def test_parquet_raw_exception_contract_exhaustive():
    """Every truncation prefix and every single-byte corruption either
    decodes or raises ParquetDecodeError — never any other type (the
    ingest kernel's per-shard degrade depends on it)."""
    from history_collector_spark.functions.parquet_raw import (
        ParquetDecodeError,
        read_parquet_raw,
    )

    import pyarrow as pa

    t = pa.table(
        {"a": pa.array(range(200), pa.int64()),
         "s": pa.array([f"v{i%9}" for i in range(200)])}
    )
    blob = _pq_write(t, compression="SNAPPY")
    for i in range(len(blob)):
        try:
            read_parquet_raw(blob[:i])
        except ParquetDecodeError:
            pass
    for i in range(len(blob)):
        mut = bytearray(blob)
        mut[i] ^= 0xFF
        try:
            read_parquet_raw(bytes(mut))
        except ParquetDecodeError:
            pass


def test_parquet_raw_rejects_nested_and_unknown():
    import pyarrow as pa

    from history_collector_spark.functions.parquet_raw import (
        ParquetDecodeError,
        read_parquet_raw,
    )

    nested = pa.table(
        {"m": pa.array([{"x": 1}, {"x": 2}],
                       pa.struct([("x", pa.int64())]))}
    )
    with pytest.raises(ParquetDecodeError):
        read_parquet_raw(_pq_write(nested))
    lists = pa.table({"v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    with pytest.raises(ParquetDecodeError):
        read_parquet_raw(_pq_write(lists))
    with pytest.raises(ParquetDecodeError):
        read_parquet_raw(b"PAR1garbagePAR1")
