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


# ---------------------------------------------------------------------------
# Geo family (round 15): geohash cell encoding + bucketed 3x3
# neighbor join. Beyond the DuckDB oracle parity (test_correctness),
# pin the SEMANTICS: base32 roundtrip, prefix containment, and the
# neighbor join finding the true nearest whenever it lies within the
# 3x3 neighborhood.
# ---------------------------------------------------------------------------


def _gh_decode(gh: str) -> tuple[int, int]:
    from history_collector_spark.queries.geo import _BITS, _GH32

    code = 0
    for ch in gh:
        code = (code << 5) | _GH32.index(ch)
    lon = lat = 0
    for i in range(_BITS):
        lon |= ((code >> (2 * i + 1)) & 1) << i
        lat |= ((code >> (2 * i)) & 1) << i
    return lon, lat


def test_geo_geohash_roundtrip_and_prefix_containment(spark):
    from tests.conftest import TEST_SF_DIR

    from history_collector_spark.queries.geo import (
        _BITS,
        _COARSE_SHIFT,
        _LAT_MULT,
        _LON_MULT,
    )
    from history_collector_spark.registry import QUERIES

    from history_collector_spark import registry

    registry.load_all()
    pdf = QUERIES["geo_geohash_cells"](spark, TEST_SF_DIR).toPandas()
    assert (pdf["n_points"] >= pdf["n_cells"]).all()
    # prefix space is 32^3 at ANY scale — the aggregate's bound
    assert len(pdf) <= 32**3
    # roundtrip: rebuild some customers' cells from their keys and
    # confirm the emitted prefixes are the enclosing coarse cells
    import duckdb

    con = duckdb.connect()
    keys = con.sql(
        f"SELECT c_custkey FROM '{TEST_SF_DIR}/customer.parquet' "
        "ORDER BY c_custkey LIMIT 50"
    ).fetchall()
    prefixes = set(pdf["gh3"])
    for (k,) in keys:
        lon = (k * _LON_MULT) % (1 << _BITS)
        lat = (k * _LAT_MULT) % (1 << _BITS)
        code = 0
        for i in range(_BITS):
            code |= ((lon >> i) & 1) << (2 * i + 1)
            code |= ((lat >> i) & 1) << (2 * i)
        from history_collector_spark.queries.geo import _GH32

        gh6 = "".join(
            _GH32[(code >> (5 * (5 - j))) & 31] for j in range(6)
        )
        assert gh6[:3] in prefixes
        # decode inverts encode exactly
        assert _gh_decode(gh6) == (lon, lat)
    assert _COARSE_SHIFT < _BITS


def test_geo_knn_matches_bruteforce_within_neighborhood(spark):
    """On the small SF: for every supplier whose GLOBAL nearest
    customer lies inside its 3x3 coarse neighborhood, the bucketed
    join must report exactly that customer (squared distance AND
    tie-break)."""
    import duckdb

    from tests.conftest import TEST_SF_DIR

    from history_collector_spark.queries.geo import (
        _BITS,
        _COARSE_SHIFT,
        _LAT_MULT,
        _LON_MULT,
    )
    from history_collector_spark.registry import QUERIES

    from history_collector_spark import registry

    registry.load_all()
    con = duckdb.connect()
    custs = con.sql(
        f"SELECT c_custkey FROM '{TEST_SF_DIR}/customer.parquet'"
    ).fetchall()
    supps = con.sql(
        f"SELECT s_suppkey, s_nationkey FROM "
        f"'{TEST_SF_DIR}/supplier.parquet'"
    ).fetchall()
    m = (1 << _BITS) - 1

    def place(k, ml, mlat):
        return (k * ml) % (m + 1), (k * mlat) % (m + 1)

    cpts = [(k, *place(k, _LON_MULT, _LAT_MULT)) for (k,) in custs]
    per_nation: dict[int, list] = {}
    for sk, nat in supps:
        slon, slat = place(sk, _LAT_MULT, _LON_MULT)  # swapped axes
        best = None
        for ck, clon, clat in cpts:
            d2 = (slon - clon) ** 2 + (slat - clat) ** 2
            cand = (d2, ck)
            if best is None or cand < best:
                best = cand
        # inside the 3x3 neighborhood?
        bd2, bck = best
        bclon, bclat = place(bck, _LON_MULT, _LAT_MULT)
        if (
            abs((bclon >> _COARSE_SHIFT) - (slon >> _COARSE_SHIFT)) <= 1
            and abs((bclat >> _COARSE_SHIFT) - (slat >> _COARSE_SHIFT)) <= 1
        ):
            per_nation.setdefault(nat, []).append((bd2, bck))

    pdf = QUERIES["geo_bucket_knn_join"](spark, TEST_SF_DIR).toPandas()
    got = {int(r.s_nationkey): r for r in pdf.itertuples()}
    for nat, hits in per_nation.items():
        assert nat in got
        # every global-nearest-in-neighborhood supplier is matched,
        # so per-nation minimum distance can never exceed the
        # brute-force minimum over that subset
        assert got[nat].min_d2 <= min(h[0] for h in hits)


# ---------------------------------------------------------------------------
# Rank statistics (round 15): Mann-Whitney U and Kendall tau-b pinned
# against direct NumPy/pandas recomputation on the same quantized
# values (no scipy in this container — the reference formulas are
# standard).
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_numpy_reference(spark):
    import math

    import duckdb
    import numpy as np

    from tests.conftest import TEST_SF_DIR

    from history_collector_spark.registry import QUERIES

    from history_collector_spark import registry

    registry.load_all()
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(floor(value * 1000000.0 + 0.5) AS "
        f"BIGINT) qv FROM '{TEST_SF_DIR}/events.parquet'"
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for t, qv in rows:
        by_type.setdefault(t, []).append(qv)

    pdf = QUERIES["events_mann_whitney_u"](spark, TEST_SF_DIR).toPandas()
    for r in pdf.itertuples():
        g1 = np.array(sorted(by_type[r.pair]))
        g0 = np.array(sorted(by_type["click"]))
        combined = np.concatenate([g1, g0])
        order = np.argsort(combined, kind="stable")
        ranks = np.empty(len(combined))
        # average ranks with ties
        sorted_vals = combined[order]
        i = 0
        while i < len(sorted_vals):
            j = i
            while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average
            i = j
        r1 = ranks[: len(g1)].sum()
        n1, n2 = len(g1), len(g0)
        u1 = n1 * n2 + n1 * (n1 + 1) / 2.0 - r1
        assert r.n1 == n1 and r.n2 == n2
        assert math.isclose(r.r1_x2, 2 * r1)
        assert math.isclose(r.u1_x2, 2 * u1)


def test_kendall_counts_match_bruteforce(spark):
    import duckdb

    from tests.conftest import TEST_SF_DIR

    from history_collector_spark.registry import QUERIES

    from history_collector_spark import registry

    registry.load_all()
    con = duckdb.connect()
    daily = con.sql(
        "SELECT event_type, CAST(ts AS DATE) d, count(*) nx, "
        "sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) sy "
        f"FROM '{TEST_SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, list] = {}
    for t, d, nx, sy in daily:
        series.setdefault(t, []).append((d, nx, sy))
    pdf = QUERIES["events_kendall_tau_daily"](spark, TEST_SF_DIR).toPandas()
    for r in pdf.itertuples():
        pts = sorted(series[r.event_type])
        nc = nd = tx = ty = txy = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dx = pts[i][1] - pts[j][1]
                dy = pts[i][2] - pts[j][2]
                if dx == 0 and dy == 0:
                    txy += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif dx * dy > 0:
                    nc += 1
                else:
                    nd += 1
        assert r.n_days == len(pts)
        assert (r.n_conc, r.n_disc, r.n_tie_x, r.n_tie_y, r.n_tie_xy) == (
            nc, nd, tx, ty, txy,
        )


# ---------------------------------------------------------------------------
# From-scratch ORC reader (round 15): pinned against the real liborc
# writer (pyarrow.orc) across codec x string-encoding, the RLEv2
# stress shapes (patched-base outliers, negative bases, descending
# deltas, dates), multi-stripe files, and the exhaustive
# truncation/corruption exception contract.
# ---------------------------------------------------------------------------


def _orc_write(table, **kw):
    import io

    from pyarrow import orc

    buf = io.BytesIO()
    orc.write_table(table, buf, **kw)
    return buf.getvalue()


def _orc_table(n=1500, seed=31):
    import random

    import pyarrow as pa

    rng = random.Random(seed)
    return pa.table(
        {
            "i64": pa.array(
                [rng.randint(-(2**60), 2**60)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int64(),
            ),
            "i32": pa.array(
                [rng.randint(-(2**31), 2**31 - 1)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int32(),
            ),
            "seq": pa.array(range(n), pa.int64()),
            "f64": pa.array(
                [rng.random() * 1e6
                 if rng.random() > 0.1 else None for _ in range(n)]
            ),
            "f32": pa.array(
                [float(rng.randint(0, 50))
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.float32(),
            ),
            "s": pa.array(
                [f"w{rng.randint(0, 30)}"
                 if rng.random() > 0.1 else None for _ in range(n)]
            ),
            "hi": pa.array([f"u-{i}" for i in range(n)]),
            "b": pa.array(
                [rng.random() > 0.5
                 if rng.random() > 0.1 else None for _ in range(n)]
            ),
            "bin": pa.array(
                [bytes(rng.randint(0, 255)
                       for _ in range(rng.randint(0, 15)))
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.binary(),
            ),
        }
    )


@pytest.mark.parametrize(
    "comp", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_orc_raw_matches_pyarrow_matrix(comp):
    from history_collector_spark.functions.orc_raw import read_orc_raw

    t = _orc_table()
    exp = t.to_pydict()
    for dkt in (0.0, 1.0):  # direct vs dictionary string encodings
        out = read_orc_raw(
            _orc_write(t, compression=comp,
                       dictionary_key_size_threshold=dkt)
        )
        assert out["num_rows"] == t.num_rows
        for name in exp:
            assert out["columns"][name] == exp[name], (name, comp, dkt)


def test_orc_raw_rlev2_stress_and_dates():
    """Sparse huge outliers force PATCHED_BASE; shifted-negative
    copies force a signed base; a descending ramp forces DELTA with a
    negative delta base; DATE columns decode as epoch days."""
    import datetime
    import random

    import pyarrow as pa

    from history_collector_spark.functions.orc_raw import read_orc_raw

    rng = random.Random(99)
    pb = [rng.randint(0, 255) for _ in range(5000)]
    for i in range(0, 5000, 400):
        pb[i] = rng.randint(2**40, 2**45)
    t = pa.table(
        {
            "pb": pa.array(pb, pa.int64()),
            "nb": pa.array([v - 500000 for v in pb], pa.int64()),
            "descending": pa.array(range(5000, 0, -1), pa.int64()),
            "d": pa.array(
                [datetime.date(2020, 1, 1)
                 + datetime.timedelta(days=i % 3000)
                 for i in range(5000)]
            ),
        }
    )
    exp = t.to_pydict()
    epoch = datetime.date(1970, 1, 1)
    for comp in ("uncompressed", "zlib"):
        out = read_orc_raw(_orc_write(t, compression=comp))
        assert out["columns"]["pb"] == exp["pb"]
        assert out["columns"]["nb"] == exp["nb"]
        assert out["columns"]["descending"] == exp["descending"]
        assert out["columns"]["d"] == [
            (v - epoch).days for v in exp["d"]
        ]


def test_orc_raw_multi_stripe():
    import pyarrow as pa

    from history_collector_spark.functions.orc_raw import read_orc_raw

    big = pa.table(
        {"x": pa.array(range(300000), pa.int64()),
         "s": pa.array([f"v{i % 13}" for i in range(300000)])}
    )
    out = read_orc_raw(
        _orc_write(big, stripe_size=1024, compression="snappy")
    )
    assert out["n_stripes"] > 1
    assert out["columns"]["x"] == list(range(300000))
    assert out["columns"]["s"] == big.to_pydict()["s"]


def test_orc_raw_exception_contract_exhaustive():
    import pyarrow as pa

    from history_collector_spark.functions.orc_raw import (
        OrcDecodeError,
        read_orc_raw,
    )

    t = pa.table(
        {"a": pa.array(range(300), pa.int64()),
         "s": pa.array([f"q{i % 7}" for i in range(300)])}
    )
    blob = _orc_write(t, compression="zlib")
    for i in range(len(blob)):
        try:
            read_orc_raw(blob[:i])
        except OrcDecodeError:
            pass
    for i in range(len(blob)):
        mut = bytearray(blob)
        mut[i] ^= 0xFF
        try:
            read_orc_raw(bytes(mut))
        except OrcDecodeError:
            pass


def test_orc_raw_rejects_nested_and_unknown():
    import pyarrow as pa

    from history_collector_spark.functions.orc_raw import (
        OrcDecodeError,
        read_orc_raw,
    )

    nested = pa.table(
        {"v": pa.array([[1, 2], [3]], pa.list_(pa.int64()))}
    )
    with pytest.raises(OrcDecodeError):
        read_orc_raw(_orc_write(nested))
    with pytest.raises(OrcDecodeError):
        read_orc_raw(b"ORC\nnot really an orc file\x05")


# ---------------------------------------------------------------------------
# Multi-channel ADPCM (round 15, VERDICT r14 missing-item 4): the IMA
# and MS decoders were always channel-generic (round-robin nibble
# groups / per-field headers); the >2-channel guards are gone and the
# layout is pinned by channel-identity correlation on distinct
# per-channel signals — a channel swap or group-order bug is
# unmissable.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nch", [3, 4, 6])
def test_wav_ima_adpcm_multichannel_layout(nch):
    import numpy as np

    from history_collector_spark.functions.wav import (
        encode_wav_ima_adpcm,
        parse_wav,
    )

    frames = 505 * 3
    sig = np.zeros(frames * nch, dtype=np.int16)
    for c in range(nch):
        t = np.arange(frames)
        sig[c::nch] = (
            3000 * (c + 1) * np.sin(t / (8.0 + c))
        ).astype(np.int16)
    blob = encode_wav_ima_adpcm(
        [int(x) for x in sig], 16000, n_channels=nch
    )
    out = parse_wav(blob)
    assert out["n_channels"] == nch and out["codec"] == "ima_adpcm"
    dec = np.asarray(out["samples"], dtype=np.int64)
    for c in range(nch):
        own = np.corrcoef(dec[c::nch][:frames], sig[c::nch][:frames])[0, 1]
        assert own > 0.99, (nch, c, own)
    # block-start seeds are exact per the format (stored verbatim)
    assert dec[:nch].tolist() == sig[:nch].tolist()


@pytest.mark.parametrize("nch", [3, 4])
def test_wav_ms_adpcm_multichannel_layout(nch):
    import numpy as np

    from history_collector_spark.functions.wav import (
        encode_wav_ms_adpcm,
        parse_wav,
    )

    frames = 500 * 3
    sig = np.zeros(frames * nch, dtype=np.int16)
    for c in range(nch):
        t = np.arange(frames)
        sig[c::nch] = (
            2500 * (c + 1) * np.sin(t / (9.0 + c))
        ).astype(np.int16)
    blob = encode_wav_ms_adpcm(
        [int(x) for x in sig], 16000, n_channels=nch
    )
    out = parse_wav(blob)
    assert out["n_channels"] == nch and out["codec"] == "ms_adpcm"
    dec = np.asarray(out["samples"], dtype=np.int64)
    for c in range(nch):
        own = np.corrcoef(dec[c::nch][:frames], sig[c::nch][:frames])[0, 1]
        assert own > 0.99, (nch, c, own)


# ---------------------------------------------------------------------------
# Parquet v2 value encodings (round 15, second wave): the encodings a
# modern writer emits beyond PLAIN/dictionary — DELTA_BINARY_PACKED,
# DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY (incremental front
# coding), BYTE_STREAM_SPLIT — pinned against pyarrow with
# column_encoding forced, across codecs, page versions and page
# splits.
# ---------------------------------------------------------------------------


def test_parquet_raw_v2_value_encodings():
    import io
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
    )

    rng = random.Random(42)
    n = 3000
    t = pa.table(
        {
            "a": pa.array(
                [rng.randint(-(2**40), 2**40)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int64(),
            ),
            "i": pa.array(
                [rng.randint(-(2**30), 2**30)
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.int32(),
            ),
            "mono": pa.array(range(n), pa.int64()),
            "s": pa.array(
                [f"prefix-{i:05d}-" + "x" * rng.randint(0, 10)
                 if rng.random() > 0.1 else None for i in range(n)]
            ),
            "f": pa.array(
                [rng.random() * 1e6
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.float64(),
            ),
            "f32": pa.array(
                [float(rng.randint(0, 9999))
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.float32(),
            ),
        }
    )
    exp = t.to_pydict()
    enc_all = {
        "a": "DELTA_BINARY_PACKED",
        "i": "DELTA_BINARY_PACKED",
        "mono": "DELTA_BINARY_PACKED",
        "s": "DELTA_LENGTH_BYTE_ARRAY",
        "f": "BYTE_STREAM_SPLIT",
        "f32": "BYTE_STREAM_SPLIT",
    }
    for enc in (enc_all, {"s": "DELTA_BYTE_ARRAY",
                          "a": "DELTA_BINARY_PACKED"}):
        for comp in ("NONE", "SNAPPY", "ZSTD"):
            for dpv in ("1.0", "2.0"):
                buf = io.BytesIO()
                pq.write_table(
                    t, buf, use_dictionary=False, column_encoding=enc,
                    compression=comp, data_page_version=dpv,
                )
                out = read_parquet_raw(buf.getvalue())
                for k in exp:
                    assert out["columns"][k] == exp[k], (k, comp, dpv)
    # small pages force per-page delta stream restarts
    buf = io.BytesIO()
    pq.write_table(
        t, buf, use_dictionary=False, column_encoding=enc_all,
        compression="SNAPPY", data_page_size=2048,
    )
    out = read_parquet_raw(buf.getvalue())
    for k in exp:
        assert out["columns"][k] == exp[k], k


def test_parquet_raw_delta_exception_contract():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from history_collector_spark.functions.parquet_raw import (
        ParquetDecodeError,
        read_parquet_raw,
    )

    t = pa.table(
        {"a": pa.array(range(300), pa.int64()),
         "s": pa.array([f"pp-{i:04d}" for i in range(300)])}
    )
    buf = io.BytesIO()
    pq.write_table(
        t, buf, use_dictionary=False,
        column_encoding={"a": "DELTA_BINARY_PACKED",
                         "s": "DELTA_BYTE_ARRAY"},
        compression="NONE",
    )
    blob = buf.getvalue()
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


# ---------------------------------------------------------------------------
# From-scratch parquet WRITER (round 15, second wave): the dual
# conformance direction — three independent real readers (our own,
# pyarrow/parquet-cpp, DuckDB) must agree byte-faithfully on files
# this engine assembles from the spec. (Spark's reader accepts them
# too; not exercised here to keep the test session-free.)
# ---------------------------------------------------------------------------


def _writer_cols(n=500, seed=7):
    import random

    rng = random.Random(seed)

    def opt(gen):
        return [gen(i) if rng.random() > 0.15 else None for i in range(n)]

    return [
        ("a", "int64", opt(lambda i: rng.randint(-(2**62), 2**62))),
        ("b", "int32", opt(lambda i: rng.randint(-(2**31), 2**31 - 1))),
        ("s", "string", opt(lambda i: f"v{i % 13}" * rng.randint(0, 3))),
        ("d", "double", opt(lambda i: rng.random() * 1e9)),
        ("f", "float", opt(lambda i: float(rng.randint(0, 999)))),
        ("bl", "boolean", opt(lambda i: rng.random() > 0.5)),
        ("bin", "binary",
         opt(lambda i: bytes(rng.randint(0, 255)
                             for _ in range(rng.randint(0, 9))))),
    ]


def test_parquet_writer_three_reader_agreement(tmp_path):
    import io

    import duckdb
    import pyarrow.parquet as pq

    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
        write_parquet_raw,
    )

    cols = _writer_cols()
    blob = write_parquet_raw(cols)
    # 1. our own reader
    out = read_parquet_raw(blob)
    for name, _, vals in cols:
        assert out["columns"][name] == vals, name
    # 2. pyarrow (parquet-cpp)
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in cols:
        assert t.column(name).to_pylist() == vals, name
    # 3. duckdb
    p = tmp_path / "w.parquet"
    p.write_bytes(blob)
    con = duckdb.connect()
    got = con.sql(f"SELECT a, s, bl FROM '{p}'").fetchall()
    exp = list(zip(cols[0][2], cols[2][2], cols[5][2]))
    assert got == exp


def test_parquet_writer_required_all_null_and_empty_strings(tmp_path):
    import io

    import pyarrow.parquet as pq

    from history_collector_spark.functions.parquet_raw import (
        read_parquet_raw,
        write_parquet_raw,
    )

    cols = [
        ("k", "int64", list(range(64))),          # no nulls
        ("gone", "string", [None] * 64),          # all nulls
        ("empty", "string", [""] * 64),           # empty strings
    ]
    blob = write_parquet_raw(cols)
    out = read_parquet_raw(blob)
    for name, _, vals in cols:
        assert out["columns"][name] == vals, name
    t = pq.read_table(io.BytesIO(blob))
    for name, _, vals in cols:
        assert t.column(name).to_pylist() == vals, name


# ---------------------------------------------------------------------------
# From-scratch ORC WRITER (round 15, second wave): the dual
# conformance direction for the second columnar format — liborc
# (pyarrow.orc) and this package's own reader must read the output
# byte-faithfully, across null patterns and RLEv2 DIRECT width
# classes.
# ---------------------------------------------------------------------------


def test_orc_writer_two_reader_agreement():
    import io
    import random

    from pyarrow import orc

    from history_collector_spark.functions.orc_raw import (
        read_orc_raw,
        write_orc_raw,
    )

    rng = random.Random(5)
    n = 3000
    cols = [
        ("a", "long",
         [rng.randint(-(2**60), 2**60)
          if rng.random() > 0.15 else None for _ in range(n)]),
        ("s", "string",
         [f"v{rng.randint(0, 40)}" * rng.randint(0, 2)
          if rng.random() > 0.15 else None for _ in range(n)]),
        ("d", "double",
         [rng.random() * 1e9
          if rng.random() > 0.15 else None for _ in range(n)]),
        ("b", "boolean",
         [rng.random() > 0.5
          if rng.random() > 0.15 else None for _ in range(n)]),
        ("req", "long", list(range(n))),
        ("tiny", "long", [rng.randint(0, 1) for _ in range(n)]),
    ]
    blob = write_orc_raw(cols)
    out = read_orc_raw(blob)
    for name, _, vals in cols:
        assert out["columns"][name] == vals, name
    t = orc.ORCFile(io.BytesIO(blob)).read()
    for name, _, vals in cols:
        assert t.column(name).to_pylist() == vals, name


def test_orc_writer_edge_shapes():
    import io

    from pyarrow import orc

    from history_collector_spark.functions.orc_raw import (
        read_orc_raw,
        write_orc_raw,
    )

    cols = [
        ("k", "long", list(range(64))),
        ("gone", "string", [None] * 64),   # all-null column
        ("empty", "string", [""] * 64),    # zero-length strings
        ("one", "boolean", [True] * 64),   # constant booleans
    ]
    blob = write_orc_raw(cols)
    out = read_orc_raw(blob)
    for name, _, vals in cols:
        assert out["columns"][name] == vals, name
    t = orc.ORCFile(io.BytesIO(blob)).read()
    for name, _, vals in cols:
        assert t.column(name).to_pylist() == vals, name
