"""Property-based tests (hypothesis) — the reference's randomized
schema-driven row generation (python/tests/test_postgres_storage_adapter.py:
278-302) ported to properties over our semantics-critical helpers:

- file-sequence algebra (S2): validity is preserved by next_file_seq,
  sequences are strictly monotone by +64;
- J3 zip semantics: the arrays_zip-null-pad + isNotNull-guard
  formulation equals Python's truncating zip (python/main.py:155-157)
  for every ops/results length combination;
- nullability enforcement: enforce_nullability splits any random row
  set exactly as the Postgres NOT NULL constraints would.
"""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.sources.xdr import (
    is_valid_file_seq,
    next_file_seq,
)


@given(st.integers(min_value=0, max_value=2**24 - 1))
def test_file_sequence_algebra(n):
    seq = format(n * 64 + 63, "08x")
    assert is_valid_file_seq(seq)
    nxt = next_file_seq(seq)
    assert is_valid_file_seq(nxt)
    assert int(nxt, 16) - int(seq, 16) == 64
    # misaligned neighbors are rejected
    assert not is_valid_file_seq(format(int(seq, 16) + 1, "08x"))


# one Spark job per example — keep the example count small
_ops_results = st.lists(
    st.tuples(
        st.lists(st.integers(0, 99), min_size=0, max_size=5),  # op markers
        st.integers(min_value=0, max_value=7),  # result count (may exceed ops)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(data=_ops_results)
def test_zip_null_pad_equals_truncating_zip(spark, data):
    """J3: posexplode(arrays_zip(ops, results)) with the F5 isNotNull
    guard must equal python/main.py:155-157's
    `enumerate(zip(ops, results))` + truthiness guard for ALL length
    combinations (ops shorter, equal, or longer than results)."""
    from pyspark.sql import functions as F

    rows = [
        (i, ops, [f"r{j}" for j in range(nres)])
        for i, (ops, nres) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "id long, ops array<int>, results array<string>"
    )
    got = (
        df.select(
            "id",
            F.posexplode(F.arrays_zip("ops", "results")).alias("op_index", "z"),
        )
        .select(
            "id",
            "op_index",
            F.col("z.ops").alias("op"),
            F.when(F.col("z.results").isNotNull(), F.col("z.results")).alias(
                "res"
            ),
        )
        .collect()
    )
    spark_rows = {(r.id, r.op_index, r.op, r.res) for r in got}

    expected = set()
    for i, (ops, nres) in enumerate(data):
        results = [f"r{j}" for j in range(nres)]
        # arrays_zip pads the SHORT side with null; the guard turns a
        # missing result into None, and a padded (null-op) row keeps
        # op=None — mirror both paddings
        for idx in range(max(len(ops), len(results))):
            op = ops[idx] if idx < len(ops) else None
            res = results[idx] if idx < len(results) else None
            expected.add((i, idx, op, res))
    assert spark_rows == expected


_row_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.text(min_size=1, max_size=8)),  # source
        st.one_of(st.none(), st.text(min_size=1, max_size=8)),  # memo (nullable)
        st.one_of(st.none(), st.integers(0, 10**6)),  # fee
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None)
@given(rows=_row_strategy)
def test_nullability_split_property(spark, rows):
    """enforce_nullability must partition rows exactly: NOT NULL
    violations rejected, everything else kept, nothing lost."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from history_collector_spark.schemas import enforce_nullability

    schema = StructType(
        [
            StructField("source", StringType(), nullable=False),
            StructField("memo_text", StringType(), nullable=True),
            StructField("fee", IntegerType(), nullable=False),
        ]
    )
    df = spark.createDataFrame(rows, "source string, memo_text string, fee int")
    valid, rejected = enforce_nullability(df, schema)
    n_valid_expected = sum(
        1 for (s, _m, f) in rows if s is not None and f is not None
    )
    assert valid.count() == n_valid_expected
    assert rejected.count() == len(rows) - n_valid_expected


def test_sketch_aggregates_accuracy(spark):
    """The oracle (since round 10) proves Spark == DuckDB on the
    from-scratch registers; this pins the sketch against the EXACT
    answers — the accuracy contract the oracle alone cannot state."""
    from history_collector_spark import registry

    registry.load_all()
    from tests.conftest import TEST_SF_DIR

    got = {
        r["event_type"]: r
        for r in registry.QUERIES["sketch_aggregates"](spark, TEST_SF_DIR).collect()
    }
    from history_collector_spark.catalog import table
    from pyspark.sql import functions as F

    exact = {
        r["event_type"]: r
        for r in table(spark, TEST_SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            # exact quantile BRACKETS: a Bernoulli sampling sketch's
            # p-quantile estimate has rank std ~ sqrt(p(1-p)/n_s), so
            # the honest pin is an interval in rank space, not a
            # value-space epsilon (the old percentile_approx was
            # near-exact; the deterministic sample is not)
            F.expr(
                "percentile(value, array(0.25, 0.75, 0.85, 0.90))"
            ).alias("brackets"),
            F.max("value").alias("vmax"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k in got:
        assert got[k]["n_events"] == exact[k]["n"]
        assert abs(got[k]["approx_users"] - exact[k]["users"]) <= max(
            2, 0.05 * exact[k]["users"]
        )
        lo25, hi75, lo85, lo90 = exact[k]["brackets"]
        vmax = exact[k]["vmax"]
        assert lo25 <= got[k]["p50"] <= hi75, k
        assert lo85 <= got[k]["p95"] <= vmax, k
        assert lo90 <= got[k]["p99"] <= vmax, k


def test_sequence_pack_layout_invariants(spark):
    """The packed layout is a valid concatenation order: within each
    source (doc_id order) offsets are the exclusive prefix sum, chunk
    ranges are consistent with the 512-token window, and chunks are
    contiguous — no token is unplaced and none overlaps."""
    from history_collector_spark.registry import QUERIES, load_all

    load_all()
    pdf = (
        QUERIES["curation_sequence_pack"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    assert len(pdf) > 0
    for _, grp in pdf.groupby("source"):
        expected_off = 0
        for row in grp.itertuples():
            assert row.start_off == expected_off
            assert row.first_chunk == row.start_off // 512
            assert row.last_chunk == (row.start_off + row.n_tokens - 1) // 512
            assert row.first_chunk <= row.last_chunk
            expected_off += row.n_tokens


# -- XDR codec (S3): primitive round-trip and framing laws -------------------

from history_collector_spark.sources import xdr_codec as xc


@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("u32"), st.integers(0, 2**32 - 1)),
            st.tuples(st.just("i32"), st.integers(-(2**31), 2**31 - 1)),
            st.tuples(st.just("u64"), st.integers(0, 2**64 - 1)),
            st.tuples(st.just("i64"), st.integers(-(2**63), 2**63 - 1)),
            st.tuples(st.just("bool"), st.booleans()),
            st.tuples(st.just("var"), st.binary(max_size=64)),
            st.tuples(st.just("str"), st.text(max_size=32)),
        ),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_xdr_primitives_round_trip(ops):
    """Any interleaving of XDR primitives survives write->read exactly,
    and the stream is fully consumed (4-byte alignment holds)."""
    w = xc.XdrWriter()
    for kind, v in ops:
        getattr(
            w,
            {"u32": "uint32", "i32": "int32", "u64": "uint64",
             "i64": "int64", "bool": "bool", "var": "opaque_var",
             "str": "string"}[kind],
        )(v)
    r = xc.XdrReader(w.getvalue())
    for kind, v in ops:
        got = getattr(
            r,
            {"u32": "uint32", "i32": "int32", "u64": "uint64",
             "i64": "int64", "bool": "bool", "var": "opaque_var",
             "str": "string"}[kind],
        )()
        assert got == v
    assert r.done()


@given(st.lists(st.binary(max_size=200), max_size=10))
@settings(max_examples=100, deadline=None)
def test_xdr_record_stream_round_trip(bodies):
    """frame_record/iter_records are inverse for any record sequence."""
    stream = b"".join(xc.frame_record(b) for b in bodies)
    assert list(xc.iter_records(stream)) == bodies


@given(
    st.integers(0, 2**32 - 1),
    st.integers(0, 2**63 - 1),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=28,
    ),
    st.integers(1, 5),
)
@settings(max_examples=50, deadline=None)
def test_xdr_transaction_round_trip(fee, seq_num, memo, n_ops):
    """A built Transaction decodes back to its inputs for any fee /
    seq / memo / op mix, and the tx hash is stable under re-parse."""
    src = bytes(range(32))
    ops = [
        xc.build_operation(
            xc.OP_PAYMENT if i % 2 == 0 else xc.OP_CREATE_ACCOUNT,
            bytes(range(32, 64)),
            i * 1000 + 1,
            asset_code="KIN" if i % 2 == 0 else None,
            asset_issuer=bytes(range(64, 96)) if i % 2 == 0 else None,
        )
        for i in range(n_ops)
    ]
    tx_bytes = xc.build_transaction(src, fee, seq_num, memo, ops)
    rec = xc.build_transaction_entry(7, [xc.build_envelope(tx_bytes)])
    for _ in range(2):  # hash must be identical across parses
        entries = xc.parse_transactions(
            rec, with_hash=True, network_passphrase="p"
        )
        tx = entries[0]["txSet"]["txs"][0]["tx"]
        assert tx["fee"] == fee
        assert tx["seqNum"] == seq_num
        assert tx["memo"]["text"] == memo
        assert len(tx["operations"]) == n_ops
    h1 = xc.parse_transactions(rec, True, "p")[0]["txSet"]["txs"][0]["hash"]
    h2 = xc.parse_transactions(rec, True, "p")[0]["txSet"]["txs"][0]["hash"]
    assert h1 == h2
    # a different network passphrase must change the hash (domain sep)
    h3 = xc.parse_transactions(rec, True, "q")[0]["txSet"]["txs"][0]["hash"]
    assert h1 != h3


@settings(max_examples=10, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=40),
    right_keys=st.sets(st.integers(min_value=0, max_value=7), max_size=8),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, keys, right_keys, how):
    """For ANY key multiset (including 100%-hot-key skew) and any
    dimension subset, the salted join's multiset of result rows equals
    the plain join's — the salt is pure physical restructuring."""
    from history_collector_spark.functions.skew import salted_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k long, v long"
    )
    right = spark.createDataFrame(
        [(k, f"t{k}") for k in sorted(right_keys)], "k long, tag string"
    )
    plain = sorted(
        (r.k, r.v, r.tag) for r in left.join(right, "k", how).collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(left, right, "k", how).collect()
    )
    assert salted == plain


def test_incremental_sketch_merge_accuracy_and_merge_exactness(spark):
    """The merged (base ∪ delta) sketch must estimate within HLL error
    of the exact distinct, and merging must equal the single-pass
    sketch exactly — HLL union is lossless over the same register
    config, which is precisely why sketches are the rollup currency."""
    from history_collector_spark import registry
    from tests.conftest import TEST_SF_DIR

    registry.load_all()
    pdf = registry.QUERIES["incremental_sketch_merge"](
        spark, TEST_SF_DIR
    ).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        assert r["merged_estimate"] == r["single_pass_estimate"]
        rel = abs(r["merged_estimate"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        assert rel < 0.05, f"{r['event_type']}: rel err {rel}"


# ---------------------------------------------------------------------------
# Exactness properties for the newest algorithmic operators, checked
# against pure-Python re-implementations on hypothesis-generated data.
# ---------------------------------------------------------------------------


def _write_docs_tmp(docs):
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="hc_prop_")
    tbl = pa.table(
        {
            "doc_id": pa.array([x[0] for x in docs], pa.int64()),
            "text": pa.array([x[1] for x in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(x[1]) for x in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


_doc_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=3,
        max_size=8,
    ).map(" ".join),
    min_size=3,
    max_size=7,
)


@settings(max_examples=5, deadline=None)
@given(texts=_doc_texts)
def test_prefix_filter_equals_bruteforce_jaccard(spark, texts):
    """dedup_prefix_filter must return EXACTLY the pairs with trigram
    jaccard >= 0.6 — the prefix candidate stage may never lose a pair
    (the AllPairs completeness guarantee) nor the verify stage invent
    one."""
    import shutil

    from history_collector_spark import registry

    registry.load_all()
    docs = [(i, t) for i, t in enumerate(texts)]
    sf = _write_docs_tmp(docs)
    try:
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in registry.QUERIES["dedup_prefix_filter"](
                spark, sf
            ).collect()
        }
    finally:
        shutil.rmtree(sf, ignore_errors=True)

    def shingles(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    expect = {}
    for i, ti in docs:
        for j, tj in docs:
            if i >= j:
                continue
            si, sj = shingles(ti), shingles(tj)
            if not si or not sj:
                continue
            jac = len(si & sj) / len(si | sj)
            if jac >= 0.6:
                expect[(i, j)] = jac
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


_hh_texts = st.lists(
    st.lists(
        st.sampled_from(
            ["hot1", "hot2"] + [f"w{i}" for i in range(90)]
        ),
        min_size=5,
        max_size=40,
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(texts=_hh_texts)
def test_heavy_hitters_equal_exact_threshold_counts(spark, texts):
    """Misra-Gries + exact verify must return exactly the tokens with
    count > N/30, even when the 92-token vocabulary overflows the
    64-counter summaries (decrement path)."""
    import shutil
    from collections import Counter

    from history_collector_spark import registry

    registry.load_all()
    sf = _write_docs_tmp([(i, t) for i, t in enumerate(texts)])
    try:
        got = {
            r.tok: r.n_occurrences
            for r in registry.QUERIES["heavy_hitter_tokens"](
                spark, sf
            ).collect()
        }
    finally:
        shutil.rmtree(sf, ignore_errors=True)
    counts = Counter(" ".join(texts).split())
    n = sum(counts.values())
    expect = {t: c for t, c in counts.items() if c > n / 30}
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    series=st.lists(
        st.lists(
            st.floats(
                min_value=0, max_value=1000, allow_nan=False
            ),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_ewma_matches_pure_recursion(spark, series):
    """applyInPandas EWMA equals the y_i = a*x_i + (1-a)*y_{i-1}
    recursion for arbitrary per-user series."""
    import datetime as dt
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from history_collector_spark import registry

    registry.load_all()
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, xs in enumerate(series):
        for i, x in enumerate(xs):
            rows.append((eid, base + dt.timedelta(seconds=i), uid, x))
            eid += 1
    d = tempfile.mkdtemp(prefix="hc_prop_")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    try:
        got = {
            r.event_id: r.ewma
            for r in registry.QUERIES["ewma_smoothing"](spark, d).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    eid = 0
    for xs in series:
        y = None
        for x in xs:
            y = x if y is None else 0.2 * x + 0.8 * y
            assert abs(got[eid] - y) < 1e-9 * max(1.0, abs(y))
            eid += 1


def test_countmin_one_sided_error_bound(spark):
    """CMS guarantees: estimate >= exact always (counters only ever
    over-count via collisions), and with d=4 rows the expected
    over-count is bounded — assert the deterministic md5 sketch stays
    within 2 * n / w absolute error on this corpus (loose but real:
    a hashing bug blows straight past it)."""
    from history_collector_spark import registry
    from history_collector_spark.queries.sketches import _CMS_WIDTH
    from tests.conftest import TEST_SF_DIR

    registry.load_all()
    rows = (
        registry.QUERIES["countmin_frequency_audit"](spark, TEST_SF_DIR)
        .collect()
    )
    assert rows
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{TEST_SF_DIR}/events.parquet'"
    ).fetchone()[0]
    for r in rows:
        assert r["cms_estimate"] >= r["exact_cnt"], r
        assert r["cms_estimate"] - r["exact_cnt"] <= 2 * n / _CMS_WIDTH, r


def test_gk_sketch_rank_error_bound(spark):
    """Spark's engine-side GK sketch contract (formerly exercised
    through quantile_sketch_error_audit, which switched to the
    oracle-verifiable sampling sketch in round 12): the achieved rank
    of every percentile_approx estimate is within 1/accuracy of the
    target quantile (plus discretization slack of 1/n)."""
    from pyspark.sql import functions as F

    from history_collector_spark.catalog import table
    from history_collector_spark.queries.sketches import (
        _QS_ACCURACY,
        _QS_QUANTILES,
    )
    from tests.conftest import TEST_SF_DIR

    ev = table(spark, TEST_SF_DIR, "events").select("value")
    row = ev.agg(
        F.percentile_approx(
            "value", list(_QS_QUANTILES), _QS_ACCURACY
        ).alias("approx"),
        F.count("*").alias("n"),
    ).collect()[0]
    n = row["n"]
    for q, est in zip(_QS_QUANTILES, row["approx"]):
        rank = ev.filter(F.col("value") <= est).count() / n
        assert abs(rank - q) <= 1.0 / _QS_ACCURACY + 1.0 / n, (q, est, rank)


def test_sampling_sketch_audit_self_consistent(spark):
    """The md5-sample quantile sketch behind the (now oracle-bearing)
    quantile_sketch_error_audit: every approx value is an actual data
    point, the achieved rank equals the recount, and the rank error
    stays inside the calibrated 3/sqrt(m) envelope for the 1/8
    deterministic sample."""
    from history_collector_spark import registry
    from tests.conftest import TEST_SF_DIR

    registry.load_all()
    rows = registry.QUERIES["quantile_sketch_error_audit"](
        spark, TEST_SF_DIR
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["achieved_rank"] - r["q"]) == r["rank_error"]
        assert r["m"] > 0 and r["m"] < r["n"]
        assert r["rank_error"] <= 3.0 / (r["m"] ** 0.5) + 1.0 / r["n"], (
            dict(r.asDict())
        )


# ---------------------------------------------------------------------------
# Round-9 properties: container framing codecs, the progressive JPEG
# scan machinery, and the streaming minhash signer.
# ---------------------------------------------------------------------------

_warc_payloads = st.lists(st.binary(min_size=0, max_size=400),
                          min_size=1, max_size=8)


@settings(max_examples=25, deadline=None)
@given(payloads=_warc_payloads, gz=st.booleans())
def test_warc_roundtrip_property(payloads, gz):
    from history_collector_spark.sources.warc import parse_warc, write_warc

    recs = [
        {"warc_type": "response", "uri": f"http://x/{i}",
         "date": "2024-01-01T00:00:00Z", "payload": p}
        for i, p in enumerate(payloads)
    ]
    back = parse_warc(write_warc(recs, gzip_members=gz))
    assert [r["payload"] for r in back] == payloads
    assert [r["uri"] for r in back] == [r["uri"] for r in recs]


_tar_names = st.lists(
    st.text(alphabet="abcdefghij/_.0123456789", min_size=1, max_size=60)
    .filter(lambda s: not s.startswith("/") and ".." not in s),
    min_size=1, max_size=8, unique=True,
)


@settings(max_examples=25, deadline=None)
@given(names=_tar_names, data=st.data())
def test_tar_roundtrip_property_and_stdlib_agreement(names, data):
    import io
    import tarfile

    from history_collector_spark.sources.tarball import parse_tar, write_tar

    files = [
        (n, data.draw(st.binary(min_size=0, max_size=1500)))
        for n in names
    ]
    blob = write_tar(files)
    assert parse_tar(blob) == files
    # stdlib must agree on every member
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read())
               for m in tf.getmembers() if m.isfile()]
    assert got == files


@settings(max_examples=8, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    gray=st.booleans(),
)
def test_progressive_jpeg_equals_baseline_property(h, w, seed, gray):
    """For ANY image, the progressive encoding must decode to exactly
    the baseline decoding of the same pixels — they carry identical
    quantized coefficients, so this pins the full scan machinery
    (spectral selection, successive approximation, EOB runs)."""
    import numpy as np

    from history_collector_spark.functions.jpeg import (
        decode_jpeg, encode_jpeg,
    )
    from history_collector_spark.functions.jpeg_progressive import (
        decode_progressive, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.integers(0, 256, size=shape).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px)),
        decode_progressive(encode_jpeg_progressive(px)),
    )


_doc_text = st.text(
    alphabet=st.sampled_from("abc defg \thi\njk "), min_size=0, max_size=300
)


@settings(max_examples=30, deadline=None)
@given(text=_doc_text, doc_id=st.integers(0, 10**6))
def test_streaming_signer_matches_batch_minhash_property(text, doc_id):
    """The map-only Python signer must agree with an independent
    recomputation of the dedup.py minhash math (md5 shingle hashes,
    affine family, banded buckets) for arbitrary whitespace-messy
    text, including the <3-token empty case."""
    import hashlib
    import re

    from history_collector_spark.functions.nlp import MH_PRIME, mh_consts
    from history_collector_spark.queries.neardup_stream import (
        N_BANDS, N_HASHES, doc_signature_buckets,
    )

    rows = doc_signature_buckets(doc_id, text)
    toks = re.split(r"\s+", text)
    if len(toks) < 3:
        assert rows == []
        return
    grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    A, B = mh_consts(N_HASHES)
    mins = [min((A[s] * h + B[s]) % MH_PRIME for h in hs)
            for s in range(N_HASHES)]
    exp = [
        (doc_id, j,
         hashlib.md5(f"{mins[2 * j]}_{mins[2 * j + 1]}".encode()).hexdigest())
        for j in range(N_BANDS)
    ]
    assert rows == exp
