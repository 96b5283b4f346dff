"""Streaming near-dup dedup: unit contracts beneath the e2e oracle.

The driver-gated oracle proves the full stream equals the batch LSH
pair table; these tests pin the pieces that make that equality hold —
the map-only Python signer must be bit-identical to the batch
(shingle-rows + 32-min-agg) formulation, and the keyed bucket state
must pair exactly-once per key with bounded membership state.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from history_collector_spark.queries.neardup_stream import (
    _bucket_pair_tracker,
    doc_signature_buckets,
    signature_stream,
)
from tests.conftest import TEST_SF_DIR


def test_python_signer_matches_batch_lsh_formulation(spark):
    """Every (doc_id, band, bucket) row from the Arrow signer equals
    the batch 32-min-agg build over the same docs — the bit-equality
    that lets the stream probe a batch-built index."""
    from history_collector_spark.catalog import table
    from history_collector_spark.queries.dedup import _lsh_buckets

    docs = (
        table(spark, TEST_SF_DIR, "documents")
        .select("doc_id", "lang", "text")
        .limit(200)
        .persist()
    )
    batch = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in _lsh_buckets(
            spark, TEST_SF_DIR,
            __import__(
                "history_collector_spark.functions.nlp", fromlist=["x"]
            ).shingle_rows(docs, distinct=False),
        ).collect()
    }
    streamed = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in signature_stream(docs.select("doc_id", "text")).collect()
    }
    docs.unpersist()
    assert streamed == batch
    assert len(streamed) > 0


def test_signer_edge_cases():
    # < 3 tokens -> no shingles -> no bucket rows (batch empty-group)
    assert doc_signature_buckets(1, "one two") == []
    assert doc_signature_buckets(2, "") == []
    rows = doc_signature_buckets(3, "a b c d")
    assert len(rows) == 16
    assert [r[1] for r in rows] == list(range(16))
    # deterministic: same text, same buckets
    assert rows == doc_signature_buckets(3, "a b c d")


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_bucket_pair_tracker_exactly_once_and_bounded():
    st = _FakeState()
    b1 = pd.DataFrame({"doc_id": [3, 1]})
    (out1,) = _bucket_pair_tracker(("0", "x"), iter([b1]), st)
    # in-batch pair, emitted once, normalized (a < b)
    assert sorted(zip(out1["doc_a"], out1["doc_b"])) == [(1, 3)]
    b2 = pd.DataFrame({"doc_id": [5]})
    (out2,) = _bucket_pair_tracker(("0", "x"), iter([b2]), st)
    # new doc pairs with BOTH prior members, no re-emission of (1,3)
    assert sorted(zip(out2["doc_a"], out2["doc_b"])) == [(1, 5), (3, 5)]
    # state holds doc_ids only (bounded by bucket membership)
    assert sorted(st.get[0]) == [1, 3, 5]


def test_bucket_tracker_ttl_eviction():
    """ttl_ms > 0: a timed-out bucket drops its member list — the
    bounded-state mode a forever-running ingest uses. Simulated via
    the GroupState protocol (hasTimedOut batch, then fresh arrivals)."""
    from history_collector_spark.queries.neardup_stream import (
        make_bucket_pair_tracker,
    )

    class _TtlState(_FakeState):
        def __init__(self):
            super().__init__()
            self.hasTimedOut = False
            self.timeout_set = None
            self.removed = False

        def remove(self):
            self.removed = True
            self.exists = False
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    track = make_bucket_pair_tracker(ttl_ms=1000)
    st = _TtlState()
    (out1,) = track(("0", "x"), iter([pd.DataFrame({"doc_id": [1, 3]})]), st)
    assert sorted(zip(out1["doc_a"], out1["doc_b"])) == [(1, 3)]
    assert st.timeout_set == 1000
    # timeout fires: state evicted, nothing emitted
    st.hasTimedOut = True
    (out2,) = track(("0", "x"), iter([]), st)
    assert len(out2) == 0 and st.removed and not st.exists
    # post-eviction arrival pairs only within itself (history gone)
    st.hasTimedOut = False
    (out3,) = track(("0", "x"), iter([pd.DataFrame({"doc_id": [5]})]), st)
    assert len(out3) == 0
    assert list(st.get[0]) == [5]
