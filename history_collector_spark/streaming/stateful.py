"""Custom stateful streaming operators — applyInPandasWithState.

The reference's strictest semantics is gapless, in-order sequencing:
it will sleep and retry rather than process file N+128 before N+64
(stall-don't-skip, python/main.py:88-105, 286-293). Batch-side we
enforce it with a plan-level assertion (sources/xdr.py:assert_gapless);
stream-side it becomes a per-key stateful operator: arrivals buffer in
state and are RELEASED only in contiguous sequence order. Out-of-order
arrivals wait in state until the gap fills — exactly the reference's
behavior, but per-key parallel and restart-safe (state lives in the
streaming state store under checkpointLocation).

State must stay bounded at 100 TB: it holds only (expected_next,
pending-sequence list), never data rows — the payload flows through
the normal exactly-once sink; this operator only gates/flags sequence
progress.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LEDGERS_PER_FILE = 64

RELEASE_SCHEMA = StructType(
    [
        StructField("stream_id", StringType()),
        StructField("seq", LongType()),
        StructField("status", StringType()),  # 'ok' | 'duplicate'
    ]
)

# pending is serialized compactly (csv of ints) — state rows should be
# tiny and flat; the state store checkpoints them per micro-batch.
STATE_SCHEMA = StructType(
    [
        StructField("expected_next", LongType()),
        StructField("pending", StringType()),
    ]
)


def make_gapless_tracker(start_seq: int, step: int = LEDGERS_PER_FILE):
    """Build the per-group state function: release contiguous sequences
    in order, buffer ahead-of-gap arrivals, flag replays."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            expected, pending_csv = state.get
            pending = [int(x) for x in pending_csv.split(",")] if pending_csv else []
        else:
            expected, pending = start_seq, []

        out: list[tuple[Any, int, str]] = []
        for pdf in pdfs:
            for s in pdf["seq"]:
                s = int(s)
                if s < expected or s in pending:
                    out.append((key[0], s, "duplicate"))
                else:
                    pending.append(s)
        pending.sort()
        while pending and pending[0] == expected:
            out.append((key[0], pending.pop(0), "ok"))
            expected += step

        state.update((expected, ",".join(str(x) for x in pending)))
        if out:
            yield pd.DataFrame(out, columns=["stream_id", "seq", "status"])

    return track


def track_gapless(
    stream: DataFrame, start_seq: int, step: int = LEDGERS_PER_FILE
) -> DataFrame:
    """stream(stream_id string, seq long) -> released rows, in gapless
    order per stream_id. Restart with the same checkpointLocation
    resumes the buffered state."""
    return stream.groupBy("stream_id").applyInPandasWithState(
        make_gapless_tracker(start_seq, step),
        outputStructType=RELEASE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: carry the per-key smoothed value across micro-batches.
# ---------------------------------------------------------------------------

EWMA_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

# r16: state is held per SHARD (shard = user_id % n_shards, computed
# JVM-side), not per user. applyInPandasWithState dispatches one Python
# call — with its own pandas concat/sort/frame-build — PER KEY PER
# BATCH; at 1500 user keys that per-group overhead (~1.5 ms each) was
# ~2.5 s of every micro-batch's addBatch (measured r16, sf0.1). With a
# few hundred shards the dispatch count drops two orders of magnitude
# while every per-user float sequence stays IDENTICAL: rows are
# processed in (ts, event_id) order within the shard, so each user's
# subsequence is exactly the order the per-user keying produced, and
# the recursion state lives in a per-shard dict. State volume is
# unchanged (one double per user, now packed into shard arrays).
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ys", ArrayType(DoubleType())),
    ]
)


def make_ewma_tracker(alpha: float):
    """Shard-keyed streaming EWMA: y_i = alpha*x_i + (1-alpha)*y_{i-1}
    per user, seeded from shard state (or the user's first
    observation). Requires event-time-ordered arrival ACROSS batches
    (the feed must be time-partitioned, as a watermarked upstream
    ensures); within a batch rows are sorted by (ts, event_id) before
    folding, which preserves every user's per-row order."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            users, ys = state.get
            mem = dict(zip(users, ys))
        else:
            mem = {}
        # a group's batch rows can arrive as MULTIPLE Arrow chunks with
        # no cross-chunk ordering — materialize the (bounded per-shard
        # per-batch) rows and sort once
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        out_ids, out_us, out_y = [], [], []
        for eid, u, x in zip(pdf["event_id"], pdf["user_id"], pdf["value"]):
            u = int(u)
            y = mem.get(u)
            y = float(x) if y is None else alpha * float(x) + (1 - alpha) * y
            mem[u] = y
            out_ids.append(int(eid))
            out_us.append(u)
            out_y.append(y)
        if out_ids:
            yield pd.DataFrame(
                {"event_id": out_ids, "user_id": out_us, "ewma": out_y}
            )
        if mem:
            state.update((list(mem.keys()), list(mem.values())))

    return track


def _with_shard(stream: DataFrame, n_shards: int | None) -> DataFrame:
    """Attach the shard key (user_id % n_shards) JVM-side. Shard count
    defaults to 4x cluster parallelism — enough distinct keys to hash
    evenly over the state partitions (guide §2.5) on any cluster
    shape, and a fixed constant for the lifetime of one query run (the
    state keying must be stable across its micro-batches)."""
    from pyspark.sql import functions as F

    n = n_shards or 4 * stream.sparkSession.sparkContext.defaultParallelism
    return stream.withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(n)).cast("long")
    )


def track_ewma(
    stream: DataFrame, alpha: float, n_shards: int | None = None
) -> DataFrame:
    """stream(event_id, ts, user_id, value) -> per-event EWMA with the
    smoothing memory held in the state store (one double per user,
    packed per shard)."""
    return _with_shard(stream, n_shards).groupBy("shard").applyInPandasWithState(
        make_ewma_tracker(alpha),
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming z-score: Welford running moments per key; each arrival is
# judged against the statistics of its PAST only.
# ---------------------------------------------------------------------------

ZSCORE_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("z", DoubleType()),
    ]
)

# Welford sufficient statistics: (n, mean, M2) — three numbers per
# user, packed into shard arrays (see the EWMA shard note above).
ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("means", ArrayType(DoubleType())),
        StructField("m2s", ArrayType(DoubleType())),
    ]
)


def make_zscore_tracker():
    """Shard-keyed streaming z-score: each row scores against its
    user's prior state's sample mean/std (None until 2 observations,
    or while the history is constant), THEN folds itself in via
    Welford's update — numerically stable and exactly mergeable with
    the batch prefix-window formulation. Per-user arithmetic order is
    identical to per-user keying (rows processed in (ts, event_id)
    order within the shard)."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            users, ns, means, m2s = state.get
            mem = {u: (n, m, q) for u, n, m, q in zip(users, ns, means, m2s)}
        else:
            mem = {}
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        out_ids, out_us, out_z = [], [], []
        for eid, u, x in zip(pdf["event_id"], pdf["user_id"], pdf["value"]):
            u = int(u)
            n, mean, m2 = mem.get(u, (0, 0.0, 0.0))
            x = float(x)
            if n >= 2 and m2 > 0:
                z = (x - mean) / math.sqrt(m2 / (n - 1))
            else:
                z = None
            out_ids.append(int(eid))
            out_us.append(u)
            out_z.append(z)
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
            mem[u] = (n, mean, m2)
        if out_ids:
            yield pd.DataFrame(
                {"event_id": out_ids, "user_id": out_us, "z": out_z}
            )
        if mem:
            state.update(
                (
                    list(mem.keys()),
                    [int(v[0]) for v in mem.values()],
                    [float(v[1]) for v in mem.values()],
                    [float(v[2]) for v in mem.values()],
                )
            )

    return track


def track_zscore(stream: DataFrame, n_shards: int | None = None) -> DataFrame:
    """stream(event_id, ts, user_id, value) -> prior-history z-score
    per event, with three numbers per user in the state store."""
    return _with_shard(stream, n_shards).groupBy("shard").applyInPandasWithState(
        make_zscore_tracker(),
        outputStructType=ZSCORE_OUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Page-Hinkley drift detection: a four-number concept-drift
# monitor per key that survives micro-batches in the state store.
# ---------------------------------------------------------------------------

PH_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ph", DoubleType()),
        StructField("drift", BooleanType()),
    ]
)

# (n, running sum, cumulative deviation m_t, min m_t) per user,
# packed into shard arrays (see the EWMA shard note above).
PH_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("sumvs", ArrayType(DoubleType())),
        StructField("mts", ArrayType(DoubleType())),
        StructField("minms", ArrayType(DoubleType())),
    ]
)


def make_page_hinkley_tracker(delta: float, lam: float):
    """Per-key streaming Page-Hinkley test (Page 1954; the standard
    data-stream drift monitor, cf. Gama et al. 2014 survey §3.2):
    maintain m_t = sum_{i<=t} (x_i - mean_i - delta) where mean_i is
    the running mean INCLUDING x_i, and raise drift when
    m_t - min_{j<=t} m_j > lambda — an upward level shift makes the
    deviations stop hugging zero and m_t climb away from its minimum.

    The mean is kept as sum/count (NOT Welford) so each emitted ph
    equals the batch prefix-window formulation operation-for-operation
    — the oracle in xstream.streaming_page_hinkley_e2e restates the
    same arithmetic with two stacked cumulative windows."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            users, ns, sumvs, mts, minms = state.get
            mem = {
                u: (n, sv, mt, mn)
                for u, n, sv, mt, mn in zip(users, ns, sumvs, mts, minms)
            }
        else:
            mem = {}
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        out_ids, out_us, out_ph, out_drift = [], [], [], []
        for eid, u, x in zip(pdf["event_id"], pdf["user_id"], pdf["value"]):
            u = int(u)
            n, sumv, mt, minm = mem.get(u, (0, 0.0, 0.0, None))
            x = float(x)
            n += 1
            sumv += x
            mean = sumv / n
            mt += x - mean - delta
            minm = mt if minm is None else min(minm, mt)
            ph = mt - minm
            out_ids.append(int(eid))
            out_us.append(u)
            out_ph.append(ph)
            out_drift.append(ph > lam)
            mem[u] = (n, sumv, mt, minm)
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": out_us,
                    "ph": out_ph,
                    "drift": out_drift,
                }
            )
        if mem:
            state.update(
                (
                    list(mem.keys()),
                    [int(v[0]) for v in mem.values()],
                    [float(v[1]) for v in mem.values()],
                    [float(v[2]) for v in mem.values()],
                    [float(v[3]) for v in mem.values()],
                )
            )

    return track


def track_page_hinkley(
    stream: DataFrame, delta: float, lam: float, n_shards: int | None = None
) -> DataFrame:
    """stream(event_id, ts, user_id, value) -> Page-Hinkley drift
    statistic per event, four numbers per user in the state store."""
    return _with_shard(stream, n_shards).groupBy("shard").applyInPandasWithState(
        make_page_hinkley_tracker(delta, lam),
        outputStructType=PH_OUT_SCHEMA,
        stateStructType=PH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters: a bounded top-k counter set per
# key that survives micro-batches in the state store.
# ---------------------------------------------------------------------------

MG_CAPACITY = 8

MG_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("n_seen", LongType()),
    ]
)

# counters serialized flat: csv of ids / csv of counts + total processed
MG_STATE_SCHEMA = StructType(
    [
        StructField("ids", StringType()),
        StructField("counts", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def make_mg_tracker(capacity: int = MG_CAPACITY):
    """Per-key streaming Misra-Gries: at most `capacity` counters per
    key, decrement-all on overflow. Guarantees after n arrivals:
    est <= true, true - est <= n/(capacity+1), and every id with
    true count > n/(capacity+1) holds a counter — the classical
    deterministic heavy-hitter summary, here carried across
    micro-batches in O(capacity) state bytes per key. Each batch emits
    the key's CURRENT summary stamped with n_seen; the consumer keeps
    the max-n_seen snapshot (see xstream.streaming_topk_e2e)."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids_s, counts_s, n_seen = state.get
            counters = dict(
                zip(
                    (int(x) for x in ids_s.split(",") if x),
                    (int(x) for x in counts_s.split(",") if x),
                )
            )
        else:
            counters, n_seen = {}, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for uid in pdf["user_id"]:
            uid = int(uid)
            n_seen += 1
            if uid in counters:
                counters[uid] += 1
            elif len(counters) < capacity:
                counters[uid] = 1
            else:
                counters = {
                    k: c - 1 for k, c in counters.items() if c - 1 > 0
                }
        if counters:
            yield pd.DataFrame(
                {
                    "event_type": key[0],
                    "user_id": list(counters),
                    "est_count": list(counters.values()),
                    "n_seen": n_seen,
                }
            )
        state.update(
            (
                ",".join(str(k) for k in counters),
                ",".join(str(c) for c in counters.values()),
                int(n_seen),
            )
        )

    return track


def track_heavy_hitters(stream: DataFrame, capacity: int = MG_CAPACITY) -> DataFrame:
    """stream(event_id, ts, event_type, user_id) -> per-batch
    Misra-Gries snapshots per event_type; O(capacity) state per key."""
    return stream.groupBy("event_type").applyInPandasWithState(
        make_mg_tracker(capacity),
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming HyperLogLog: the canonical MERGEABLE sketch carried through
# the state store — per shard, 64 integer registers max-merge with each
# micro-batch. Because max is commutative/associative/idempotent, the
# final registers are bit-identical to a batch build over the same
# rows, whatever the batch boundaries — which is exactly what the e2e
# query's oracle asserts.
# ---------------------------------------------------------------------------

HLL_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("upd", LongType()),
        StructField("bucket", LongType()),
        StructField("r", LongType()),
    ]
)

HLL_STATE_SCHEMA = StructType(
    [
        StructField("upd", LongType()),
        StructField("regs", ArrayType(LongType())),
    ]
)


def make_hll_tracker(m: int):
    """Per-shard register state: one numpy max-scatter per Arrow batch
    (vectorized — no per-row Python), emitting the full register
    vector after every update so the consumer can read the final state
    per shard (max upd) and audit monotone growth across batches."""

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            upd, regs = state.get
            regs = np.asarray(regs, dtype=np.int64)
        else:
            upd, regs = 0, np.zeros(m, dtype=np.int64)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        np.maximum.at(
            regs,
            pdf["bucket"].to_numpy(dtype=np.int64),
            pdf["rho"].to_numpy(dtype=np.int64),
        )
        upd += 1
        state.update((upd, [int(x) for x in regs]))
        yield pd.DataFrame(
            {
                "shard": int(key[0]),
                "upd": upd,
                "bucket": np.arange(m, dtype=np.int64),
                "r": regs,
            }
        )

    return track


def track_hll(stream: DataFrame, m: int = 64) -> DataFrame:
    """stream(shard, bucket, rho) -> per-shard register emissions."""
    return stream.groupBy("shard").applyInPandasWithState(
        make_hll_tracker(m),
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
