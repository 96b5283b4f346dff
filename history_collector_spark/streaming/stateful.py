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
