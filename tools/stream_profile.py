"""Profile a streaming e2e query: wall time split into feed build,
stream run, and per-batch durationMs from StreamingQuery progress.

Usage: python tools/stream_profile.py <query> [reps]
Monkeypatches awaitTermination bookkeeping by reading the active
query's recentProgress right before stop() via a listener.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from history_collector_spark.session import get_spark  # noqa: E402
from history_collector_spark import registry  # noqa: E402


class Capture(StreamingQueryListener):
    def __init__(self):
        self.progress = []

    def onQueryStarted(self, event):
        self.progress.append(("start", time.perf_counter(), None))

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append(
            ("batch", time.perf_counter(), json.loads(p.json))
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.progress.append(("end", time.perf_counter(), None))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hcs-stream-profile")
    registry.load_all()
    spark.range(1).count()
    cap = Capture()
    spark.streams.addListener(cap)
    for rep in range(reps):
        cap.progress.clear()
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(f"rep{rep}: fn={t1-t0:.3f}s sink={t2-t1:.3f}s")
        tprev = None
        for kind, ts, payload in cap.progress:
            if kind == "start":
                tprev = ts
                print(f"  start at +0")
            elif kind == "batch" and payload is not None:
                dur = payload.get("durationMs", {})
                rows = payload.get("numInputRows")
                print(
                    f"  batch {payload.get('batchId')}: wall "
                    f"{(ts - tprev) if tprev else -1:.3f}s rows={rows} "
                    f"durationMs={dur}"
                )
                tprev = ts
            elif kind == "end":
                print(f"  terminated (+{ts - tprev:.3f}s after last batch)"
                      if tprev else "  terminated")


if __name__ == "__main__":
    main()
