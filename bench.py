#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query is fully materialized through the noop sink (not .count(),
which would let Catalyst prune every column and skip the real work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from history_collector_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="hcs-bench")
    qs = entry_mod.queries()

    # warm the JVM, parquet footers, and OS page cache so the first
    # query measured doesn't absorb every cold-start cost
    spark.range(1).count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            from history_collector_spark.catalog import table as _table
            _table(spark, sf_dir, t).count()
        except Exception:
            pass

    times: dict[str, float] = {}
    total = 0.0
    for name in sorted(qs):
        try:
            dt = run_one(spark, qs[name], sf_dir)
        except Exception as exc:  # a broken query should not zero the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            dt = float("nan")
        else:
            total += dt
        times[name] = round(dt, 4)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
