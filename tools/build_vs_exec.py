"""Split each query's wall time into DataFrame BUILD (Python-side plan
construction incl. any eager builder jobs) vs EXECUTE (noop write).

Usage: python tools/build_vs_exec.py [names...]   # default: all
Prints one JSON line per query and a sorted summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.session import get_spark  # noqa: E402
from history_collector_spark import registry  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hcs-build-vs-exec")
    registry.load_all()
    spark.range(1).count()
    names = sys.argv[1:] or sorted(registry.QUERIES)
    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
        except Exception as exc:
            print(json.dumps({"name": name, "err": str(exc)[:120]}), flush=True)
            continue
        rows.append((name, round(t1 - t0, 4), round(t2 - t1, 4)))
        print(json.dumps({"name": name, "build": rows[-1][1],
                          "exec": rows[-1][2]}), flush=True)
    rows.sort(key=lambda r: -r[1])
    print("== top by BUILD time ==", file=sys.stderr)
    for name, b, e in rows[:40]:
        print(f"{b:8.3f} build {e:8.3f} exec  {name}", file=sys.stderr)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"TOTAL build {tb:.1f}s exec {te:.1f}s over {len(rows)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
