"""Isolated per-query measurement for the optimization rounds.

Runs the named queries through the noop sink (guide §1.4) min-of-N in
one warm session, labelling each job (guide §1.5), and optionally dumps
``explain("formatted")`` next to the timing so plan claims in
OPTIMIZATION_r*.md are reproducible.

Usage:
  python tools/opt_measure.py [--reps 3] [--plans plans/r15 --suffix before] q1 q2 ...

Timing methodology matches bench.py (same noop sink, same sf dir env),
so numbers here are comparable to BENCH_FULL rows measured in the same
session class; cross-session comparisons must re-measure both sides.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.session import get_spark  # noqa: E402
from history_collector_spark import registry  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before", help="plan filename suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hcs-opt-measure")
    registry.load_all()
    spark.range(1).count()  # JVM warm-up

    out: dict[str, dict] = {}
    for name in args.names:
        fn = registry.QUERIES[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "all": times}
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
