"""Dump explain("formatted") for named queries WITHOUT timing them.

Usage: python tools/dump_plans.py --plans plans/r16 --suffix before q1 q2 ...

Building the DataFrame may run a query's eager builder jobs but never
materializes the result — cheap enough to run alongside other work.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from history_collector_spark.session import get_spark  # noqa: E402
from history_collector_spark import registry  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", required=True)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hcs-dump-plans")
    registry.load_all()
    os.makedirs(args.plans, exist_ok=True)
    for name in args.names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
