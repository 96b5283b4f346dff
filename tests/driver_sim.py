#!/usr/bin/env python
"""Simulate the external round driver against __spark_entry__.py.

The driver supplies its OWN vanilla SparkSession (none of our session.py
configs) and compares every queries() entry against its oracle_sql() twin
at sf0.01. Running this catches two failure classes pytest can miss:
configs that only exist in our session factory, and testdata vintage
changes (the round-3 regression: events.ts moved from INT64 nanos to
timestamp[us] between rounds with zero code changes).

Exit code is non-zero on any mismatch, so `make check` is ship-blocking.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_compare import assert_frames_match  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_entry = len(entry_mod.entry(spark).collect())
    print(f"entry() rows: {n_entry}")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    ok, failed = 0, []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                # parity = the driver's hash contract (round-6 then exact,
                # complex-typed columns rejected), strictly harder than the
                # suite's 1e-6 tolerance. Round-13 lesson: parity must also
                # match the driver's CANONICALIZER, not just its hash — list
                # columns were locally green (tuple-ized) yet driver-red.
                assert_frames_match(
                    sdf, con.sql(oracles[name]).df(), name=name, mode="parity"
                )
            ok += 1
        except Exception as exc:
            failed.append(name)
            print(f"{name} FAIL {str(exc)[:200]}")
    print(f"RESULT: {ok} ok, {len(failed)} fail")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
