#!/usr/bin/env python
"""Float-hash stability audit: for every oracle-bearing query, measure whether
the Spark result and the DuckDB oracle result are EXACTLY equal (bit-level,
after dtype normalization) — the external driver's hash contract — not merely
equal at the 1e-6 tolerance the local suite uses.

Output: one line per query with float columns —
  name  EXACT | DRIFT(maxabs=..., nrows=...) | ERROR
plus a summary. Queries with no float output columns are skipped (non-float
columns are already compared exactly by the tolerance mode).

Usage: python tests/float_audit.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_compare import _normalize, _sortable  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def audit_one(name, fn, sql, spark, con, sf_dir):
    sdf = _sortable(_normalize(fn(spark, sf_dir).toPandas()))
    odf = _sortable(_normalize(con.sql(sql).df()))
    float_cols = [
        c for c in sdf.columns
        if pd.api.types.is_float_dtype(sdf[c]) and pd.api.types.is_float_dtype(odf[c])
    ]
    if not float_cols:
        return None
    worst = 0.0
    nbad = 0
    nflip = 0
    for c in float_cols:
        an = sdf[c].fillna(np.nan).to_numpy(dtype="float64")
        bn = odf[c].fillna(np.nan).to_numpy(dtype="float64")
        if len(an) != len(bn):
            return ("ROWMISMATCH", len(an), len(bn), 0)
        eq = (an == bn) | (np.isnan(an) & np.isnan(bn))
        if not eq.all():
            nbad += int((~eq).sum())
            with np.errstate(invalid="ignore"):
                d = np.nanmax(np.abs(an - bn))
            worst = max(worst, float(d))
        # driver-parity criterion: equal after round-6 (boundary flips red)
        aq, bq = np.round(an, 6), np.round(bn, 6)
        peq = (aq == bq) | (np.isnan(aq) & np.isnan(bq))
        nflip += int((~peq).sum())
    if nbad == 0:
        return ("EXACT", 0, 0, 0)
    return ("FLIP" if nflip else "DRIFT", worst, nbad, nflip)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("float-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    drift, exact, nofloat, errors = [], [], [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            r = audit_one(name, qs[name], oracles[name], spark, con, sf_dir)
        except Exception as exc:
            errors.append(name)
            print(f"{name:45s} ERROR {str(exc)[:120]}", flush=True)
            continue
        if r is None:
            nofloat.append(name)
        elif r[0] == "EXACT":
            exact.append(name)
            print(f"{name:45s} EXACT", flush=True)
        else:
            drift.append((name, r[0], r[1], r[2], r[3]))
            print(
                f"{name:45s} {r[0]} maxabs={r[1]:.3g} rows={r[2]} "
                f"round6_flips={r[3]}",
                flush=True,
            )
    flips = [t for t in drift if t[4]]
    print(
        f"\nSUMMARY: {len(exact)} exact, {len(drift)} drift "
        f"({len(flips)} with round-6 flips = driver-RED), "
        f"{len(nofloat)} no-float, {len(errors)} error"
    )
    for name, kind, d, n, fl in sorted(drift, key=lambda t: (-t[4], -t[2])):
        print(f"  {kind} {name}: maxabs={d:.3g} rows={n} flips={fl}")
    return 1 if flips or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
