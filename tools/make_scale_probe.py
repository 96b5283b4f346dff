"""Materialize a synthetic ~10x scale factor (sf1) from sf0.1 for the
measured-slope probe in SCALING.md.

Fact tables (orders, lineitem, events, documents, embeddings) are
unioned 10x with consistently offset primary keys (o_orderkey offsets
apply to BOTH orders and lineitem, so joins stay FK-consistent);
dimensions (region, nation, customer, supplier, part) copy as-is, so
per-dimension fan-in grows 10x — the same shape real growth has.
Text/embedding payloads repeat verbatim: exact-dup groups of 10 are a
fine (even adversarial) timing input for the dedup family.
"""

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_probe/sf1"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

for t in ("region", "nation", "customer", "supplier", "part"):
    con.sql(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'"
    )

def span(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]

ORD = span("orders", "o_orderkey")
DOC = span("documents", "doc_id")
VEC = span("embeddings", "vec_id")
EVT = span("events", "event_id")

def replicate(table, out_cols):
    selects = " UNION ALL ".join(
        f"SELECT {out_cols.format(k=k)} FROM '{SRC}/{table}.parquet'"
        for k in range(COPIES)
    )
    con.sql(f"COPY ({selects}) TO '{DST}/{table}.parquet'")

replicate(
    "orders",
    "o_orderkey + {k} * " + str(ORD)
    + " AS o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
    " o_orderdate, o_orderpriority",
)
replicate(
    "lineitem",
    "l_orderkey + {k} * " + str(ORD)
    + " AS l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,"
    " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
    " l_shipdate",
)
replicate(
    "events",
    "event_id + {k} * " + str(EVT)
    + " AS event_id, ts, user_id, event_type, value, props",
)
replicate(
    "documents",
    "doc_id + {k} * " + str(DOC)
    + " AS doc_id, text, lang, source, n_chars",
)
replicate(
    "embeddings",
    "vec_id + {k} * " + str(VEC) + " AS vec_id, embedding, label",
)
print("sf1 probe data at", DST)
for t in ("orders", "lineitem", "events", "documents", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
