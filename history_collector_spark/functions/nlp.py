"""Text/hash building blocks shared by the dedup, text and similarity
operators. Everything is built from Catalyst expressions (no Python in
the row path) and every hash is md5-derived so DuckDB oracles can
reproduce bit-identical values.

A hard-won plan note: interpreted higher-order functions (transform/
aggregate/filter) get NO common-subexpression elimination — a lambda
body that references an outer expression (e.g. ``element_at(split(text),
i)``) re-evaluates that expression per array element. Shingling is
therefore done relationally (posexplode + window lead, whole-stage
codegen) in ``shingle_rows``, never with a lambda over an index
sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, WS_SPLIT)


def shingle_rows(docs: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """Word k-gram shingles as ROWS: (doc_id, lang, g).

    posexplode + window lead keeps every step in whole-stage codegen
    (one doc_id-partitioned sort) — the per-row array formulation
    re-evaluated the tokenizing split once per element inside an
    interpreted lambda. Docs with < k tokens produce no rows, matching
    the empty-shingle-set semantics.

    ``distinct=True`` dedups repeated shingles — required when the
    consumer COUNTS rows (inverted-index Jaccard, decontamination
    overlap). Pass ``distinct=False`` for duplicate-insensitive
    consumers (min-hash aggregates, collect_set): it skips a full
    (doc_id, g)-keyed exchange of the shingle text, and a downstream
    groupBy(doc_id) then reuses the window's doc_id partitioning
    instead of re-shuffling.
    """
    toks = docs.select(
        "doc_id", "lang", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(w).alias(f"t{j}") for j in range(1, k)]
    sh = toks.select("doc_id", "lang", "tok", *leads).filter(
        F.col(f"t{k - 1}").isNotNull()
    )
    g = F.concat_ws(" ", "tok", *[f"t{j}" for j in range(1, k)])
    out = sh.select("doc_id", "lang", g.alias("g"))
    return out.distinct() if distinct else out


def md5_hash32(value: Column) -> Column:
    """First 32 bits of md5 as a non-negative long — the one hash both
    Spark and DuckDB compute identically
    (DuckDB: CAST(concat('0x', substr(md5(v), 1, 8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")


# Affine minhash family: hash each shingle ONCE (md5 -> 32-bit h), then
# derive the i-th hash as (A[i]*h + B[i]) mod P. One md5 per shingle
# instead of one per (shingle, seed) — 32x less hashing at identical
# determinism (the DuckDB oracle reproduces the same integers exactly).
# A[i] < 2^20 keeps A[i]*h < 2^52, safely inside a signed 64-bit long.
MH_PRIME = 2147483647  # 2^31 - 1


def mh_consts(n: int) -> tuple[list[int], list[int]]:
    a = [((i * 2654435761) % 1048573) | 1 for i in range(n)]
    b = [(i * 1013904223 + 12345) % MH_PRIME for i in range(n)]
    return a, b


def affine_hash(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod P over a non-negative 32-bit long column."""
    return (F.lit(a).cast("long") * h + F.lit(b)) % F.lit(MH_PRIME)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two numeric arrays (JVM-side).

    zip_with evaluates its array arguments once, so this stays linear;
    it is interpreted (HOF), which is fine for dim-64 vectors — the
    all-pairs hot path uses numpy via mapInPandas instead
    (dedup_embedding_cosine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))
