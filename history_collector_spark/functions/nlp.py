"""Text/hash building blocks shared by the dedup, text and similarity
operators. Everything is built from Catalyst expressions (no Python in
the row path) and every hash is md5-derived so DuckDB oracles can
reproduce bit-identical values.

A hard-won plan note: interpreted higher-order functions (transform/
aggregate/filter) get NO common-subexpression elimination — a lambda
body that INLINES an outer expression (e.g. ``element_at(split(text),
i)``) re-evaluates that expression per array element. ``shingle_rows``
therefore materializes the token array in its own projection first and
lets the lambda reference the bound column — map-only shingling with
O(1) element access, no exchange (measured 3x over the earlier
posexplode + window-lead formulation, which shuffled every token row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, WS_SPLIT)


def shingle_rows(docs: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """Word k-gram shingles as ROWS: (doc_id, lang, g).

    MAP-ONLY: tokenize once into a materialized array column, then a
    transform-over-indices lambda assembles the k-grams and explodes.
    Because the lambda references the PROJECTED array (a bound column),
    each element access is O(1) — the re-evaluation trap only bites when
    the array-producing expression (``split(text)``) is inlined in the
    lambda body, so it stays in its own projection. This removed the
    previous formulation's corpus-wide doc_id exchange + sort (window
    lead over posexploded tokens): at 100 TB that was a full shuffle of
    every token row; now shingling costs zero exchanges and downstream
    doc_id aggregates get map-side partial aggregation instead of
    riding a pre-shuffled layout.

    Docs with < k tokens produce no rows (the when() guard — naked
    ``sequence(0, size-k)`` would generate a DESCENDING sequence when
    size < k), matching the empty-shingle-set semantics.

    ``distinct=True`` dedups repeated shingles — required when the
    consumer COUNTS rows (inverted-index Jaccard, decontamination
    overlap). Deduplication is per-document, so it is ROW-LOCAL:
    ``array_distinct`` on the shingle array before the explode, never a
    corpus-wide ``.distinct()`` exchange (measured: the exchange was
    the dominant cost of every distinct-consuming query at 100x —
    shuffling all shingle rows to dedup what each row can dedup
    itself). Both modes are exchange-free.
    """
    t = docs.select("doc_id", "lang", tokens(F.col("text")).alias("t"))
    idx = F.when(
        F.size("t") >= k, F.sequence(F.lit(1), F.size("t") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    g = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("t", i + j) for j in range(k)]
        ),
    )
    if distinct:
        g = F.array_distinct(g)
    return t.select("doc_id", "lang", F.explode(g).alias("g"))


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
