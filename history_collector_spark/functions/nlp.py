"""Text/hash building blocks shared by the dedup, text and similarity
operators. Everything is built from Catalyst expressions (no Python in
the row path) and every hash is md5-derived so DuckDB oracles can
reproduce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, WS_SPLIT)


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined); empty for short docs."""
    toks = tokens(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def md5_hash32(value: Column) -> Column:
    """First 32 bits of md5 as a non-negative long — the one hash both
    Spark and DuckDB compute identically
    (DuckDB: CAST(concat('0x', substr(md5(v), 1, 8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")


def seeded_hash32(seed: int, value: Column) -> Column:
    """Seed-family variant: md5('{seed}:' || value)."""
    return md5_hash32(F.concat(F.lit(f"{seed}:"), value))


def minhash(shingle_arr: Column, seed: int) -> Column:
    """Min over the shingle set of the seeded 32-bit hash."""
    return F.array_min(
        F.transform(shingle_arr, lambda s: seeded_hash32(seed, s))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two numeric arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))
