"""Scalar-function pack — SURVEY.md §2.6, completing what relational.py
left out: timestamp_seconds, conv, translate, concat_ws, format_string.

Reference sites: epoch->datetime on every output row
(python/adapters/postgres_storage_adapter.py:69), hex<->dec sequence
arithmetic (python/main.py:222-224), char-strip translate
(python/main.py:331-334), path building (python/main.py:83-86),
zero-padding (python/main.py:226). All compile to Catalyst expressions
inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# Pinned conversion from the reference tests: 1535594286 ->
# 2018-08-30 01:58:06 (python/tests/test_postgres_storage_adapter.py:254-269).
PINNED_EPOCH = 1535594286


@register(
    "scalar_pack",
    oracle=f"""
    SELECT o_orderkey,
           TIMESTAMP '1970-01-01' + (o_orderkey % 1000000000) * INTERVAL '1 second'
             AS ts_from_epoch,
           TIMESTAMP '1970-01-01' + {PINNED_EPOCH} * INTERVAL '1 second' AS pinned_ts,
           lower(format('{{:x}}', o_orderkey)) AS hex_key,
           CAST(CAST(concat('0x', format('{{:x}}', o_orderkey)) AS BIGINT) AS VARCHAR)
             AS roundtrip_dec,
           lpad(lower(format('{{:x}}', o_orderkey)), 8, '0') AS padded_hex,
           translate(o_orderpriority, '- ', '__') AS priority_slug,
           concat_ws('/', 'ledger', CAST(o_orderkey AS VARCHAR),
                     o_orderstatus) AS path,
           printf('%08d', o_orderkey % 100000000) AS formatted
    FROM orders
    """,
)
def scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    hex_key = F.lower(F.hex(F.col("o_orderkey")))
    return o.select(
        "o_orderkey",
        F.timestamp_seconds(F.col("o_orderkey") % 1000000000).alias("ts_from_epoch"),
        F.timestamp_seconds(F.lit(PINNED_EPOCH)).alias("pinned_ts"),
        hex_key.alias("hex_key"),
        F.conv(hex_key, 16, 10).alias("roundtrip_dec"),
        F.lpad(hex_key, 8, "0").alias("padded_hex"),
        F.translate("o_orderpriority", "- ", "__").alias("priority_slug"),
        F.concat_ws(
            "/", F.lit("ledger"), F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
        ).alias("path"),
        F.format_string("%08d", F.col("o_orderkey") % 100000000).alias("formatted"),
    )


@register(
    "string_extract_pack",
    oracle="""
    SELECT event_id,
           regexp_extract(props, '"k": ([0-9]+)', 1) AS k_value,
           substr(event_type, 1, 3) AS type_prefix,
           upper(event_type) AS type_upper,
           CAST(length(props) AS INT) AS props_len,
           replace(event_type, 'e', '3') AS leeted
    FROM events
    """,
)
def string_extract_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).alias("k_value"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.upper("event_type").alias("type_upper"),
        F.length("props").alias("props_len"),
        F.regexp_replace("event_type", "e", "3").alias("leeted"),
    )


@register(
    "json_extract_pack",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int
    FROM events
    """,
)
def json_extract_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    # props is a JSON string ({"k": N}); get_json_object stays JVM-side.
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


# ---------------------------------------------------------------------------
# Semi-structured schema profile: discover the keys actually present
# in the props JSON column and their value types/ranges — the first
# query anyone runs against a landed JSON column.
# ---------------------------------------------------------------------------


@register(
    "props_schema_profile",
    oracle="""
    WITH kv AS (
      SELECT unnest(json_keys(props)) AS key, props FROM events
    ), kv2 AS (
      SELECT key, json_extract_string(props, '$.' || key) AS val FROM kv
    )
    SELECT key, CAST(count(*) AS BIGINT) AS n_present,
           CAST(sum(CASE WHEN regexp_full_match(val, '-?[0-9]+')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_int_values,
           min(CASE WHEN regexp_full_match(val, '-?[0-9]+')
                    THEN CAST(val AS BIGINT) END) AS min_int,
           max(CASE WHEN regexp_full_match(val, '-?[0-9]+')
                    THEN CAST(val AS BIGINT) END) AS max_int
    FROM kv2 GROUP BY key
    """,
)
def props_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key presence count, integer-typed share, and integer range
    over the props JSON. Keys are discovered DYNAMICALLY by parsing
    each row to map<string,string> and exploding the map — no literal
    JSON paths, so new keys appearing upstream show up without a code
    change (get_json_object would need a fixed path per key). The
    aggregate is key-bounded with map-side combine; the parse is
    row-local scan work."""
    ev = table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(
            F.from_json("props", "map<string,string>")
        ).alias("key", "val")
    )
    is_int = F.col("val").rlike(r"^-?[0-9]+$")
    return kv.groupBy("key").agg(
        F.count("*").alias("n_present"),
        F.sum(F.when(is_int, 1).otherwise(0)).alias("n_int_values"),
        F.min(F.when(is_int, F.col("val").cast("long"))).alias("min_int"),
        F.max(F.when(is_int, F.col("val").cast("long"))).alias("max_int"),
    )


# ---------------------------------------------------------------------------
# VARIANT-native semi-structured access (Spark 4): parse the JSON
# payload ONCE into the binary variant encoding, then run typed
# variant_get accessors — the engine-native path that replaces
# re-parsing JSON strings per extraction at scale.
# ---------------------------------------------------------------------------


@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_k_present,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_distinct_k
    FROM events GROUP BY event_type
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed aggregation over the props payload through Spark's VARIANT
    type: parse_json builds the binary variant once, try_variant_get
    pulls '$.k' as BIGINT (NULL-safe on absent keys), and the
    aggregate runs on typed values — never a second string parse.

    Scale shape: at 100 TB the variant parse is the map-side cost paid
    once per row; every downstream accessor is a cheap binary-offset
    read, which is why engines shred hot JSON columns to variant at
    ingest. One event_type-keyed reduce, map-side combined. The
    DuckDB oracle reads the same payloads with json_extract — the
    values (all integers) are representation-independent.
    """
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias(
            "n_k_present"
        ),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    )
