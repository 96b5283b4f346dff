"""Multimodal (binary) column handling.

Images/audio/video are opaque `binary` columns with typed metadata.
The container has no media libs, so the actual codec step is STUBBED
(decode_blob raises NotImplementedError unless the deterministic-fake
mode is used), but the Spark-side plumbing is real: binary columns,
Arrow-batched mapInPandas with an explicit output schema, partition-
preserving batch iteration — exactly the shape a real decoder drops
into.

Test binary payloads are derived from documents.text (utf-8 encode) so
DuckDB oracles can verify byte lengths, checksums and the
fake-decoded metadata bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from history_collector_spark.catalog import table
from history_collector_spark.registry import register


def decode_blob(data: bytes, fake: bool = False) -> dict:
    """Decode one media blob into metadata.

    Real decoding needs an image/audio codec that is not available in
    this environment — a production deployment plugs one in here. The
    deterministic fake derives metadata from the payload's sha256 so
    tests and oracles can verify the full distributed path.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(data).hexdigest()
    return {
        "width": int(h[0:4], 16) % 1920,
        "height": int(h[4:8], 16) % 1080,
        "n_frames": int(h[8:12], 16) % 300,
        "decode_status": "ok",
    }


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("decode_status", StringType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one pandas frame in, one out, per batch.
    Vectorized over the batch; never materializes more than one batch."""
    for pdf in batches:
        metas = [decode_blob(b, fake=True) for b in pdf["data"]]
        out = pd.DataFrame(metas)
        out.insert(0, "n_bytes", [len(b) for b in pdf["data"]])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[[f.name for f in _DECODE_SCHEMA.fields]]


# ---------------------------------------------------------------------------
# Pure-JVM metadata over binary columns: byte length, sha256 checksum,
# magic-byte prefix — the filter/partition layer that runs BEFORE any
# expensive decode at scale (prune by checksum/dedup first).
# ---------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum,
           lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.encode("text", "utf-8").alias("data")
    )
    return docs.select(
        "doc_id",
        F.length("data").cast("long").alias("n_bytes"),
        F.sha2("data", 256).alias("checksum"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# mapInPandas decode: binary -> typed metadata through the Arrow batch
# path. The oracle recomputes the sha256-derived fake metadata in SQL.
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CAST(concat('0x', substr(sha256(text), 1, 4)) AS INT)
                % 1920 AS INT) AS width,
           CAST(CAST(concat('0x', substr(sha256(text), 5, 4)) AS INT)
                % 1080 AS INT) AS height,
           CAST(CAST(concat('0x', substr(sha256(text), 9, 4)) AS INT)
                % 300 AS INT) AS n_frames,
           'ok' AS decode_status
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return docs.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame-sampling plan: pick every k-th frame index up to n_frames — the
# array-expression layer that fans a video row out into frame tasks.
# ---------------------------------------------------------------------------


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(sha256(text), 9, 4)) AS INT)
                  % 300 AS INT) AS n_frames
      FROM documents
    )
    SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 30)) AS INT) AS frame_idx
    FROM meta WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    n_frames = (
        F.conv(F.substring(F.sha2("data", 256), 9, 4), 16, 10).cast("int") % 300
    )
    meta = docs.select("doc_id", n_frames.alias("n_frames")).filter(
        F.col("n_frames") > 0
    )
    return meta.select(
        "doc_id", "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(30))
        ).alias("frame_idx"),
    )
