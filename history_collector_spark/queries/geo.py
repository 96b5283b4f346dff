"""Geospatial operators: geohash cell encoding + bucketed spatial join.

New operator family (round 15). A 100 TB training-data pipeline with
location-bearing records (EXIF GPS from the multimodal tier, IP
geolocation, POI joins) needs exactly two primitives done
scale-correctly:

1. **Cell encoding** — map a point to a hierarchical cell id whose
   PREFIX is a spatial containment relation (geohash: interleave the
   quantized lon/lat bits, base-32 the result). Pure integer bit
   arithmetic -> pure unrolled Catalyst expressions, zero Python.
2. **Bucketed neighbor join** — the standard distributed spatial
   join: bucket both sides by a coarse cell, expand the probe side to
   its 3x3 cell neighborhood, equi-join on the cell id, then reduce
   to the nearest match. NEVER all-pairs: the join key bounds each
   task's candidate set by local point density, and the grid
   resolution is the knob that keeps per-cell fan-in constant as data
   grows (finer grid at higher density — same contract, new
   constant).

The tables carry no coordinates, so both queries derive a
deterministic synthetic placement from the integer keys (small-factor
LCG onto a 2^15 grid — overflow-free under ANSI arithmetic in BOTH
engines), making every result integer-exact and the DuckDB oracle a
bit-identical replay.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BITS = 15  # per-axis quantization -> 30-bit cell code -> 6 base32 chars
_LON_MULT = 48271  # minstd multipliers: deterministic, overflow-free
_LAT_MULT = 69621
_COARSE_SHIFT = 10  # drop to a 32x32 grid for the neighbor join


def _axis(key: F.Column, mult: int) -> F.Column:
    return (key.cast("long") * F.lit(mult)) % F.lit(1 << _BITS)


def _interleave(lon: F.Column, lat: F.Column) -> F.Column:
    """30-bit geohash cell code: lon bits on odd positions (geohash
    leads with longitude), lat on even — unrolled to 30 shift/mask
    terms, all inside whole-stage codegen."""
    terms = []
    for i in range(_BITS):
        terms.append(
            F.shiftleft(F.shiftright(lon, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(lat, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda a, b: a + b, terms)


def _base32(code: F.Column) -> F.Column:
    alpha = F.array(*[F.lit(c) for c in _GH32])
    chars = [
        F.element_at(
            alpha,
            (F.shiftright(code, 5 * (5 - j)).bitwiseAND(F.lit(31)) + 1).cast(
                "int"
            ),
        )
        for j in range(6)
    ]
    return F.concat(*chars)


def _axis_sql(key: str, mult: int) -> str:
    return f"(({key} * {mult}) % {1 << _BITS})"


def _interleave_sql(lon: str, lat: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"((({lon} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({lat} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def _base32_sql(code: str) -> str:
    parts = [
        f"substr('{_GH32}', CAST((({code} >> {5 * (5 - j)}) & 31) "
        "AS INT) + 1, 1)"
        for j in range(6)
    ]
    return "(" + " || ".join(parts) + ")"


_GEO_CELLS_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         {_axis_sql('c_custkey', _LON_MULT)} AS lon,
         {_axis_sql('c_custkey', _LAT_MULT)} AS lat
  FROM customer
),
coded AS (
  SELECT c_custkey,
         {_base32_sql(_interleave_sql('lon', 'lat'))} AS gh6
  FROM pts
)
SELECT substr(gh6, 1, 3) AS gh3,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(count(DISTINCT gh6) AS BIGINT) AS n_cells,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key
FROM coded
GROUP BY gh3
"""


@register("geo_geohash_cells", oracle=_GEO_CELLS_ORACLE)
def geo_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell census: every customer placed on the 2^15 grid,
    encoded to its 6-char geohash by pure bit arithmetic, aggregated
    per 3-char PREFIX (the containment property: a prefix is the
    enclosing coarser cell). Plan: map-only projection into one
    hash aggregate keyed by the prefix — the shuffle key space is at
    most 32^3 cells regardless of corpus size, so partial aggregation
    collapses nearly everything map-side at 100 TB.

    Reference scope note: the reference engine has no geo tier; this
    extends the curation toolbox (SURVEY.md extension families)."""
    cust = table(spark, sf_dir, "customer")
    lon = _axis(F.col("c_custkey"), _LON_MULT)
    lat = _axis(F.col("c_custkey"), _LAT_MULT)
    coded = cust.select(
        F.col("c_custkey"),
        _base32(_interleave(lon, lat)).alias("gh6"),
    )
    return (
        coded.groupBy(F.substring("gh6", 1, 3).alias("gh3"))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.countDistinct("gh6").cast("long").alias("n_cells"),
            F.min("c_custkey").cast("long").alias("min_key"),
            F.max("c_custkey").cast("long").alias("max_key"),
        )
    )


_GEO_KNN_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey,
         {_axis_sql('c_custkey', _LON_MULT)} AS lon,
         {_axis_sql('c_custkey', _LAT_MULT)} AS lat
  FROM customer
),
cust_cells AS (
  SELECT c_custkey, lon, lat,
         (lon >> {_COARSE_SHIFT}) AS cx, (lat >> {_COARSE_SHIFT}) AS cy
  FROM cust
),
supp AS (
  SELECT s_suppkey, s_nationkey,
         {_axis_sql('s_suppkey', _LAT_MULT)} AS lon,
         {_axis_sql('s_suppkey', _LON_MULT)} AS lat
  FROM supplier
),
probe AS (
  SELECT s.s_suppkey, s.s_nationkey, s.lon, s.lat,
         (s.lon >> {_COARSE_SHIFT}) + dx.d AS cx,
         (s.lat >> {_COARSE_SHIFT}) + dy.d AS cy
  FROM supp s,
       (SELECT unnest([-1, 0, 1]) AS d) dx,
       (SELECT unnest([-1, 0, 1]) AS d) dy
  WHERE (s.lon >> {_COARSE_SHIFT}) + dx.d
          BETWEEN 0 AND {(1 << (_BITS - _COARSE_SHIFT)) - 1}
    AND (s.lat >> {_COARSE_SHIFT}) + dy.d
          BETWEEN 0 AND {(1 << (_BITS - _COARSE_SHIFT)) - 1}
),
cand AS (
  SELECT p.s_suppkey, p.s_nationkey, c.c_custkey,
         (p.lon - c.lon) * (p.lon - c.lon)
           + (p.lat - c.lat) * (p.lat - c.lat) AS d2
  FROM probe p JOIN cust_cells c ON p.cx = c.cx AND p.cy = c.cy
),
nearest AS (
  SELECT s_suppkey, s_nationkey, d2 AS best_d2, c_custkey AS best_cust
  FROM (SELECT *, row_number() OVER (
          PARTITION BY s_suppkey ORDER BY d2, c_custkey) AS rn
        FROM cand)
  WHERE rn = 1
)
SELECT CAST(s_nationkey AS INT) AS s_nationkey,
       CAST(count(*) AS BIGINT) AS n_matched,
       CAST(min(best_d2) AS BIGINT) AS min_d2,
       CAST(sum(best_d2) AS BIGINT) AS sum_d2,
       CAST(sum(best_cust) AS BIGINT) AS sum_best_cust
FROM nearest
GROUP BY s_nationkey
"""


@register("geo_bucket_knn_join", oracle=_GEO_KNN_ORACLE)
def geo_bucket_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-customer-per-supplier through the bucketed 3x3
    neighbor join — the canonical distributed spatial join. Suppliers
    and customers land on the same 2^15 grid (axes deliberately
    swapped for suppliers so the point sets differ); each supplier
    probes its coarse cell plus the 8 neighbors via an exploded
    (dx, dy) literal array, equi-joins customers ON THE CELL ID, and
    keeps the squared-integer-distance minimum (tie-break: smallest
    custkey), aggregated per supplier nation.

    Scale shape: the only join is an equi-join whose key bounds each
    candidate set by 9-cell local density — no cross join exists in
    the plan (guarded). At 100 TB, density growth is absorbed by
    deepening _COARSE_SHIFT (finer buckets), not by plan change; the
    9x probe-side row expansion is a constant factor on the SMALL
    side. Grid-edge cells probe fewer neighbors (clipped, matching
    the oracle's BETWEEN)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _axis(F.col("c_custkey"), _LON_MULT).alias("lon"),
        _axis(F.col("c_custkey"), _LAT_MULT).alias("lat"),
    )
    cust_cells = cust.select(
        "c_custkey",
        "lon",
        "lat",
        F.shiftright("lon", _COARSE_SHIFT).alias("cx"),
        F.shiftright("lat", _COARSE_SHIFT).alias("cy"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        _axis(F.col("s_suppkey"), _LAT_MULT).alias("lon"),
        _axis(F.col("s_suppkey"), _LON_MULT).alias("lat"),
    )
    max_cell = (1 << (_BITS - _COARSE_SHIFT)) - 1
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probe = (
        supp.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "s_suppkey",
            "s_nationkey",
            "lon",
            "lat",
            (F.shiftright("lon", _COARSE_SHIFT) + F.col("dx")).alias("cx"),
            (F.shiftright("lat", _COARSE_SHIFT) + F.col("dy")).alias("cy"),
        )
        .filter(
            F.col("cx").between(0, max_cell)
            & F.col("cy").between(0, max_cell)
        )
    )
    d2 = (
        (probe["lon"] - cust_cells["lon"])
        * (probe["lon"] - cust_cells["lon"])
        + (probe["lat"] - cust_cells["lat"])
        * (probe["lat"] - cust_cells["lat"])
    )
    cand = probe.join(cust_cells, ["cx", "cy"]).select(
        "s_suppkey",
        "s_nationkey",
        d2.alias("d2"),
        "c_custkey",
    )
    nearest = cand.groupBy("s_suppkey").agg(
        F.any_value("s_nationkey").alias("s_nationkey"),
        F.min("d2").alias("best_d2"),
        F.min_by(
            "c_custkey", F.struct(F.col("d2"), F.col("c_custkey"))
        ).alias("best_cust"),
    )
    return nearest.groupBy(F.col("s_nationkey").cast("int").alias(
        "s_nationkey"
    )).agg(
        F.count("*").cast("long").alias("n_matched"),
        F.min("best_d2").cast("long").alias("min_d2"),
        F.sum("best_d2").cast("long").alias("sum_d2"),
        F.sum("best_cust").cast("long").alias("sum_best_cust"),
    )
