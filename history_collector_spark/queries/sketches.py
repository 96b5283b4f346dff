"""Sketch aggregates — HyperLogLog++ distinct counts and quantile
sketches over `events`.

These are the approximate, mergeable, bounded-memory aggregates a
100 TB rollup runs instead of exact distinct/percentile (exact distinct
shuffles every distinct value; a sketch shuffles KBs per partition).
Sketch values are implementation-specific, so there is NO DuckDB
oracle (the driver records the weaker rows-only check) — instead
tests/test_properties.py pins the relative error against the exact
answers at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.functions.nlp import md5_hash32
from history_collector_spark.registry import register


@register("sketch_aggregates")  # rows-only: sketch outputs are engine-specific
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias(
            "value_quantiles"
        ),
        F.count("*").alias("n_events"),
    )


@register("incremental_sketch_merge")  # rows-only: sketch bytes are engine-specific
def incremental_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch maintenance — the approximate twin of
    incremental_agg_merge: per-(event_type) DataSketches HLL sketches
    are built separately for the standing corpus and a late delta, then
    UNIONED (hll_union_agg) without touching raw data again. This is
    the property that makes sketches the 100 TB rollup currency: a
    day's sketch is built once, and any window/backfill recombines
    sketches in KBs. Output: merged estimate vs the exact distinct and
    the single-pass sketch estimate — the accuracy invariant
    (merged == single-pass, both within rsd of exact) is pinned in
    tests/test_properties.py.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.col("ts")
    )
    cut = F.lit("1970-01-08").cast("timestamp")

    base = ev.filter(F.col("ts") < cut).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    delta = ev.filter(F.col("ts") >= cut).groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "merged_estimate"
            )
        )
    )
    single = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "single_pass_estimate"
        ),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return merged.join(single, "event_type").select(
        "event_type", "merged_estimate", "single_pass_estimate",
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Bloom filter as a DataFrame: build a bitmap over customer keys with
# k md5-derived hash positions, probe it with hits and guaranteed
# misses, and report the measured false-positive rate — the join-prune
# structure at 100 TB (ship the KB-sized bitmap, skip the fact scan),
# built and audited entirely in Catalyst expressions.
# ---------------------------------------------------------------------------

# Deliberately SMALL (8192 bits) so the audit has signal at test
# scale: at sf0.01 (1500 customer keys) the load k*n/m ~ 1.3 gives a
# measurable ~10% FP rate; at sf0.1 (15000 keys) the filter SATURATES
# and the audit shows FPR -> 1 — exactly the failure the report
# exists to catch. A production filter sizes m from the same formula
# the audit verifies.
_BLOOM_BITS = 8192
_BLOOM_K = 7
_BLOOM_MISS_OFFSET = 10_000_000  # probe keys guaranteed absent


@register(
    "bloom_membership_audit",
    oracle=f"""
    WITH hashes AS (SELECT unnest(range({_BLOOM_K})) AS j),
    pos AS (
      SELECT CAST(concat('0x', substr(md5(concat(j, '#', c_custkey)), 1, 8))
                  AS BIGINT) % {_BLOOM_BITS} AS p
      FROM customer, hashes
    ),
    bitmap AS (
      SELECT p // 32 AS word, bit_or(1 << (p % 32)) AS bits
      FROM pos GROUP BY 1
    ),
    probes AS (
      SELECT c_custkey AS key, TRUE AS is_member FROM customer
      UNION ALL
      SELECT c_custkey + {_BLOOM_MISS_OFFSET}, FALSE FROM customer
    ),
    ppos AS (
      SELECT key, is_member,
             CAST(concat('0x', substr(md5(concat(j, '#', key)), 1, 8))
                  AS BIGINT) % {_BLOOM_BITS} AS p
      FROM probes, hashes
    ),
    checks AS (
      SELECT ppos.key, ppos.is_member,
             CASE WHEN (coalesce(b.bits, 0) & (1 << (ppos.p % 32))) != 0
                  THEN 1 ELSE 0 END AS hit
      FROM ppos LEFT JOIN bitmap b ON ppos.p // 32 = b.word
    ),
    verdicts AS (
      SELECT key, is_member,
             CASE WHEN sum(hit) = {_BLOOM_K} THEN 1 ELSE 0 END AS positive
      FROM checks GROUP BY 1, 2
    )
    SELECT CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN is_member AND positive = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives,
           CAST(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_non_members,
           CAST(sum(CASE WHEN NOT is_member AND positive = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           (1.0 * sum(CASE WHEN NOT is_member AND positive = 1
                           THEN 1 ELSE 0 END))
             / sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END)
             AS false_positive_rate
    FROM verdicts
    """,
)
def bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build: each key sets k=7 md5-derived positions in an 8192-bit
    map; the bitmap is a 4096-row (word, bits) aggregate via bit_or (32-bit words — DuckDB's signed shift overflows at bit 63) —
    map-side combined, KB-sized, broadcastable. Probe: every build key
    (must all test positive — the audit proves zero false negatives)
    plus an offset copy guaranteed absent (measures the actual FP
    rate against the 0.6185^(m/n... theoretical curve). The probe join
    keys on bitmap words (2048 distinct — effectively a broadcast),
    and every hash is the repo-standard md5-derived 32-bit value, so
    DuckDB rebuilds the identical filter bit-for-bit."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    hashes = F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))

    def positions(key_col):
        return F.transform(
            hashes,
            lambda j: md5_hash32(
                F.concat(j.cast("string"), F.lit("#"), key_col.cast("string"))
            )
            % _BLOOM_BITS,
        )

    pos = cust.select(F.explode(positions(F.col("c_custkey"))).alias("p"))
    bitmap = pos.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").alias("bits")
    )
    probes = cust.select(
        F.col("c_custkey").alias("key"), F.lit(True).alias("is_member")
    ).unionAll(
        cust.select(
            (F.col("c_custkey") + _BLOOM_MISS_OFFSET).alias("key"),
            F.lit(False).alias("is_member"),
        )
    )
    ppos = probes.select(
        "key", "is_member", F.explode(positions(F.col("key"))).alias("p")
    )
    checks = ppos.join(
        F.broadcast(bitmap),
        (F.col("p") / 32).cast("long") == F.col("word"),
        "left",
    ).select(
        "key",
        "is_member",
        F.when(
            F.expr(
                "(coalesce(bits, 0L) & shiftleft(1L, cast(p % 32 as int)))"
            )
            != 0,
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    verdicts = checks.groupBy("key", "is_member").agg(
        F.when(F.sum("hit") == _BLOOM_K, 1).otherwise(0).alias("positive")
    )
    mem = F.col("is_member")
    return verdicts.agg(
        F.sum(F.when(mem, 1).otherwise(0)).alias("n_members"),
        F.sum(F.when(mem & (F.col("positive") == 0), 1).otherwise(0)).alias(
            "n_false_negatives"
        ),
        F.sum(F.when(~mem, 1).otherwise(0)).alias("n_non_members"),
        F.sum(F.when(~mem & (F.col("positive") == 1), 1).otherwise(0)).alias(
            "n_false_positives"
        ),
        (
            (
                F.lit(1.0)
                * F.sum(
                    F.when(~mem & (F.col("positive") == 1), 1).otherwise(0)
                )
            )
            / F.sum(F.when(~mem, 1).otherwise(0))
        ).alias("false_positive_rate"),
    )


# ---------------------------------------------------------------------------
# Quantile sketch error audit: approx_percentile's rank-error contract,
# measured against the exact quantiles on the same data.
# ---------------------------------------------------------------------------

_QS_ACCURACY = 100  # GK sketch accuracy: rank error <= n / accuracy
_QS_QUANTILES = (0.5, 0.9, 0.99)


# rows-only: the sketch value is engine-specific; the GK rank-error
# bound |rank(approx) - q| <= 1/accuracy is pinned in
# tests/test_properties.py::test_quantile_sketch_rank_error_bound.
@register("quantile_sketch_error_audit")
def quantile_sketch_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each target quantile of events.value: the sketched estimate
    (percentile_approx, accuracy 100), the exact percentile, and the
    ACHIEVED rank of the estimate — the audit that tells an operator
    whether the accuracy knob is sized for their SLA before they trust
    sketched p99s on 100 TB.

    One pass builds the sketch AND the exact percentiles (both are
    aggregates); the rank-of-estimate check is a second bounded
    aggregate against the broadcast 3-row estimate table. The exact
    percentile is the only O(n log n)-ish member — at production scale
    it runs on a sampled audit slice while the sketch runs on
    everything; here both run in full so the audit is exact."""
    ev = table(spark, sf_dir, "events").select("value")
    qs = list(_QS_QUANTILES)
    agg = ev.agg(
        F.percentile_approx("value", qs, _QS_ACCURACY).alias("approx"),
        F.expr(
            f"percentile(value, array({', '.join(map(str, qs))}))"
        ).alias("exact"),
        F.count("*").alias("n"),
    )
    per_q = agg.select(
        F.posexplode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("approx"),
                F.col("exact"),
            )
        ).alias("i", "z"),
        "n",
    ).select(
        F.col("z.q").alias("q"),
        F.col("z.approx").alias("approx_value"),
        F.col("z.exact").alias("exact_value"),
        "n",
    )
    ranked = ev.crossJoin(F.broadcast(per_q)).groupBy(
        "q", "approx_value", "exact_value", "n"
    ).agg(
        (F.sum((F.col("value") <= F.col("approx_value")).cast("long")) / F.first("n"))
        .alias("achieved_rank")
    )
    return ranked.select(
        "q",
        "approx_value",
        "exact_value",
        "achieved_rank",
        F.abs(F.col("achieved_rank") - F.col("q")).alias("rank_error"),
        "n",
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the mergeable frequency summary that complements
# Misra-Gries (heavy_hitter_tokens) — CMS answers "how often did THIS
# key occur" for any key, with a one-sided (over-)estimate, from a
# fixed d x w cell table that shuffles KBs regardless of corpus size.
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 20


@register(
    "countmin_frequency_audit",
    oracle=f"""
    WITH rows_ AS (SELECT unnest(range({_CMS_DEPTH})) AS j),
    cells AS (
      SELECT j,
             CAST(concat('0x', substr(md5(concat(j, '#', user_id)), 1, 8))
                  AS BIGINT) % {_CMS_WIDTH} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM events, rows_
      GROUP BY 1, 2
    ),
    exact_ AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY 1
      ORDER BY exact_cnt DESC, user_id LIMIT {_CMS_TOPK}
    ),
    probe AS (
      SELECT e.user_id, e.exact_cnt, r.j,
             CAST(concat('0x', substr(md5(concat(r.j, '#', e.user_id)), 1, 8))
                  AS BIGINT) % {_CMS_WIDTH} AS bucket
      FROM exact_ e, rows_ r
    )
    SELECT p.user_id, p.exact_cnt,
           CAST(min(c.c) AS BIGINT) AS cms_estimate
    FROM probe p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY 1, 2
    """,
)
def countmin_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a d=4 x w=256 count-min sketch over event user_ids with
    md5-derived row hashes (DuckDB rebuilds it bit-for-bit), then
    estimate the frequency of the top-20 users and report estimate
    next to exact — the audit shows CMS's one-sided error (estimate >=
    exact, pinned in tests/test_properties.py).

    Scale shape: the cell table is a 1024-group map-side-combined
    aggregate — the sketch costs one bounded-key pass no matter the
    corpus, and cells from different corpus shards MERGE by summing
    (same property incremental_sketch_merge exercises for HLL). Probes
    broadcast against the KB-sized cell table."""
    ev = table(spark, sf_dir, "events").select("user_id")
    rows_ = F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))

    def bucket(j, key_col):
        return (
            md5_hash32(
                F.concat(j.cast("string"), F.lit("#"), key_col.cast("string"))
            )
            % _CMS_WIDTH
        )

    cells = (
        ev.select(
            F.explode(
                F.transform(
                    rows_,
                    lambda j: F.struct(
                        j.alias("j"), bucket(j, F.col("user_id")).alias("bucket")
                    ),
                )
            ).alias("s")
        )
        .groupBy(F.col("s.j").alias("j"), F.col("s.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(_CMS_TOPK)
    )
    probe = exact.select(
        "user_id",
        "exact_cnt",
        F.explode(
            F.transform(
                rows_,
                lambda j: F.struct(
                    j.alias("j"), bucket(j, F.col("user_id")).alias("bucket")
                ),
            )
        ).alias("s"),
    ).select("user_id", "exact_cnt", F.col("s.j").alias("j"), F.col("s.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# From-scratch HyperLogLog (Flajolet et al. 2007), cross-engine exact:
# unlike the approx_count_distinct sketch above (engine-private bytes,
# rows-only check), these registers are plain integers both engines
# compute identically, so the whole estimator is oracle-verified.
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers; bucket = low 6 bits of the 32-bit hash
_HLL_ALPHA = 0.709  # alpha_64 from the HLL paper
_HLL_VBITS = 26  # value bits left after the bucket split


@register(
    "sketch_hll_estimate",
    oracle=f"""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
               AS BIGINT) AS hv
      FROM orders
    ),
    rho AS (
      SELECT hv % {_HLL_M} AS bucket,
             CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_VBITS + 1}
                  ELSE {_HLL_VBITS} - length(bin(hv // {_HLL_M})) + 1
             END AS r
      FROM h
    ),
    regs AS (
      SELECT g.b AS bucket, coalesce(max(rho.r), 0) AS r
      FROM (SELECT unnest(range(0, {_HLL_M})) AS b) g
      LEFT JOIN rho ON rho.bucket = g.b
      GROUP BY g.b
    ),
    s AS (
      SELECT sum(power(2.0, -r)) AS sum_inv,
             CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(sum((bucket + 1) * r) AS BIGINT) AS register_checksum
      FROM regs
    ),
    t AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS true_distinct
          FROM orders)
    SELECT {_HLL_M} AS m, n_zero, register_checksum, sum_inv,
           ({_HLL_ALPHA} * {_HLL_M * _HLL_M}) / sum_inv AS estimate_raw,
           CASE WHEN ({_HLL_ALPHA} * {_HLL_M * _HLL_M}) / sum_inv
                     <= {2.5 * _HLL_M} AND n_zero > 0
                THEN {_HLL_M} * ln({float(_HLL_M)} / n_zero)
                ELSE ({_HLL_ALPHA} * {_HLL_M * _HLL_M}) / sum_inv
           END AS estimate,
           t.true_distinct
    FROM s, t
    """,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-customer estimate over orders, built from
    scratch so every intermediate is oracle-checkable: 32-bit md5 hash,
    bucket = h mod 64, rho = leading-zero rank of the remaining 26 value
    bits (computed exactly as 26 - bitlength + 1 via bin(), no float
    log), register = max(rho) per bucket, with the paper's linear-
    counting correction for the small range.

    Parity: registers are small integers; sum(2^-r) over 64 registers
    is a sum of exact powers of two (no rounding at any order — every
    partial sum is representable), so even the float estimate is
    bit-stable; the correction branch compares exact values. The
    register_checksum column pins the full register vector, not just
    the estimate.

    Scale shape: the register build is a 64-key max-aggregate with
    map-side combine — the canonical mergeable sketch: partitions
    build registers independently and max-merge, bytes shuffled are
    O(64) per partition regardless of corpus size. true_distinct (the
    audit column) is the one exact pass.
    """
    orders = table(spark, sf_dir, "orders")
    hv = md5_hash32(F.col("o_custkey").cast("string"))
    v = F.floor(F.col("hv") / _HLL_M).cast("long")
    rho = (
        orders.select(hv.alias("hv"))
        .select(
            (F.col("hv") % _HLL_M).alias("bucket"),
            F.when(v == 0, F.lit(_HLL_VBITS + 1))
            .otherwise(F.lit(_HLL_VBITS) - F.length(F.bin(v)) + 1)
            .alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    grid = spark.range(_HLL_M).select(F.col("id").alias("b"))
    regs = (
        grid.join(rho, grid.b == rho.bucket, "left")
        .select("b", F.coalesce(F.col("r"), F.lit(0)).alias("r"))
    )
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sum_inv"),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).alias("n_zero"),
        F.sum((F.col("b") + 1) * F.col("r")).alias("register_checksum"),
    )
    t = orders.agg(
        F.count_distinct(F.col("o_custkey")).alias("true_distinct")
    )
    raw = (F.lit(_HLL_ALPHA) * F.lit(float(_HLL_M * _HLL_M))) / F.col(
        "sum_inv"
    )
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("n_zero") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("n_zero")),
    ).otherwise(raw)
    return s.crossJoin(F.broadcast(t)).select(
        F.lit(_HLL_M).alias("m"),
        "n_zero",
        "register_checksum",
        "sum_inv",
        raw.alias("estimate_raw"),
        est.alias("estimate"),
        "true_distinct",
    )
