"""Event-time windows + analytic window functions — SURVEY.md §2.7-f.

The reference is strictly arrival-ordered and has no event-time
semantics; these are the extensions the brief requires. Batch versions
live here (verifiable against DuckDB); the streaming twins (watermarked)
are in history_collector_spark/streaming/.

`F.window` tumbling/sliding buckets are epoch-aligned, so the DuckDB
oracles reproduce them with date_trunc/time_bucket arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# Tumbling 1-hour window counts per event_type.
# ---------------------------------------------------------------------------


@register(
    "tumbling_window_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type",
            "n_events", "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding window: 1 hour long, 30-minute slide -> each event lands in 2
# windows. Oracle expands each row into its two buckets explicitly.
# ---------------------------------------------------------------------------


@register(
    "sliding_window_counts",
    oracle="""
    SELECT win AS window_start, CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS win
      FROM events CROSS JOIN (VALUES (0), (1)) AS t(k)
    )
    GROUP BY win
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


# ---------------------------------------------------------------------------
# Session windows: per-user sessions split on >30-minute gaps. The
# oracle computes the same islands with a lag/cumsum gaps-and-islands.
# ---------------------------------------------------------------------------


@register(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
        .select("user_id", "session_start", "n_events")
    )


# ---------------------------------------------------------------------------
# Analytic window functions: lag/lead/running aggregate over an ordered
# per-user partition (the consumer-side query surface the reference
# delegates to Postgres, sample/main.py:25).
# ---------------------------------------------------------------------------


@register(
    "analytic_window_funcs",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS running_total,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def analytic_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id", "user_id", "ts", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum("value").over(running).alias("running_total"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Funnel conversion: of the users who signed up, how many purchased
# strictly AFTER their first signup — the canonical product-analytics
# query, answered with two map-side-combined conditional aggregates
# and zero joins.
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (first_signup IS NOT NULL) AS n_signed_up,
           count(*) FILTER (first_signup IS NOT NULL
                            AND first_purchase > first_signup) AS n_converted,
           CAST(count(*) FILTER (first_signup IS NOT NULL
                                 AND first_purchase > first_signup) AS DOUBLE)
             / count(*) FILTER (first_signup IS NOT NULL) AS conversion_rate
    FROM per_user
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id (conditional min() aggregates combine
    map-side), then a global reduction to a single row. NULL-safe
    ordering: users who purchased before ever signing up do not
    convert; users who never purchased have NULL first_purchase and
    the > predicate is false.
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    signed = F.col("first_signup").isNotNull()
    converted = signed & (F.col("first_purchase") > F.col("first_signup"))
    return per_user.agg(
        F.count(F.when(signed, 1)).alias("n_signed_up"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        (
            F.count(F.when(converted, 1)).cast("double")
            / F.count(F.when(signed, 1))
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# SCD type-2 dimension build: turn a customer's order stream into
# versioned rows with [valid_from, valid_to) ranges and an is_current
# flag — the standard warehouse pattern for tracking attribute history.
# ---------------------------------------------------------------------------


@register(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on o_custkey, one in-partition sort; lead() closes
    each version with the next one's start date. The tiebreak on
    o_orderkey makes same-day orders deterministic. At 100 TB the
    customer key is high-cardinality and unskewed, so partitions stay
    balanced.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-active week, counted again
# in each later week — the standard retention triangle.
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ), f AS (
      SELECT user_id, min(week) AS cohort FROM a GROUP BY user_id
    )
    SELECT f.cohort,
           CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(a.week AS DATE))
                // 7 AS INT) AS week_k,
           count(DISTINCT a.user_id) AS n_active
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every exchange here is on user_id or a bounded (cohort, week_k)
    key: the distinct activity set and the per-user first week share
    the user_id partitioning (one shuffle each, then a co-partitioned
    join — no broadcast needed, both sides are user-cardinality), and
    the final aggregate's group count is weeks x weeks, tiny at any
    corpus size.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    act = ev.distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort"))
    week_k = (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("cohort", week_k.alias("week_k"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Batch sessionization: split each user's event stream into sessions at
# >30-minute silence gaps (lag -> boundary flag -> running sum), then
# per-session stats — the batch twin of the streaming session_window
# aggregate, and the standard lag/cumsum formulation.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 1800 * 1_000_000


@register(
    "event_sessionize",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                AS BIGINT) AS duration_sec
    FROM s GROUP BY 1, 2
    """,
)
def event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One user_id shuffle serves everything: the lag, the running
    boundary sum (same window ordering, so no second exchange), and the
    final (user_id, session_id) aggregate, which Catalyst recognizes as
    co-partitioned. Session numbering is per-user (1, 2, ...), so keys
    stay high-cardinality and unskewed at any corpus size.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap.isNull() | (gap > _SESSION_GAP_US), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = ev.select(
        "user_id", "ts", F.sum(is_new).over(cum).alias("session_id")
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# Trailing event-time window: each event's 1-hour-lookback sum/count
# for its user — a RANGE frame over event time (value-based bounds),
# vs. the ROWS frames elsewhere in this module.
# ---------------------------------------------------------------------------


@register(
    "trailing_hour_sum",
    oracle="""
    SELECT event_id, user_id, ts, value,
           sum(value) OVER w AS trailing_sum,
           count(*) OVER w AS trailing_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RANGE frame sorts each user's partition once and slides a
    value-bounded frame over it — linear per partition, one user_id
    exchange, no self-join (the naive formulation is an interval
    self-join that expands pairwise). Peers with identical timestamps
    enter the frame together in both engines.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum("value").over(w).alias("trailing_sum"),
        F.count("*").over(w).alias("trailing_n"),
    )


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences — the session-flow analysis behind funnel design and
    next-event models. One user_id-keyed window (the only exchange
    that moves event rows; high-cardinality, unskewed) then a
    bounded-key (from, to) aggregation with map-side combine."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Rolling bands: trailing-10-row mean/stddev per user; flag readings
# breaching the 2-sigma envelope (Bollinger-band anomaly shape).
# ---------------------------------------------------------------------------


@register(
    "rolling_bands",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, ts, value,
             avg(value) OVER w AS roll_mean,
             stddev_samp(value) OVER w AS roll_std,
             count(*) OVER w AS n_window
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value, roll_mean, roll_std
    FROM x
    WHERE n_window >= 2 AND abs(value - roll_mean) > 2 * roll_std
    """,
)
def rolling_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value leaves the 2-sigma band of their own trailing
    10 readings. The frame excludes the current row (a point can't
    vouch for itself) and needs >= 2 predecessors for a defined sample
    stddev. One user_id shuffle; the sliding frame is a linear pass —
    never a self-join against 'the previous k rows'."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.avg("value").over(w).alias("roll_mean"),
            F.stddev_samp("value").over(w).alias("roll_std"),
            F.count("*").over(w).alias("n_window"),
        )
        .filter(
            (F.col("n_window") >= 2)
            & (
                F.abs(F.col("value") - F.col("roll_mean"))
                > 2 * F.col("roll_std")
            )
        )
        .drop("n_window")
    )


# ---------------------------------------------------------------------------
# Session path mining: the most common event-type journeys (first 5
# steps of each session) — the product-analytics "top paths" report.
# ---------------------------------------------------------------------------

_PATH_MAX_STEPS = 5


@register(
    "session_path_counts",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{_PATH_MAX_STEPS}],
               '>') AS path
      FROM s GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    """,
)
def session_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many sessions follow each event-type journey, truncated to
    the first 5 steps (the truncation is what keeps the path key space
    bounded — at most |types|^5 — instead of growing with the longest
    session). Same single user_id exchange as event_sessionize for the
    lag + cumsum + per-session collect; the final path count is a
    bounded-key aggregate with map-side combine."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(is_new).over(cum).alias("session_id"),
    )
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                _PATH_MAX_STEPS,
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_sessions"))


# ---------------------------------------------------------------------------
# Conversion latency: signup -> first purchase time distribution
# (funnel_conversion tells you IF users convert; this tells you WHEN).
# ---------------------------------------------------------------------------


@register(
    "conversion_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    ), lat AS (
      SELECT s.user_id,
             epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts) AS lat_us
      FROM s JOIN p ON s.user_id = p.user_id
    ), ranked AS (
      SELECT lat_us, row_number() OVER (ORDER BY lat_us) AS r,
             count(*) OVER () AS n
      FROM lat
    )
    -- discrete (nearest-rank) percentiles over INTEGER micros: the
    -- selected values are stored int64s, so no float enters until the
    -- final /1e6 — bit-stable across engines where interpolated
    -- quantile_cont on micro-precision values lands exactly on 1e-6
    -- boundaries and flips the driver hash. The CAST(r)/n >= q guard
    -- mirrors Spark percentile_disc's cume_dist rule literally.
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(sum(lat_us) AS DOUBLE) / count(*) / 1000000.0 AS mean_sec,
           min(CASE WHEN CAST(r AS DOUBLE) / n >= 0.50 THEN lat_us END)
             / 1000000.0 AS p50_sec,
           min(CASE WHEN CAST(r AS DOUBLE) / n >= 0.90 THEN lat_us END)
             / 1000000.0 AS p90_sec,
           min(CASE WHEN CAST(r AS DOUBLE) / n >= 0.99 THEN lat_us END)
             / 1000000.0 AS p99_sec
    FROM ranked
    """,
)
def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency distribution (mean / p50 / p90
    / p99) — the time-to-convert companion of funnel_conversion, and
    the number a growth team actually acts on.

    Both event legs collapse to one row per user BEFORE joining (min
    per user, map-side combined on the same user_id exchange the join
    then reuses), so the percentile input is user-cardinality. The
    exact percentile is a single aggregate over per-user latencies
    (percentile_disc partials, no global sort exchange of raw events).

    Driver-hash stability (round-6 audit): percentiles are DISCRETE
    (nearest-rank) over integer microseconds — a selected value is a
    stored int64, and the mean divides an exactly-summed int64 by the
    count in the same op order as the oracle, so every float output is
    bit-identical across engines. Interpolating percentiles over
    micro-precision seconds produced values exactly on 1e-6 rounding
    boundaries, which last-ulp engine drift then flips (measured
    1.15e-7 on 4 rows at sf0.01).
    """
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lat = s.join(p, "user_id").select(
        (
            F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
        ).alias("lat_us")
    )

    def disc(q: float):
        return (
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY lat_us)")
            .cast("double")
            / F.lit(1_000_000.0)
        )

    return lat.agg(
        F.count("*").alias("n_converted"),
        (F.sum("lat_us").cast("double") / F.count("*") / F.lit(1_000_000.0)).alias(
            "mean_sec"
        ),
        disc(0.50).alias("p50_sec"),
        disc(0.90).alias("p90_sec"),
        disc(0.99).alias("p99_sec"),
    )


# ---------------------------------------------------------------------------
# Exponential-decay lifetime value: the feature-store aggregate that
# weights each interaction by recency — recent activity dominates, old
# activity decays smoothly, and the whole feature is one scan.
# ---------------------------------------------------------------------------

_LTV_LAMBDA = 0.1  # per-day decay rate


@register(
    "user_ltv_decayed",
    oracle=f"""
    WITH ref AS (SELECT max(ts) AS t_ref FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value * exp(-{_LTV_LAMBDA}
               * ((epoch_us(ref.t_ref) - epoch_us(ts)) / 86400000000.0)))
             AS ltv_decayed,
           max(ts) AS last_seen
    FROM events, ref
    GROUP BY user_id
    """,
)
def user_ltv_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-weighted value: each event contributes
    value * exp(-lambda * age_days) against the corpus's newest
    timestamp — the standard decayed counter every feature store
    materializes for churn/LTV models (a half-life of ~7 days at
    lambda={_LTV_LAMBDA}).

    Scale shape: the reference time is a 1-row aggregate broadcast
    into a single map+reduce pass (user-keyed, map-side combined);
    age arithmetic is exact integer micros scaled identically on both
    engines, so the only cross-engine noise is libm exp() ulp drift —
    drift-class, parity-audited. A serving variant folds new events
    in incrementally as ltv' = ltv * exp(-lambda * dt) + value.
    """
    ev = table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("t_ref"))
    age_days = (
        F.unix_micros("t_ref") - F.unix_micros("ts")
    ) / F.lit(86400000000.0)
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.col("value") * F.exp(F.lit(-_LTV_LAMBDA) * age_days)
            ).alias("ltv_decayed"),
            F.max("ts").alias("last_seen"),
        )
    )


# ---------------------------------------------------------------------------
# Markov stationary behavior profile: the long-run fraction of time a
# user's journey spends in each event state — power-iterated from the
# transition counts, with the matrix solve on BOUNDED state (one cell
# per state pair; states = event types).
# ---------------------------------------------------------------------------

_MARKOV_ITERS = 200


@register(
    "events_markov_stationary",
    # Oracle-ized (round 11, formerly rows-only): fixed-count power
    # iteration with the operand order pinned on BOTH sides — the
    # recursive CTE replays the identical float sequence the driver
    # loop produces (the events_bradley_terry idiom: list(... ORDER BY)
    # freezes matrix layout, list_sum runs the same left-to-right
    # accumulation as the Python inner loop), so the values are
    # bit-equal, not merely close.
    oracle=f"""
    WITH RECURSIVE
    ordered AS (
      SELECT event_type AS s_to,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s_from
      FROM events
    ),
    trans AS (
      SELECT s_from, s_to, CAST(count(*) AS BIGINT) AS n
      FROM ordered WHERE s_from IS NOT NULL GROUP BY s_from, s_to
    ),
    visits AS (
      SELECT event_type AS state, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type
    ),
    states AS (
      SELECT state, cnt,
             CAST(row_number() OVER (ORDER BY state) AS INT) AS idx
      FROM visits
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
    rowsum AS (
      SELECT s_from, CAST(sum(n) AS DOUBLE) AS tot
      FROM trans GROUP BY s_from
    ),
    grid AS (
      SELECT si.idx AS i, sj.idx AS j,
             CASE WHEN r.tot IS NULL THEN 1.0 / (SELECT n FROM nn)
                  ELSE CAST(coalesce(t.n, 0) AS DOUBLE) / r.tot
             END AS p
      FROM states si CROSS JOIN states sj
      LEFT JOIN rowsum r ON r.s_from = si.state
      LEFT JOIN trans t ON t.s_from = si.state AND t.s_to = sj.state
    ),
    rows_ AS (SELECT i, list(p ORDER BY j) AS r FROM grid GROUP BY i),
    mat AS (SELECT (SELECT list(r ORDER BY i) FROM rows_) AS pm),
    it AS (
      SELECT 0 AS k,
             (SELECT list(1.0 / (SELECT n FROM nn) ORDER BY idx)
              FROM states) AS pi
      UNION ALL
      SELECT k + 1,
             list_transform(range(1, len(pi) + 1), j ->
               list_sum(list_transform(range(1, len(pi) + 1), i ->
                 pi[i] * m.pm[i][j])))
      FROM it, mat m WHERE k < {_MARKOV_ITERS}
    ),
    fin AS (SELECT pi FROM it WHERE k = {_MARKOV_ITERS}),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tv FROM visits)
    SELECT s.state AS state,
           fin.pi[s.idx] AS stationary,
           CAST(s.cnt AS DOUBLE) / tot.tv AS visit_share,
           abs(fin.pi[s.idx] - CAST(s.cnt AS DOUBLE) / tot.tv) AS gap
    FROM states s, fin, tot
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain:
    transition counts come from ONE distributed window pass (lag of
    event_type per user), the row-normalized matrix is
    states x states — bounded by the event-type vocabulary, a handful
    of cells at any corpus size — and the driver power-iterates
    pi' = pi P a FIXED {_MARKOV_ITERS} times (no early exit, so the
    oracle's recursive CTE replays the identical float sequence:
    inner sum over source states in index order, outer vector in
    destination order — mirroring the list_transform/list_sum shape).
    Output: state, stationary probability, empirical visit share, and
    the gap between them (mixing diagnostic).

    Also verified by the pinned property test
    tests/test_round6.py::test_markov_stationary_fixed_point:
    pi P == pi to 1e-12 and pi sums to 1.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("s_from"),
            F.col("event_type").alias("s_to"),
        )
        .filter(F.col("s_from").isNotNull())
        .groupBy("s_from", "s_to")
        .agg(F.count("*").alias("n"))
        .collect()  # BOUNDED: one row per state pair
    )
    visits = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    states = sorted(visits)
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    counts = [[0] * n for _ in range(n)]
    for r in pairs:
        counts[idx[r["s_from"]]][idx[r["s_to"]]] = int(r["n"])
    rowsum = [sum(row) for row in counts]  # exact integer row masses
    # states with no outgoing edges restart uniformly (ergodicity
    # guard); division order matches the oracle's grid CTE cell-wise
    P = [
        [counts[i][j] / rowsum[i] for j in range(n)]
        if rowsum[i] > 0
        else [1.0 / n] * n
        for i in range(n)
    ]
    pi = [1.0 / n] * n
    for _ in range(_MARKOV_ITERS):
        nxt = []
        for j in range(n):
            acc = 0.0
            for i in range(n):  # i-order sum == the oracle's list_sum
                acc += pi[i] * P[i][j]
            nxt.append(acc)
        pi = nxt
    total_visits = sum(visits.values())
    out = [
        (
            s,
            float(pi[i]),
            visits[s] / total_visits,
            float(abs(pi[i] - visits[s] / total_visits)),
        )
        for i, s in enumerate(states)
    ]
    return spark.createDataFrame(
        out, "state string, stationary double, visit_share double, gap double"
    )


# ---------------------------------------------------------------------------
# Markov attribution (removal effect): which event types actually DRIVE
# conversion — model each user's pre-purchase journey as a Markov chain
# with absorbing CONV/NULL states, then credit each channel by how much
# conversion probability disappears when that channel is knocked out.
# ---------------------------------------------------------------------------


_ABS_ITERS = 200


@register(
    "events_markov_attribution",
    # Oracle-ized (round 11, formerly rows-only): the absorbing-chain
    # solve is restated as a FIXED-count Neumann iteration b <- Q b + r
    # (b = P(absorb in CONV | start state), exact solution of
    # (I - Q) b = r as the iteration count -> inf; 200 iterations is
    # far past convergence for any row-stochastic Q). Operand order is
    # pinned on both sides per the events_bradley_terry idiom, so the
    # recursive CTE replays the driver loop's exact float sequence —
    # one iteration chain PER knockout, all advancing in lockstep
    # through the single recursive table keyed by ko.
    oracle=f"""
    WITH RECURSIVE
    fp AS (
      SELECT user_id, ts AS fts, event_id AS fid
      FROM (SELECT user_id, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase')
      WHERE rn = 1
    ),
    journey AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type
      FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
      WHERE fp.user_id IS NULL
         OR e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id <= fp.fid)
    ),
    steps AS (
      SELECT coalesce(lag(event_type) OVER w, 'START') AS s_from,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
                  ELSE event_type END AS s_to,
             lead(event_type) OVER w AS nxt
      FROM journey
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    trans AS (
      SELECT s_from, s_to FROM steps
      UNION ALL
      SELECT s_to AS s_from, 'NULL' AS s_to FROM steps
      WHERE nxt IS NULL AND s_to <> 'CONV'
    ),
    cnts AS (
      SELECT s_from, s_to, CAST(count(*) AS BIGINT) AS n
      FROM trans GROUP BY s_from, s_to
    ),
    sts AS (
      SELECT state,
             CAST(row_number() OVER (
               ORDER BY CASE state WHEN 'START' THEN 0
                                   WHEN 'CONV' THEN 2
                                   WHEN 'NULL' THEN 3 ELSE 1 END,
                        state) AS INT) AS idx
      FROM (SELECT s_from AS state FROM cnts
            UNION SELECT s_to FROM cnts
            UNION SELECT 'START' UNION SELECT 'CONV'
            UNION SELECT 'NULL')
    ),
    chans AS (
      SELECT state FROM sts WHERE state NOT IN ('START', 'CONV', 'NULL')
    ),
    trs AS (SELECT state, idx FROM sts WHERE state NOT IN ('CONV', 'NULL')),
    kos AS (SELECT '__FULL__' AS ko UNION ALL SELECT state FROM chans),
    rowsum AS (
      SELECT s_from, CAST(sum(n) AS DOUBLE) AS tot
      FROM cnts GROUP BY s_from
    ),
    cgrid AS (
      SELECT k.ko, c.s_from,
             CASE WHEN c.s_to = k.ko THEN 'NULL' ELSE c.s_to END AS s_to,
             CAST(sum(c.n) AS BIGINT) AS n
      FROM cnts c CROSS JOIN kos k
      GROUP BY 1, 2, 3
    ),
    qgrid AS (
      SELECT k.ko, si.idx AS i, sj.idx AS j,
             CASE WHEN si.state = k.ko THEN 0.0
                  WHEN r.tot IS NULL THEN 0.0
                  ELSE CAST(coalesce(g.n, 0) AS DOUBLE) / r.tot END AS q
      FROM kos k
      CROSS JOIN trs si CROSS JOIN trs sj
      LEFT JOIN rowsum r ON r.s_from = si.state
      LEFT JOIN cgrid g ON g.ko = k.ko AND g.s_from = si.state
                       AND g.s_to = sj.state
    ),
    rgrid AS (
      SELECT k.ko, si.idx AS i,
             CASE WHEN si.state = k.ko THEN 0.0
                  WHEN r.tot IS NULL THEN 0.0
                  ELSE CAST(coalesce(g.n, 0) AS DOUBLE) / r.tot END AS rv
      FROM kos k CROSS JOIN trs si
      LEFT JOIN rowsum r ON r.s_from = si.state
      LEFT JOIN cgrid g ON g.ko = k.ko AND g.s_from = si.state
                       AND g.s_to = 'CONV'
    ),
    qrows AS (
      SELECT ko, i, list(q ORDER BY j) AS qr FROM qgrid GROUP BY ko, i
    ),
    mats AS (
      SELECT q.ko, q.qm, r.rvv
      FROM (SELECT ko, list(qr ORDER BY i) AS qm FROM qrows GROUP BY ko) q
      JOIN (SELECT ko, list(rv ORDER BY i) AS rvv
            FROM rgrid GROUP BY ko) r ON r.ko = q.ko
    ),
    it AS (
      -- CAST in the anchor is load-bearing: a bare 0.0 literal would
      -- type the recursive column LIST(DECIMAL(1,1)) and silently
      -- round EVERY iterate to one decimal place
      SELECT ko, 0 AS k2,
             list_transform(rvv, x -> CAST(0.0 AS DOUBLE)) AS b,
             qm, rvv
      FROM mats
      UNION ALL
      SELECT ko, k2 + 1,
             list_transform(range(1, len(b) + 1), i ->
               list_sum(list_transform(range(1, len(b) + 1), j ->
                 qm[i][j] * b[j])) + rvv[i]),
             qm, rvv
      FROM it WHERE k2 < {_ABS_ITERS}
    ),
    pconv AS (SELECT ko, b[1] AS p FROM it WHERE k2 = {_ABS_ITERS}),
    fullp AS (SELECT p FROM pconv WHERE ko = '__FULL__'),
    eff AS (
      SELECT c.state AS channel,
             f.p AS p_conv_full,
             pc.p AS p_conv_removed,
             greatest(f.p - pc.p, 0.0) AS removal_effect
      FROM chans c
      JOIN pconv pc ON pc.ko = c.state
      CROSS JOIN fullp f
    ),
    te AS (
      SELECT CASE WHEN s = 0 THEN 1.0 ELSE s END AS s
      FROM (SELECT list_sum(list(removal_effect ORDER BY channel)) AS s
            FROM eff)
    ),
    touch AS (
      SELECT s_to AS channel, CAST(sum(n) AS BIGINT) AS n_touches
      FROM cnts GROUP BY s_to
    )
    SELECT e.channel,
           CAST(coalesce(t.n_touches, 0) AS BIGINT) AS n_touches,
           e.p_conv_full, e.p_conv_removed, e.removal_effect,
           e.removal_effect / te.s AS attribution
    FROM eff e LEFT JOIN touch t ON t.channel = e.channel, te
    """,
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over the event-type channels: the
    distributed pass builds per-user journeys (events up to the first
    purchase, START prefix, CONV/NULL absorbing ends) and reduces them
    to transition counts — bounded by (channels + 3)^2 cells at any
    corpus size. The driver computes P(conv) from START via a FIXED
    {_ABS_ITERS}-step Neumann iteration b <- Q b + r (replacing the
    former np.linalg.solve — same limit, but with a float sequence the
    oracle's recursive CTE replays exactly: inner products in column
    order, knockout chains advanced in lockstep), re-runs with each
    channel knocked out (its inbound mass redirected to NULL), and
    normalizes the drops into attribution shares.

    Round 11 also fixed a set-precedence slip in the channel
    derivation: `a | b - c` bound as `a | (b - c)`, so 'START' (always
    present as a journey-head s_from) leaked into the channel list and
    emitted a meaningless knockout row; the parenthesized form keeps
    channels = real event types only.

    Pinned properties (tests/test_round6.py::test_markov_attribution):
    every knockout can only LOWER conversion probability (paths are
    removed, never added — and each Neumann iterate is monotone in the
    entrywise-smaller knocked-out (Q, r), so this holds at ANY fixed
    iteration count, not just in the limit), and shares sum to 1.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.struct("ts", "event_id"))
        )
        .over(Window.partitionBy("user_id"))
        .alias("first_purchase"),
    )
    journey = marked.filter(
        F.col("first_purchase").isNull()
        | (F.struct("ts", "event_id") <= F.col("first_purchase"))
    )
    steps = journey.select(
        "user_id",
        F.coalesce(F.lag("event_type").over(w), F.lit("START")).alias("s_from"),
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("s_to"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    trans = steps.select("s_from", "s_to").unionByName(
        # journeys that end without converting fall into NULL
        steps.filter(
            F.col("nxt").isNull() & (F.col("s_to") != "CONV")
        ).select(F.col("s_to").alias("s_from"), F.lit("NULL").alias("s_to"))
    )
    counts = (
        trans.groupBy("s_from", "s_to").agg(F.count("*").alias("n")).collect()
    )  # BOUNDED: (channels + 3)^2 cells

    channels = sorted(
        ({r["s_from"] for r in counts} | {r["s_to"] for r in counts})
        - {"START", "CONV", "NULL"}
    )
    states = ["START"] + channels + ["CONV", "NULL"]
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    t = n - 2  # transient block size (START + channels)
    conv_i = idx["CONV"]
    rowsum = [0] * n  # exact integer row masses (redirect-invariant:
    for r in counts:  # a knockout moves mass between columns only)
        rowsum[idx[r["s_from"]]] += int(r["n"])

    def p_conv(knockout: str | None) -> float:
        cmat = [[0] * n for _ in range(n)]
        for r in counts:
            dst = r["s_to"]
            if knockout is not None and dst == knockout:
                dst = "NULL"
            cmat[idx[r["s_from"]]][idx[dst]] += int(r["n"])
        # transient-block Q and the CONV absorption column r, division
        # order matching the oracle's qgrid/rgrid cells; the knocked-out
        # row and dead rows (no outgoing mass) are all-zero
        Q: list[list[float]] = []
        rv: list[float] = []
        for i in range(t):
            if (knockout is not None and states[i] == knockout) or rowsum[
                i
            ] == 0:
                Q.append([0.0] * t)
                rv.append(0.0)
            else:
                Q.append([cmat[i][j] / rowsum[i] for j in range(t)])
                rv.append(cmat[i][conv_i] / rowsum[i])
        b = [0.0] * t
        for _ in range(_ABS_ITERS):
            nb = []
            for i in range(t):
                acc = 0.0
                for j in range(t):  # j-order sum == the oracle's list_sum
                    acc += Q[i][j] * b[j]
                nb.append(acc + rv[i])
            b = nb
        return b[idx["START"]]

    full = p_conv(None)
    touches = {
        c: sum(r["n"] for r in counts if r["s_to"] == c) for c in channels
    }
    removed = {c: p_conv(c) for c in channels}
    effects = {c: max(full - removed[c], 0.0) for c in channels}
    total_effect = sum(effects.values()) or 1.0
    out = [
        (
            c,
            int(touches[c]),
            full,
            removed[c],
            effects[c],
            effects[c] / total_effect,
        )
        for c in channels
    ]
    return spark.createDataFrame(
        out,
        "channel string, n_touches long, p_conv_full double, "
        "p_conv_removed double, removal_effect double, attribution double",
    )


# ---------------------------------------------------------------------------
# Entropy rate of the behavior chain: how predictable the NEXT action
# is given the current one — the single number that separates
# scripted/bot traffic (near 0) from diverse organic behavior.
# ---------------------------------------------------------------------------


@register(
    "events_entropy_rate",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), c AS (
      SELECT prev AS s_from, event_type AS s_to,
             CAST(count(*) AS BIGINT) AS n
      FROM ordered WHERE prev IS NOT NULL GROUP BY 1, 2
    ), row_tot AS (
      SELECT s_from, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY s_from
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS all_n FROM c)
    SELECT c.s_from AS state,
           r.row_n AS n_out,
           -sum(((1.0 * c.n) / r.row_n) * ln((1.0 * c.n) / r.row_n))
             AS h_state,
           ((1.0 * r.row_n) / t.all_n) AS weight
    FROM c JOIN row_tot r USING (s_from) CROSS JOIN tot t
    GROUP BY c.s_from, r.row_n, t.all_n
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy H(next | state) with the state's
    empirical weight — the weighted sum is the chain's entropy rate.
    Near-zero rows are the scripted flows; log(n_states)-ish rows are
    anybody's-guess states.

    Scale shape: one lag-window pass (user-keyed) collapses to
    state-pair counts; everything after runs on the bounded state
    vocabulary. Probabilities are single int/int divisions; the
    entropy sum groups a bounded handful of terms (drift-class only).
    Bounds are pinned: 0 <= h_state <= ln(n_states), weights sum to 1
    (tests/test_round6.py::test_entropy_rate_bounds).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        ev.select(
            F.lag("event_type").over(w).alias("s_from"),
            F.col("event_type").alias("s_to"),
        )
        .filter(F.col("s_from").isNotNull())
        .groupBy("s_from", "s_to")
        .agg(F.count("*").alias("n"))
    )
    row_tot = c.groupBy("s_from").agg(F.sum("n").alias("row_n"))
    tot = c.agg(F.sum("n").alias("all_n"))
    p = (F.lit(1.0) * F.col("n")) / F.col("row_n")
    return (
        c.join(F.broadcast(row_tot), "s_from")
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("s_from").alias("state"),
            F.col("row_n").alias("n_out"),
            "all_n",
        )
        .agg((-F.sum(p * F.log(p))).alias("h_state"))
        .select(
            "state",
            "n_out",
            "h_state",
            ((F.lit(1.0) * F.col("n_out")) / F.col("all_n")).alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier retention: the survival curve of user lifetimes with
# right-censoring — users still active at the corpus edge are censored,
# not churned, which is exactly what naive retention curves get wrong.
# ---------------------------------------------------------------------------


@register(
    "user_retention_kaplan_meier",
    oracle="""
    WITH span AS (
      SELECT user_id,
             CAST(min(CAST(ts AS DATE)) AS DATE) AS first_day,
             CAST(max(CAST(ts AS DATE)) AS DATE) AS last_day
      FROM events GROUP BY user_id
    ), mx AS (SELECT max(last_day) AS max_day FROM span),
    life AS (
      SELECT user_id,
             date_diff('day', first_day, last_day) AS t_days,
             (last_day < mx.max_day) AS churned
      FROM span, mx
    ), steps AS (
      SELECT t_days,
             CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
               AS n_churn,
             CAST(count(*) AS BIGINT) AS n_ending
      FROM life GROUP BY t_days
    ), risk AS (
      SELECT t_days, n_churn,
             CAST(sum(n_ending) OVER (ORDER BY t_days DESC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_risk
      FROM steps
    )
    SELECT t_days, n_risk, n_churn,
           product(1.0 - (1.0 * n_churn) / n_risk)
             OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING) AS km_survival
    FROM risk
    """,
)
def user_retention_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM estimator over user activity lifespans (first to last active
    day): a user whose last activity touches the corpus's final day is
    CENSORED (they may still be alive), everyone else churns at their
    observed duration. S(t) multiplies the per-step hazards
    (1 - churned/at-risk) in duration order — the censoring-aware
    retention curve.

    Scale shape: the per-user span is one map-side-combined aggregate;
    the KM table lives on DISTINCT durations (calendar-bounded), where
    the at-risk counts are a reverse cumulative sum and the survival
    product is an ordered window over the same bounded rows. Hazard
    factors are single int/int divisions; the running product
    multiplies identical doubles in identical order on both engines
    (parity-audited).
    """
    ev = table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    mx = span.agg(F.max("last_day").alias("max_day"))
    life = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("t_days"),
        (F.col("last_day") < F.col("max_day")).alias("churned"),
    )
    steps = life.groupBy("t_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("n_churn"),
        F.count("*").alias("n_ending"),
    )
    w_desc = (
        Window.orderBy(F.col("t_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = steps.withColumn("n_risk", F.sum("n_ending").over(w_desc))
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hazard = F.lit(1.0) - (F.lit(1.0) * F.col("n_churn")) / F.col("n_risk")
    return risk.select(
        "t_days",
        "n_risk",
        "n_churn",
        F.product(hazard).over(w_asc).alias("km_survival"),
    )
