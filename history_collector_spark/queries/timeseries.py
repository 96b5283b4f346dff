"""Ordered event-time analytics over the events stream.

The reference processes ledgers strictly in arrival order and leaves all
time-series analysis to its Postgres consumers (sample/main.py:25); these
queries are that consumer surface, re-expressed as distributed Spark
plans. Every query here shuffles AT MOST ONCE, on ``user_id`` (or the
group key) — the window/lag/lead work then happens inside each partition
with no further exchange, which is the shape that survives 100 TB: the
per-user event history is bounded, the user-key cardinality is huge (good
parallelism), and nothing ever sorts globally.

Tie-breaks: events can share a timestamp, so every ordered window sorts
by (ts, event_id) — event_id is unique, making all lag/lead/first/last
results deterministic and oracle-comparable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from history_collector_spark.catalog import table
from history_collector_spark.registry import register

# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user.
# ---------------------------------------------------------------------------


@register(
    "user_active_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gaps-and-islands via the date-minus-row_number anchor: days
    in one unbroken run share (d - rank), so the island id needs no
    iterative propagation — one user-partitioned window plus two
    aggregations, all on the same user_id partitioning (Catalyst reuses
    the exchange; only the distinct adds a shuffle, keyed on
    (user_id, d) which co-partitions with user_id downstream)."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("anchor", F.date_sub("d", F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
    )


# ---------------------------------------------------------------------------
# Debounce dedup: drop events that repeat the same (user, type) within a
# 5-minute refractory window of the previously KEPT occurrence's lag —
# the streaming-dedup batch twin with a time horizon instead of a key set.
# ---------------------------------------------------------------------------


@register(
    "event_debounce",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM x WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL '5 minutes'
    """,
)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep an event only if the previous event of the same
    (user_id, event_type) is more than 5 minutes older (or absent).
    One (user_id, event_type) shuffle; the lag is a single pass per
    partition. Note the rule is lag-based (vs the last KEPT row), so it
    stays a stateless window — the stateful keep-chain variant is the
    streaming dedup in streaming/ with applyInPandasWithState."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_us", F.unix_micros("ts") - prev_us)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > 300_000_000))
        .select("event_id", "user_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# Time-weighted average: each reading holds until the next one, so its
# weight is the duration to the successor (last reading carries none).
# ---------------------------------------------------------------------------


@register(
    "time_weighted_avg",
    oracle="""
    WITH x AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           sum(value * dur_us) / sum(dur_us) AS twa_value,
           CAST(sum(dur_us) AS BIGINT) AS span_us
    FROM x WHERE dur_us IS NOT NULL GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean of `value` per user (sensor/price TWA
    semantics). The lead() and the final agg share the user_id
    partitioning — one exchange total."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    return (
        ev.withColumn("dur_us", dur)
        .filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            (F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")).alias(
                "twa_value"
            ),
            F.sum("dur_us").alias("span_us"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC bars: per (event_type, hour) open/high/low/close in ARRIVAL order
# (event_id), the reference's native ordering (python/main.py:79-83
# processes ledgers strictly by sequence number).
# ---------------------------------------------------------------------------


@register(
    "event_ohlc_bars",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS bar_start,
           arg_min(value, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, event_id) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks,
           sum(value) AS volume
    FROM events GROUP BY 1, 2
    """,
)
def event_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single groupBy — min_by/max_by make open/close plain aggregates
    (map-side combinable) instead of a window + filter, so the shuffle
    carries one partial row per (type, hour, input partition), not the
    ticks. event_id (unique) is the arrival-order key, so open/close
    are deterministic even with timestamp ties."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_start")
    ).agg(
        F.min_by("value", "event_id").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "event_id").alias("close"),
        F.count("*").alias("n_ticks"),
        F.sum("value").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Forward-fill: sparse readings (only every 5th props.k emits one) are
# carried forward within each user's timeline — last non-null wins.
# ---------------------------------------------------------------------------


@register(
    "event_forward_fill",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, ts,
             CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) % 5 = 0
                  THEN value END AS reading
      FROM events
    )
    SELECT event_id, user_id, ts, reading,
           last_value(reading IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM x
    """,
)
def event_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF imputation: F.last(ignorenulls) over a running frame is a
    single linear pass per user partition — no self-join against 'the
    most recent non-null', which is the quadratic trap. The sparse
    `reading` is derived (props.k % 5 == 0) so the query is
    self-contained on the stock events table."""
    ev = table(spark, sf_dir, "events")
    reading = F.when(
        F.get_json_object("props", "$.k").cast("int") % 5 == 0, F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("reading", reading).select(
        "event_id",
        "user_id",
        "ts",
        "reading",
        F.last("reading", ignorenulls=True).over(w).alias("filled"),
    )


# ---------------------------------------------------------------------------
# Interval coverage: each event holds a resource for `value` seconds;
# merge each user's overlapping holds and report the covered span.
# ---------------------------------------------------------------------------


@register(
    "interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e
      FROM events
    ), m AS (
      SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pm
      FROM iv
    ), isl AS (
      SELECT *, sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS island
      FROM m
    ), g AS (
      SELECT user_id, island, min(s) AS s, max(e) AS e
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(e - s) AS BIGINT) AS covered_us,
           CAST(max(e - s) AS BIGINT) AS longest_covered_us
    FROM g GROUP BY user_id
    """,
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping per-user intervals [ts, ts + value seconds]
    — the gaps-and-islands shape on SPANS instead of days: a new island
    starts exactly when an interval begins past the running max of all
    earlier ends (touching endpoints merge). One user_id shuffle; the
    running max, the island cumsum, and both aggregations all reuse the
    same partitioning. The duration is floored to whole microseconds on
    the DOUBLE input in both engines, so the island boundaries can
    never disagree on float rounding."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts") + F.floor(F.col("value") * F.lit(1000000.0))
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pm = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = iv.withColumn(
        "island",
        F.sum(
            F.when(pm.isNull() | (F.col("s") > pm), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(F.col("e") - F.col("s")).alias("covered_us"),
        F.max(F.col("e") - F.col("s")).alias("longest_covered_us"),
    )


# ---------------------------------------------------------------------------
# Rate cap: keep at most the first 3 events per (user, day) — the batch
# twin of an ingest quota / per-key sampling cap.
# ---------------------------------------------------------------------------


@register(
    "event_rate_cap",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS DATE) AS d,
           CAST(row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                   ORDER BY ts, event_id) AS BIGINT) AS rn
    FROM events
    QUALIFY rn <= 3
    """,
)
def event_rate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N-per-key-per-day cap (N=3). row_number over a
    (user_id, day) partition then filter — one shuffle on the capped
    key, and because the filter sits directly on the rank, Spark plans
    it as a rank-limited window (each task emits at most N rows per
    key, never buffering the full group)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    return (
        ev.withColumn("d", F.to_date("ts"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "d", "rn")
    )


# ---------------------------------------------------------------------------
# EWMA smoothing: the classic y_i = a*x_i + (1-a)*y_{i-1} recursion per
# user, evaluated in an Arrow-batched per-group kernel.
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.2


@register(
    "ewma_smoothing",
    oracle=f"""
    WITH x AS (
      SELECT event_id, user_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           power({1 - _EWMA_ALPHA}, k)
             * sum((CASE WHEN k = 1 THEN value
                         ELSE {_EWMA_ALPHA} * value END)
                   * power({1 - _EWMA_ALPHA}, -k))
               OVER (PARTITION BY user_id ORDER BY k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS ewma
    FROM x
    """,
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average (alpha=0.2,
    y_1 = x_1). The recursion is inherently sequential per key, but the
    per-KEY Python dispatch of groupBy().applyInPandas is not: with
    millions of small groups each group pays a separate function call
    and pandas-frame build (measured 4.19 s at sf0.1/local[32] for 1.5k
    groups of ~67 rows). The r15 rewrite keeps the identical one
    user_id shuffle but runs the recursion BATCH-wise (guide §4.2):
    repartition on user_id + sortWithinPartitions makes each group a
    contiguous, ordered run, and one cython groupby-ewm call per Arrow
    batch replaces thousands of per-group calls (measured 1.0 s).

    Exactness: pandas evaluates ewm(adjust=False) with the same
    y_i = (1-a)*y_{i-1} + a*x_i recursion whether called per group or
    through groupby().ewm(), so values are bit-identical. A group that
    straddles an Arrow-batch boundary is continued exactly by carrying
    its last smoothed value and prepending it as a synthetic seed row
    (y = a*x + (1-a)*carry IS the recursion's next step); the seed row
    is dropped from the output. tests/test_round15_opt.py pins the
    straddle path against the single-batch truth.

    The window-function closed form y_i = (1-a)^i * sum((1-a)^-j *
    term_j) would stay JVM-side but overflows double past ~3.5k rows
    per key — fine for the ORACLE (test depth <= ~100, all-positive
    sum so no cancellation), wrong as the engine path at 100 TB."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    n_parts = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(n_parts, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            _ewma_batches,
            schema="event_id long, user_id long, ts timestamp, "
            "value double, ewma double",
        )
    )


def _ewma_batches(batches):
    """Per-partition EWMA kernel: rows arrive sorted by (user_id, ts,
    event_id); one vectorized groupby-ewm per batch; cross-batch group
    continuation via the carry-and-seed trick (see ewma_smoothing)."""
    import numpy as np

    carry: dict = {}
    for pdf in batches:
        if len(pdf) == 0:
            yield pdf.assign(ewma=pd.Series(dtype="float64"))
            continue
        uids = pdf["user_id"].to_numpy()
        starts = np.empty(len(uids), dtype=bool)
        starts[0] = True
        np.not_equal(uids[1:], uids[:-1], out=starts[1:])
        start_idx = np.flatnonzero(starts)
        seed_pos = [int(i) for i in start_idx if uids[i] in carry]
        vals = pdf["value"].to_numpy(dtype="float64")
        if seed_pos:
            ins = np.asarray(seed_pos)
            gvals = np.insert(vals, ins, [carry[uids[i]] for i in seed_pos])
            guids = np.insert(uids, ins, uids[ins])
            synth = np.zeros(len(gvals), dtype=bool)
            synth[ins + np.arange(len(ins))] = True
        else:
            gvals, guids = vals, uids
            synth = np.zeros(len(gvals), dtype=bool)
        s = pd.Series(gvals)
        ew = (
            s.groupby(guids, sort=False)
            .ewm(alpha=_EWMA_ALPHA, adjust=False)
            .mean()
            .droplevel(0)
            .sort_index()
            .to_numpy()
        )
        # remember each group's last smoothed value for the next batch
        ends = np.empty(len(guids), dtype=bool)
        ends[-1] = True
        np.not_equal(guids[1:], guids[:-1], out=ends[:-1])
        for i in np.flatnonzero(ends):
            carry[guids[i]] = ew[i]
        yield pdf.assign(ewma=ew[~synth])


# ---------------------------------------------------------------------------
# Last-touch attribution: each purchase credits the most recent click
# by the same user within a 1-hour lookback — the marketing-analytics
# join expressed as a running conditional max (no self-join).
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "attribution_last_touch",
    oracle=f"""
    WITH x AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_us
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN us - last_click_us <= {_ATTR_WINDOW_US}
                THEN 1 ELSE 0 END AS attributed,
           CASE WHEN us - last_click_us <= {_ATTR_WINDOW_US}
                THEN us - last_click_us END AS latency_us
    FROM x WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with their click-to-purchase latency when a click by
    the same user happened within the preceding hour. The 'most recent
    click' is a running MAX over a conditional timestamp — monotone in
    event time, so no window-join against the click subset and no
    second shuffle; NULL comparisons make click-less purchases
    unattributed for free."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    ).over(w)
    gap = F.unix_micros("ts") - last_click
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.when(F.col("gap_us") <= _ATTR_WINDOW_US, 1)
            .otherwise(0)
            .alias("attributed"),
            F.when(
                F.col("gap_us") <= _ATTR_WINDOW_US, F.col("gap_us")
            ).alias("latency_us"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling median: 5-point median smoother — the robust denoiser a
# sensor pipeline runs where a mean would chase every spike.
# ---------------------------------------------------------------------------


@register(
    "rolling_median_smooth",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, ts, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
               AS win
      FROM events
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN len(win) = 5 THEN list_sort(win)[3] END AS med5
    FROM x
    """,
)
def rolling_median_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median of each reading and its 4 predecessors (null until the
    frame fills — a partial frame would bias the smoother). There is
    no built-in windowed median, so the bounded frame is collected
    (5 doubles per row, constant memory), sorted row-locally, and
    indexed — the list stays tiny by CONSTRUCTION, which is what makes
    this safe where collect_list over an unbounded frame would not
    be. One user_id shuffle, linear slide."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    win = F.collect_list("value").over(w)
    med5 = F.when(
        F.size(F.col("win")) == 5,
        F.element_at(F.array_sort("win"), 3),
    )
    return ev.select(
        "event_id", "user_id", "ts", "value", win.alias("win")
    ).select("event_id", "user_id", "ts", "value", med5.alias("med5"))


# ---------------------------------------------------------------------------
# Hourly regridding with linear interpolation: LOCF's two-sided sibling
# (event_forward_fill carries the last value; this one interpolates
# between the surrounding observations).
# ---------------------------------------------------------------------------


@register(
    "event_linear_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, max(value) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ), g AS (
      SELECT grid.user_id, grid.hr, obs.v FROM grid
      LEFT JOIN obs ON grid.user_id = obs.user_id AND grid.hr = obs.hr
    ), ctx AS (
      SELECT user_id, hr, v,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM g
    )
    SELECT user_id, hr,
      CASE
        WHEN v IS NOT NULL THEN v
        WHEN pv IS NULL THEN nv
        WHEN nv IS NULL THEN pv
        -- parens force (nv-pv) * (num/den): same IEEE-754 op sequence as
        -- the Spark side, so bit-equal given the bit-stable max() endpoints
        ELSE pv + (nv - pv) * ((epoch(hr) - epoch(pt)) / (epoch(nt) - epoch(pt)))
      END AS v_interp,
      (v IS NULL) AS was_gap
    FROM ctx
    """,
)
def event_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regrid each user's value series to an hourly grid, linearly
    interpolating gaps between the surrounding observations (two-sided,
    vs event_forward_fill's one-sided carry).

    The grid explodes sequence(min_hr, max_hr) per user — row growth is
    bounded by the time span (720 rows/user/month), NOT by event
    volume, and the raw stream is collapsed to hourly maxima first. One
    user_id shuffle covers the grid join and both fill windows
    (identical partitioning; Catalyst reuses the exchange). The
    interpolation weight uses epoch arithmetic, exact at microsecond
    resolution on both engines.
    """
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.max("value").alias("v"))
    # Segment-wise generation: one lead() pairs each observation with
    # its successor; each pair emits the hours [hr, next) with the
    # interpolated value computed ROW-LOCALLY from the two endpoints.
    # One user_id exchange, one window pass, one explode — the earlier
    # grid-plus-two-fill-windows formulation carried 4 window functions
    # over the full 720-hour grid and measured ~5x slower at sf0.1.
    # Every grid hour lies inside exactly one [obs, next-obs) segment
    # (the grid spans observed min..max), so the two forms agree.
    w = Window.partitionBy("user_id").orderBy("hr")
    seg = obs.withColumn("nhr", F.lead("hr").over(w)).withColumn(
        "nv", F.lead("v").over(w)
    )
    hours = F.when(
        F.col("nhr").isNull(), F.array(F.col("hr"))
    ).otherwise(
        F.sequence(
            "hr",
            F.col("nhr") - F.expr("interval 1 hour"),
            F.expr("interval 1 hour"),
        )
    )
    g = seg.select(
        "user_id", "hr", "v", "nhr", "nv", F.explode(hours).alias("grid_hr")
    )
    frac = (F.unix_micros("grid_hr") - F.unix_micros("hr")).cast("double") / (
        F.unix_micros("nhr") - F.unix_micros("hr")
    ).cast("double")
    at_obs = F.col("grid_hr") == F.col("hr")
    v_interp = F.when(at_obs, F.col("v")).otherwise(
        F.col("v") + (F.col("nv") - F.col("v")) * frac
    )
    # Driver-hash stability (round-5 red row): the endpoint aggregate is
    # max(value) — an order-INDEPENDENT reduction returning a stored
    # double, bit-identical on both engines — where avg(value) drifted
    # last-ulps with cross-engine summation order. Quantizing instead
    # (round 6 both sides) provably fails at rounding boundaries: ulp-
    # different averages flip to different sides (35/105k rows measured).
    # With bit-equal endpoints, `v + (nv - v) * frac` performs the same
    # IEEE-754 op sequence as the oracle's pv/nv form (the micros-vs-
    # seconds frac ratio is exact in both scalings), so the output is
    # bit-equal with no rounding at all.
    return g.select(
        "user_id",
        F.col("grid_hr").alias("hr"),
        v_interp.alias("v_interp"),
        (~at_obs).alias("was_gap"),
    )


# ---------------------------------------------------------------------------
# Seasonal index: day-of-week revenue profile vs the overall mean.
# ---------------------------------------------------------------------------


@register(
    "orders_seasonality_profile",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             dayofweek(o_orderdate) AS dow,
             sum(o_totalprice) AS rev,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), base AS (
      SELECT avg(rev) AS mean_daily_rev FROM daily
    )
    SELECT dow,
           CAST(count(*) AS BIGINT) AS n_days,
           avg(rev) AS avg_daily_rev,
           avg(rev) / mean_daily_rev AS seasonal_index,
           CAST(sum(n) AS BIGINT) AS n_orders
    FROM daily, base
    GROUP BY dow, mean_daily_rev
    """,
)
def orders_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index (avg revenue for the weekday over the
    all-days average) — the multiplicative seasonality factor a
    forecaster divides out before trend fitting.

    Events collapse to day grain FIRST (bounded by the calendar, not
    order volume), the overall mean is a 1-row broadcast, and the
    profile is a 7-key aggregate. DuckDB's dayofweek is 0-6
    Sunday-first; Spark's dayofweek is 1-7 Sunday-first, so the Spark
    side subtracts 1 to agree.
    """
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).agg(F.sum("o_totalprice").alias("rev"), F.count("*").alias("n"))
    base = daily.agg(F.avg("rev").alias("mean_daily_rev"))
    return (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow", "mean_daily_rev")
        .agg(
            F.count("*").alias("n_days"),
            F.avg("rev").alias("avg_daily_rev"),
            F.sum("n").alias("n_orders"),
        )
        .select(
            "dow",
            "n_days",
            "avg_daily_rev",
            (F.col("avg_daily_rev") / F.col("mean_daily_rev")).alias(
                "seasonal_index"
            ),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness: rolling 28-day distinct actives per day.
# ---------------------------------------------------------------------------


@register(
    "dau_mau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), days AS (
      SELECT DISTINCT d FROM du
    ), mau AS (
      SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS mau28
      FROM days JOIN du
        ON du.d <= days.d AND du.d > days.d - INTERVAL 28 DAY
      GROUP BY days.d
    ), dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
    )
    SELECT dau.d, dau.dau, mau.mau28,
           dau.dau / CAST(mau.mau28 AS DOUBLE) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-28-day-MAU per day — the engagement stickiness
    ratio. Distinct users don't sum across days, so the rolling count
    can't be a window over daily counts; the correct distributed form
    de-duplicates to (day, user) FIRST and range-joins that against
    the day grid (≤28-row fan-out per pair, bounded by the window —
    never a fan-out over raw events).

    The (day, user) distinct is the only full-data shuffle. The day
    grid is calendar-bounded and broadcast; the rolling distinct then
    groups on the grid day. At 100 TB the fan-out input is |active
    (day,user) pairs| x 28 — orders of magnitude under event volume.
    """
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "grid_d")
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    mau = (
        du.join(
            F.broadcast(days),
            (F.col("d") <= F.col("grid_d"))
            & (F.col("d") > F.date_sub(F.col("grid_d"), 28)),
        )
        .groupBy("grid_d")
        .agg(F.count_distinct("user_id").alias("mau28"))
    )
    return (
        dau.join(mau, dau.d == mau.grid_d)
        .select(
            "d",
            "dau",
            "mau28",
            (F.col("dau") / F.col("mau28").cast("double")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-changepoint detection via binary segmentation: recursively
# split the (bounded) daily series at the SSE-minimizing day — the
# multi-break extension of cusum_changepoint, with the recursion on
# calendar-bounded state and every heavy count distributed.
# ---------------------------------------------------------------------------

_BINSEG_MAX_CP = 5
_BINSEG_MIN_SEG = 3  # days per side

# One sse term from integer prefix sums: sse(lo, hi) =
# Q(lo,hi) - S(lo,hi)^2 / (hi-lo), every operand an exact BIGINT cast
# to double — identical IEEE sequence on both engines (the mul rounds
# once, the div rounds once), so split choices can never diverge.
_BSSE = (
    "(CAST({q1} - {q0} AS DOUBLE)"
    " - CAST({p1} - {p0} AS DOUBLE) * CAST({p1} - {p0} AS DOUBLE)"
    " / ({hi} - {lo}))"
)


def _binseg_oracle() -> str:
    """Greedy binary segmentation as {_BINSEG_MAX_CP} mechanical CTE
    layers (the chained-MMR idiom): each layer scores every admissible
    cut of every current segment from the shared integer prefix-sum
    table, takes the per-segment argmax (ties -> smallest cut, as the
    driver loop's strict > keeps the first), takes the global argmax
    (ties -> larger cut then larger lo, mirroring Python tuple max),
    and rewrites the segment set. A layer with no positive-gain
    candidate picks nothing and passes its segments through — the
    early-stop for free."""

    def sse(lo, hi, plo, phi, qlo, qhi):
        return _BSSE.format(p0=plo, p1=phi, q0=qlo, q1=qhi, lo=lo, hi=hi)

    layers = []
    for k in range(_BINSEG_MAX_CP):
        s, p = f"segs{k}", f"pick{k}"
        gain = (
            sse(f"s.lo", f"s.hi", "plo.p", "phi.p", "plo.q", "phi.q")
            + " - "
            + sse("s.lo", "c.i", "plo.p", "c.p", "plo.q", "c.q")
            + " - "
            + sse("c.i", "s.hi", "c.p", "phi.p", "c.q", "phi.q")
        )
        layers.append(f"""
    cand{k} AS MATERIALIZED (
      SELECT s.lo, s.hi, c.i AS cut, {gain} AS gain,
             row_number() OVER (PARTITION BY s.lo, s.hi
                                ORDER BY {gain} DESC, c.i ASC) AS rn
      FROM {s} s
      JOIN pref c ON c.i >= s.lo + {_BINSEG_MIN_SEG}
                 AND c.i <= s.hi - {_BINSEG_MIN_SEG}
      JOIN pref plo ON plo.i = s.lo
      JOIN pref phi ON phi.i = s.hi
      WHERE s.hi - s.lo >= {2 * _BINSEG_MIN_SEG}
    ),
    {p} AS MATERIALIZED (
      SELECT lo, hi, cut, gain FROM cand{k}
      WHERE rn = 1 AND gain > 0
      ORDER BY gain DESC, cut DESC, lo DESC LIMIT 1
    ),
    segs{k + 1} AS MATERIALIZED (
      SELECT s.lo, s.hi FROM {s} s
      LEFT JOIN {p} p ON p.lo = s.lo AND p.hi = s.hi
      WHERE p.lo IS NULL
      UNION ALL SELECT lo, cut FROM {p}
      UNION ALL SELECT cut, hi FROM {p}
    ),
    found{k} AS MATERIALIZED (
      SELECT {k} AS split_order, p.cut, p.gain, p.lo, p.hi FROM {p} p
    )""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM found{k}" for k in range(_BINSEG_MAX_CP)
    )
    return f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    ds AS MATERIALIZED (
      SELECT day, CAST(row_number() OVER (ORDER BY day) AS INT) AS i,
             CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS p,
             CAST(sum(n * n) OVER (ORDER BY day) AS BIGINT) AS q
      FROM daily
    ),
    pref AS MATERIALIZED (
      SELECT CAST(0 AS INT) AS i, CAST(0 AS BIGINT) AS p,
             CAST(0 AS BIGINT) AS q
      UNION ALL SELECT i, p, q FROM ds
    ),
    segs0 AS MATERIALIZED (
      SELECT CAST(0 AS INT) AS lo, CAST(count(*) AS INT) AS hi FROM ds
    ),{",".join(layers)},
    allfound AS ({unions})
    SELECT CAST(f.split_order AS INT) AS split_order,
           CAST(d.day AS TIMESTAMP) AS change_day,
           f.gain AS sse_gain,
           CAST(pc.p - plo.p AS DOUBLE) / (f.cut - f.lo) AS mean_before,
           CAST(phi.p - pc.p AS DOUBLE) / (f.hi - f.cut) AS mean_after
    FROM allfound f
    JOIN ds d ON d.i = f.cut + 1
    JOIN pref pc ON pc.i = f.cut
    JOIN pref plo ON plo.i = f.lo
    JOIN pref phi ON phi.i = f.hi
    """


@register("event_changepoints_binseg", oracle=_binseg_oracle())
def event_changepoints_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BINSEG_MAX_CP} changepoints of the daily event-count
    series by greedy binary segmentation: each step splits the segment
    whose best within-segment split removes the most squared error.
    The distributed work is the one daily aggregate (map-side
    combined); the recursion runs driver-side on the CALENDAR-bounded
    series (days, not events — ~30 rows/month regardless of volume),
    the same bounded-state discipline as the whitening eigh and the
    k-means loop.

    Oracle-ized in round 11 (formerly rows-only "recursion is not
    SQL"): both sides now compute every sse from EXACT integer prefix
    sums, sse = Q - S*S/len with one double multiply and one divide on
    exactly-representable integers — bit-identical across engines, so
    the greedy argmax sequence is deterministic and the recursion
    unrolls into {_BINSEG_MAX_CP} mechanical CTE layers (see
    _binseg_oracle). Tie-breaking is pinned: per-segment first-best
    (smallest cut), global Python-tuple max (largest cut, then lo).

    Also verified by tests/test_round6.py::test_binseg_changepoints:
    every reported split has positive gain, splits respect the
    min-segment guard, and gains are non-increasing (greedy order).
    """
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
        .collect()  # BOUNDED: one row per calendar day
    )
    days = [r["day"] for r in daily]
    yint = [int(r["n"]) for r in daily]
    P = [0]
    Q = [0]
    for v in yint:
        P.append(P[-1] + v)
        Q.append(Q[-1] + v * v)

    def sse(lo: int, hi: int) -> float:  # [lo, hi)
        if hi <= lo:
            return 0.0
        s = float(P[hi] - P[lo])
        q = float(Q[hi] - Q[lo])
        # float(s) * float(s): the mul rounds once, matching the
        # oracle's DOUBLE multiply (NOT exact-int s*s then one divide)
        return q - s * s / (hi - lo)

    def best_split(lo: int, hi: int):
        base = sse(lo, hi)
        best = (0.0, None)
        for cut in range(lo + _BINSEG_MIN_SEG, hi - _BINSEG_MIN_SEG + 1):
            gain = base - sse(lo, cut) - sse(cut, hi)
            if best[1] is None or gain > best[0]:
                best = (gain, cut)
        return best

    segments = [(0, len(yint))]
    found: list[tuple] = []
    for order in range(_BINSEG_MAX_CP):
        candidates = []
        for lo, hi in segments:
            if hi - lo >= 2 * _BINSEG_MIN_SEG:
                gain, cut = best_split(lo, hi)
                if cut is not None and gain > 0:
                    candidates.append((gain, cut, lo, hi))
        if not candidates:
            break
        gain, cut, lo, hi = max(candidates)
        lmean = float(P[cut] - P[lo]) / (cut - lo)
        rmean = float(P[hi] - P[cut]) / (hi - cut)
        found.append((order, days[cut], float(gain), lmean, rmean))
        segments.remove((lo, hi))
        segments += [(lo, cut), (cut, hi)]
    return spark.createDataFrame(
        found,
        "split_order int, change_day timestamp, sse_gain double, "
        "mean_before double, mean_after double",
    )


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing per event type — the
# classic level+trend forecaster a metrics pipeline fits per series.
# alpha = 1/2, beta = 1/4 (dyadic, so the smoothing multiplies are
# exact); the sequential recurrence is an ORDERED LEFT FOLD over the
# hourly series, replayed bit-for-bit by the oracle with DuckDB's
# list_reduce over the same ordered list (the DSIR list_sum idiom,
# generalized to struct state).
# ---------------------------------------------------------------------------


@register(
    "events_holt_linear",
    oracle="""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS micros
      FROM events GROUP BY 1, 2
    ),
    pts AS (
      SELECT event_type,
             list(CAST(micros AS DOUBLE) / 1000000 ORDER BY h) AS vs,
             CAST(count(*) AS BIGINT) AS n_hours
      FROM hourly GROUP BY 1
    ),
    -- sequential recurrence as a recursive CTE (NOT list_reduce: DuckDB
    -- 1.0 mis-evaluates lambdas whose struct fields share duplicated
    -- subexpressions — trend/sse read partially-updated state; see
    -- SCALING.md round-8 notes). Anchor columns cast explicitly.
    f AS (
      SELECT event_type, vs, n_hours, CAST(1 AS BIGINT) AS i,
             CAST(vs[1] AS DOUBLE) AS level,
             CAST(0.0 AS DOUBLE) AS trend,
             CAST(0.0 AS DOUBLE) AS sse
      FROM pts
      UNION ALL
      SELECT event_type, vs, n_hours, i + 1,
             0.5 * vs[i + 1] + 0.5 * (level + trend),
             0.125 * (vs[i + 1] - level) + 0.875 * trend,
             sse + (vs[i + 1] - (level + trend))
                   * (vs[i + 1] - (level + trend))
      FROM f WHERE i < n_hours
    )
    SELECT event_type, n_hours, level, trend,
           level + trend AS forecast_next, sse
    FROM f WHERE i = n_hours
    """,
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (alpha=1/2, beta=1/4) over each
    event type's hourly value series: final level/trend state, the
    one-step-ahead forecast, and the in-sample one-step SSE.

    The update uses the factored dyadic form (identical on BOTH
    engines, term for term):
      level' = 0.5*v + 0.5*(level + trend)
      trend' = 0.125*(v - level) + 0.875*trend
      sse'   = sse + (v - (level + trend))^2
    (algebraically 0.25*(level'-level) + 0.75*trend, factored so no
    subexpression repeats across state fields).

    Parity engineering: hourly sums quantize to exact BIGINT micros
    (raw double sums would be aggregation-order-dependent), v =
    micros/1e6 is one deterministic division, and the inherently
    sequential recurrence runs as an ordered left fold here
    (F.aggregate over the hour-sorted array) and as a recursive CTE in
    the oracle — the engine's list_reduce was rejected after it
    mis-evaluated duplicated lambda subexpressions (caught by the
    parity gate, documented in SCALING.md). EXACT, no tolerance.

    Scale shape: one (type, hour) aggregate with map-side combine
    (bounded: types x hours), then a per-type fold over its own
    bounded series — per-series state is 3 doubles no matter how many
    raw events flow in. Missing hours are skipped (the observed grid
    is the series), deterministically on both engines.
    """
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias(
            "micros"
        )
    )
    pts = hourly.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "h", (F.col("micros") / F.lit(1000000.0)).alias("v")
                    )
                )
            ),
            lambda p: p.v,
        ).alias("vs"),
        F.count("*").alias("n_hours"),
    )
    zero = F.struct(
        F.lit(0.0).alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("sse"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(s, v):
        first = s.n == 0
        return F.struct(
            F.when(first, v)
            .otherwise(F.lit(0.5) * v + F.lit(0.5) * (s.level + s.trend))
            .alias("level"),
            F.when(first, F.lit(0.0))
            .otherwise(
                F.lit(0.125) * (v - s.level) + F.lit(0.875) * s.trend
            )
            .alias("trend"),
            F.when(first, F.lit(0.0))
            .otherwise(
                s.sse
                + (v - (s.level + s.trend)) * (v - (s.level + s.trend))
            )
            .alias("sse"),
            (s.n + 1).alias("n"),
        )

    folded = pts.select(
        "event_type",
        "n_hours",
        F.aggregate("vs", zero, step).alias("s"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        F.col("s.level").alias("level"),
        F.col("s.trend").alias("trend"),
        (F.col("s.level") + F.col("s.trend")).alias("forecast_next"),
        F.col("s.sse").alias("sse"),
    )
