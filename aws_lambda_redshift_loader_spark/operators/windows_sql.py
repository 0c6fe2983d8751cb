"""Event-time windowing over the `events` table (SURVEY.md §2.9 T10).

The reference batches at *file* grain only; row-grain time windows are the
engine-surface extension the driver's `events` fixture exercises. These are
the batch-mode forms (same `F.window`/`F.session_window` expressions Spark
uses in Structured Streaming — see streaming.stream_queries for the actual
readStream variant sharing the same oracle).

Determinism: window starts are epoch-aligned in both engines (Spark
`window()` floors to the slide from the epoch; DuckDB `date_trunc`/
`time_bucket` likewise), sums go through DECIMAL, starts are emitted as
formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalar import dec
from ..plans.registry import register
from ..session import defer_unpersist, table

SESSION_GAP_MIN = 30


@register(
    "tumbling_window_events",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (T10): `F.window` — the same expression the
    streaming query uses, so batch backfill and live stream share plans.

    Scale: one shuffle on (window, type); partial aggregation map-side.
    """
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_events",
    """
    WITH slid AS (
      SELECT date_trunc('hour', ts) AS window_start, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, value FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM slid
    GROUP BY window_start
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 2-hour duration / 1-hour slide (T10): each event
    lands in two windows (`F.window(ts, '2 hours', '1 hour')`). The oracle
    expands the two memberships with a UNION ALL — which is also exactly
    how Spark's Expand operator implements it physically."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "session_window_events",
    f"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
      FROM gaps
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a {SESSION_GAP_MIN}-minute gap (T10): Spark's
    native `F.session_window` in batch mode; the oracle is the classic
    gaps-and-islands rewrite. Semantically identical: a session extends
    while consecutive events are within the gap.

    Scale: session_window shuffles once on user_id then merges sessions
    in-partition — same cost shape as the islands rewrite, but with native
    streaming-state support when run on a stream."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@register(
    "sessionize_gaps_islands",
    f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM gaps
    """,
)
def sessionize_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level session assignment via lag+cumsum (the composition
    pattern underlying both T3 age batching and session_window) — returns
    every event tagged with its per-user session ordinal."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = W.partitionBy("user_id").orderBy(*order)
    w_cum = W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.lit(SESSION_GAP_MIN * 60)
    gaps = table(spark, sf_dir, "events").withColumn(
        "new_session",
        F.when(F.lag("ts").over(w_lag).isNull(), 1)
        .when(
            (F.col("ts").cast("double") - F.lag("ts").over(w_lag).cast("double")) > gap, 1
        )
        .otherwise(0),
    )
    return gaps.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(w_cum).cast("bigint").alias("session_id"),
    )


RANGE_SECS = 30 * 24 * 3600  # 30-day trailing range frame


@register(
    "window_range_frame_spend",
    f"""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_part('epoch', date_trunc('second', o_orderdate))
             RANGE BETWEEN {RANGE_SECS} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (§2.5 engine surface — the frame kind
    `rowsBetween` cannot express): per customer, the trailing-30-day spend
    at each order, frame bounded by *value distance* on the order
    timestamp, so same-timestamp peers aggregate together regardless of
    row order (which also makes the result deterministic without a
    tiebreaker — RANGE frames include all peers).

    Scale: one shuffle on o_custkey; per-partition sort on the frame key.
    Range frames evaluate with a sliding two-pointer over the sorted
    partition — O(n) per partition, same cost class as a rows frame.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    epoch = F.unix_timestamp(F.date_trunc("second", F.col("o_orderdate")))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-RANGE_SECS, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice", 15, 4)).over(w).cast("double").alias("trailing_30d_spend"),
    )


@register(
    "resample_fill_gaps",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT t.h AS hour_start FROM bounds,
             LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h) t
    ),
    actual AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT strftime(g.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(a.n, 0) AS n_purchases
    FROM grid g LEFT JOIN actual a ON a.hour_start = g.hour_start
    """,
)
def resample_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling with gap fill: a dense hourly grid (sequence explode
    between the observed bounds) LEFT JOINed against the actual hourly
    counts, zero-filling silent hours — the time-series normalization
    every downstream rate/alerting computation assumes.

    Scale: the grid is generated (hours between bounds — tiny, broadcast
    side); actual counts aggregate with one shuffle. Never materialize
    the grid per-key unless keys×hours stays bounded; per-key grids come
    from a crossJoin against the (small) key dimension."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    actual = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count("*").alias("n"))
    )
    return (
        grid.join(actual, "hour_start", "left")
        .select(
            F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n_purchases"),
        )
    )


@register(
    "first_last_orders",
    """
    SELECT o_custkey,
           arg_min(o_orderkey, date_part('epoch', date_trunc('second', o_orderdate)) * 10000000 + o_orderkey)
             AS first_order,
           arg_max(o_orderkey, date_part('epoch', date_trunc('second', o_orderdate)) * 10000000 + o_orderkey)
             AS last_order,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-per-group via min_by/max_by (argmin/argmax aggregates):
    each customer's earliest and latest order in ONE aggregation pass —
    no sort, no window, half the cost of the row_number approach when
    only the extremes are needed. The ordering key is a composite
    (epoch·10^7 + orderkey) so date ties resolve deterministically in
    both engines (bare min_by/arg_min tie behavior is undefined).

    Scale: single shuffle on the group key with map-side partials."""
    o = table(spark, sf_dir, "orders")
    composite = (
        F.unix_timestamp(F.date_trunc("second", "o_orderdate")) * 10000000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", composite).alias("first_order"),
        F.max_by("o_orderkey", composite).alias("last_order"),
        F.count("*").alias("n_orders"),
    )


PCTS = (0.5, 0.9, 0.99)  # exact rank-based percentiles (no interpolation)


@register(
    "exact_percentiles_by_priority",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(n) AS n_orders,
           {", ".join(
               f"MAX(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT) "
               f"THEN o_totalprice END) AS p{int(p * 100)}"
               for p in PCTS
           )}
    FROM ranked GROUP BY o_orderpriority
    """,
)
def exact_percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles by the rank method (§2.5 analytics
    surface): the value at rank ceil(p·n) under a TOTAL ordering — the
    deterministic alternative to interpolating `percentile_cont` (whose
    interpolation arithmetic differs subtly across engines) and to
    `approx_percentile` sketches (engine-specific). p50/p90/p99 of order
    value per priority class, the ops-dashboard staple.

    Scale: one shuffle on the group key; the two windows share the same
    partitioning so Catalyst evaluates them in a single Window node;
    the final groupBy is map-side-combined conditional MAXes. ceil(p·n)
    over exact doubles (p has a short binary expansion? no — but both
    engines compute the same IEEE product and ceil, and n < 2^53, so the
    rank index is identical everywhere)."""
    o = table(spark, sf_dir, "orders")
    w_rank = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_all = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    aggs = [F.max("n").alias("n_orders")]
    for p in PCTS:
        idx = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        aggs.append(
            F.max(F.when(F.col("rn") == idx, F.col("o_totalprice"))).alias(f"p{int(p * 100)}")
        )
    return ranked.groupBy("o_orderpriority").agg(*aggs)


@register(
    "scd2_user_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    changes AS (
      SELECT user_id, event_type, ts
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    intervals AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) AS valid_to
      FROM changes
    )
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
             AS valid_to,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM intervals
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event stream into
    validity intervals [valid_from, valid_to) per state (event_type),
    open-ended on the current state — the canonical warehouse
    dimension-history shape the reference's Redshift target consumes via
    MERGE loads (our merge_upsert is the type-1 sibling; SURVEY §1.3
    batch-status analog: batchOperations.js:279,358 status transitions).

    Change detection = lag(); interval close = lead() over the change
    rows only. Ties broken by event_id for a total order, so both engines
    build identical histories.

    Scale: two windows over the same (user_id, ts) partitioning — one
    shuffle, states per user bounded by their event count; the sentinel
    9999-12-31 keeps the open interval filterable without NULL logic."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ordered = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = W.partitionBy("user_id").orderBy(F.col("ts").asc())
    intervals = changes.select(
        "user_id", "event_type", F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    return intervals.select(
        "user_id", "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    )


FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = '{FUNNEL_STAGES[1]}' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = '{FUNNEL_STAGES[2]}' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             t_view IS NOT NULL AS s1,
             t_view IS NOT NULL AND t_click > t_view AS s2,
             t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click AS s3
      FROM firsts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
           CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
           CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
    FROM staged
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view → click → purchase): a user
    reaches stage k when their earliest stage-k event strictly follows
    their earliest reached stage-(k-1) event — the standard
    product-analytics sequence operator, expressed as one conditional-MIN
    aggregate per stage instead of per-row sequence scans.

    NULL semantics carry the funnel logic: a missing earlier stage makes
    the comparison NULL → false in both engines.

    Scale: ONE groupBy(user_id) with three conditional MINs (map-side
    combined), then a single global fold — no window, no self-join, no
    per-event state; skew-safe because per-user output is one row."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in FUNNEL_STAGES
        ]
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    staged = firsts.select(
        s1.alias("s1"),
        F.coalesce(s2, F.lit(False)).alias("s2"),
        F.coalesce(s3, F.lit(False)).alias("s3"),
    )
    return staged.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("s1"), 1).otherwise(0)).cast("bigint").alias("reached_view"),
        F.sum(F.when(F.col("s2"), 1).otherwise(0)).cast("bigint").alias("reached_click"),
        F.sum(F.when(F.col("s3"), 1).otherwise(0)).cast("bigint").alias("reached_purchase"),
    )


ZSCORE_Q = 10_000  # value quantization for exact cross-engine moments
ZSCORE_THRESHOLD = 3.0


@register(
    "value_outliers_zscore",
    f"""
    WITH qv AS (
      SELECT event_id, event_type,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    moments AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(v * v) AS BIGINT) AS s2
      FROM qv GROUP BY event_type
    ),
    scored AS (
      SELECT q.event_id, q.event_type, q.v,
             (CAST(q.v AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n) /
               sqrt(CAST(m.s2 AS DOUBLE) / m.n
                    - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n))
               AS z
      FROM qv q JOIN moments m ON m.event_type = q.event_type
    )
    SELECT event_id, event_type, v AS value_q, z
    FROM scored WHERE z > {ZSCORE_THRESHOLD} OR z < -{ZSCORE_THRESHOLD}
    """,
)
def value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (the data-quality gate a load
    pipeline runs before committing a batch): values quantized to int64
    so COUNT/SUM/SUM-of-squares are exact in any engine and any
    summation order; mean, variance, and z are then a fixed chain of
    IEEE divides/sqrt — bit-identical cross-engine, so even boundary
    outliers match.

    Scale: one map-side-combined groupBy for the moments (|event_type|
    rows), joined back hint-free (bounded dimension — AQE broadcasts at
    runtime), then a map-only score+filter. No window, no sort."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_id", "event_type",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    m = qv.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (F.col("v").cast("double") - mean) / F.sqrt(var)
    return (
        qv.join(m, "event_type")
        .select("event_id", "event_type", F.col("v").alias("value_q"), z.alias("z"))
        .filter((F.col("z") > ZSCORE_THRESHOLD) | (F.col("z") < -ZSCORE_THRESHOLD))
    )


HIST_BINS = 20


@register(
    "value_histogram",
    f"""
    WITH qv AS (
      SELECT event_type, CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v FROM events
    ),
    rng AS (
      SELECT event_type, MIN(v) AS lo, MAX(v) AS hi,
             CAST(ceil(CAST(MAX(v) - MIN(v) + 1 AS DOUBLE) / {HIST_BINS}) AS BIGINT) AS width
      FROM qv GROUP BY event_type
    )
    SELECT q.event_type,
           CAST((q.v - r.lo) // r.width AS INT) AS bin,
           CAST(r.lo + ((q.v - r.lo) // r.width) * r.width AS BIGINT) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM qv q JOIN rng r ON r.event_type = q.event_type
    GROUP BY q.event_type, (q.v - r.lo) // r.width, r.lo, r.width
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per group — the distributed shape of quantile
    estimation at scale (sort-free, mergeable, one pass + one tiny range
    aggregate): values quantize to int64, bin width is an integer ceil of
    the range over {HIST_BINS}, bin assignment is integer floor-division
    — every boundary lands identically in both engines.

    Scale: a min/max groupBy on the (bounded) group key joined back
    hint-free, then one map-side-combined count per (group, bin). At
    most |groups|×{HIST_BINS} output rows regardless of input size."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type", F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v")
    )
    rng = qv.groupBy("event_type").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.ceil((F.max("v") - F.min("v") + 1).cast("double") / HIST_BINS)
        .cast("bigint")
        .alias("width"),
    )
    binned = qv.join(rng, "event_type").select(
        "event_type",
        # `div` = bigint integer division: exact at any magnitude, unlike
        # double `/` + cast which loses integer-exactness past 2^53.
        F.expr("(v - lo) div width").alias("binq"),
        "lo",
        "width",
    )
    return (
        binned.groupBy("event_type", "binq", "lo", "width")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "event_type",
            F.col("binq").cast("int").alias("bin"),
            (F.col("lo") + F.col("binq") * F.col("width")).cast("bigint").alias("bin_lo"),
            "n",
        )
    )


@register(
    "weekly_retention",
    """
    WITH weekly AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT strftime(a.week, '%Y-%m-%d') AS week,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS retained_next_week,
           CAST(COUNT(DISTINCT b.user_id) AS DOUBLE) / COUNT(DISTINCT a.user_id)
             AS retention_rate
    FROM weekly a
    LEFT JOIN weekly b ON b.user_id = a.user_id
                      AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    """,
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: of the users active in week w, the share
    also active in week w+1 — the canonical product/engagement metric
    over the events stream, built from a distinct (user, week) activity
    set self-joined one week forward.

    Scale: the activity set is one dropDuplicates shuffle (rows ∝ active
    user-weeks, far fewer than events); the self-join keys on user_id —
    a co-partitioned equi-join — and the final aggregate is per-week."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    a, b = weekly.alias("a"), weekly.alias("b")
    joined = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.week") == F.col("a.week") + F.expr("INTERVAL 7 DAY")),
        "left",
    )
    return joined.groupBy(F.col("a.week").alias("wk")).agg(
        F.countDistinct("a.user_id").cast("bigint").alias("active_users"),
        F.countDistinct("b.user_id").cast("bigint").alias("retained_next_week"),
        (
            F.countDistinct("b.user_id").cast("double") / F.countDistinct("a.user_id")
        ).alias("retention_rate"),
    ).select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        "active_users",
        "retained_next_week",
        "retention_rate",
    )


CORR_Q = 100  # cents-style quantization for exact correlation moments


@register(
    "correlation_by_group",
    f"""
    WITH qv AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * {CORR_Q}) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * {CORR_Q}) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM qv GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
              sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr_qty_price
    FROM m
    """,
)
def correlation_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation (quantity vs extended price) from
    integer-exact co-moments: both columns quantize to int64 so the five
    sums are exact at any parallelism; r is then one fixed chain of IEEE
    multiply/subtract/sqrt/divide — bit-identical cross-engine (the
    engine-native corr() aggregates a float stream and can never be
    hash-verified; this form can, same discipline as
    value_outliers_zscore).

    Scale: one map-side-combined groupBy carrying five sums — the
    single-pass parallel correlation estimator; |groups| output rows.

    Caution for adopters: n·Σxy needs headroom — with {CORR_Q}-scaled
    cents values this stays well under 2^63 here, but a 100 TB fact
    table needs the same bound check (shift to per-partition means or
    DECIMAL(38) sums when n·max(x)·max(y) approaches int64)."""
    li = table(spark, sf_dir, "lineitem")
    qv = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") * CORR_Q).cast("bigint").alias("x"),
        F.floor(F.col("l_extendedprice") * CORR_Q).cast("bigint").alias("y"),
    )
    m = qv.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    corr = (n * F.col("sxy") - sx * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - sx * F.col("sx"))
        * F.sqrt(n * F.col("syy") - sy * F.col("sy"))
    )
    return m.select(
        "l_returnflag", F.col("n").cast("bigint").alias("n"), corr.alias("corr_qty_price")
    )


TREND_T0 = "2024-01-01 00:00:00"  # fixture time origin (bounds x*x in int64)


@register(
    "linear_trend_by_group",
    f"""
    WITH qv AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(TIMESTAMP '{TREND_T0}')) AS BIGINT) AS x,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM qv GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope_q_per_sec,
           (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n AS intercept_q
    FROM m
    """,
)
def linear_trend_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (quantized value vs seconds since the fixture
    origin): slope and intercept from the same single-pass integer
    co-moments as correlation_by_group — drift detection per event type
    (is this metric degrading over the month?) without any sort or
    window. The time origin offset keeps x² within int64 for the whole
    fixture family; both slope and intercept are fixed IEEE chains over
    exact integer sums, so boundary values match bit-for-bit.

    Scale: identical shape to the other moments queries — one map-side-
    combined groupBy, |groups| rows out."""
    ev = table(spark, sf_dir, "events")
    x = F.unix_timestamp("ts") - F.unix_timestamp(F.lit(TREND_T0).cast("timestamp"))
    qv = ev.select(
        "event_type",
        x.cast("bigint").alias("x"),
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("y"),
    )
    m = qv.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    n, sx = F.col("n").cast("double"), F.col("sx").cast("double")
    slope = (n * F.col("sxy") - sx * F.col("sy")) / (n * F.col("sxx") - sx * F.col("sx"))
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope_q_per_sec"),
        intercept.alias("intercept_q"),
    )


CHI2_SCALE = 1_000_000  # per-cell contribution quantization (micro-units)


@register(
    "chi_square_independence",
    f"""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM events GROUP BY event_type, dayofweek(ts)
    ),
    margins AS (
      SELECT c.event_type, c.dow, c.observed,
             rt.row_total, ct.col_total, t.grand_total
      FROM cells c
      JOIN (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS row_total
            FROM cells GROUP BY event_type) rt ON rt.event_type = c.event_type
      JOIN (SELECT dow, CAST(SUM(observed) AS BIGINT) AS col_total
            FROM cells GROUP BY dow) ct ON ct.dow = c.dow
      CROSS JOIN (SELECT CAST(SUM(observed) AS BIGINT) AS grand_total FROM cells) t
    ),
    contrib AS (
      SELECT event_type, dow, observed,
             CAST(floor(
               ((observed - (CAST(row_total AS DOUBLE) * col_total) / grand_total)
                * (observed - (CAST(row_total AS DOUBLE) * col_total) / grand_total)
                / ((CAST(row_total AS DOUBLE) * col_total) / grand_total))
               * {CHI2_SCALE}) AS BIGINT) AS chi2_q
      FROM margins
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(chi2_q) AS BIGINT) AS chi2_stat_q
    FROM contrib
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (event_type × day-of-week): the
    categorical-association screen a data-quality suite runs on every
    load ("did the mix shift?"). Observed counts and margins are exact
    integers; each cell's (O−E)²/E contribution is a fixed IEEE chain
    quantized to int64 micro-units BEFORE the final sum, so the statistic
    is order-independent and bit-identical cross-engine (a raw double
    SUM over cells would be reduction-order-nondeterministic — the same
    trick as the surprisal micro-nats).

    Scale: contingency cells are a map-side-combined groupBy; margins
    are two tiny re-aggregations of the CELLS (never the raw data) plus
    a 1-row grand total — nothing touches the fact table twice."""
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.select("event_type", F.dayofweek("ts").cast("int").alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    row_t = cells.groupBy("event_type").agg(
        F.sum("observed").cast("bigint").alias("row_total")
    )
    col_t = cells.groupBy("dow").agg(F.sum("observed").cast("bigint").alias("col_total"))
    grand = cells.agg(F.sum("observed").cast("bigint").alias("grand_total"))
    m = cells.join(row_t, "event_type").join(col_t, "dow").crossJoin(grand)
    expected = (F.col("row_total").cast("double") * F.col("col_total")) / F.col(
        "grand_total"
    )
    diff = F.col("observed") - expected
    chi2_q = F.floor((diff * diff / expected) * CHI2_SCALE).cast("bigint")
    return m.select(chi2_q.alias("chi2_q")).agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("chi2_q").cast("bigint").alias("chi2_stat_q"),
    )


BENFORD_SCALE = 1_000_000


@register(
    "benford_digit_audit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM counts)
    SELECT c.digit, c.observed,
           CAST(floor((CAST(c.observed AS DOUBLE) / t.n) * {BENFORD_SCALE}) AS BIGINT)
             AS observed_freq_q,
           CAST(floor((ln(1.0 + 1.0 / c.digit) / ln(10.0)) * {BENFORD_SCALE}) AS BIGINT)
             AS benford_freq_q
    FROM counts c, tot t
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    fraud / synthetic-data screen: observed leading-digit frequencies
    next to the log10(1+1/d) expectation. Frequencies and expectations
    are floor-quantized to parts-per-million (ln is not correctly
    rounded cross-engine — same micro-unit discipline as the surprisal
    scores); digit extraction goes through integer-string truncation so
    float formatting never leaks in.

    Scale: one map-side-combined digit groupBy (9 output rows) + a 1-row
    total — nothing else."""
    o = table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").cast("bigint").alias("observed"))
    tot = counts.agg(F.sum("observed").cast("bigint").alias("n"))
    obs_q = F.floor(
        (F.col("observed").cast("double") / F.col("n")) * BENFORD_SCALE
    ).cast("bigint")
    ben_q = F.floor(
        (F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)))
        * BENFORD_SCALE
    ).cast("bigint")
    return counts.crossJoin(tot).select(
        "digit", "observed", obs_q.alias("observed_freq_q"), ben_q.alias("benford_freq_q")
    )


PSI_BINS = 10
PSI_SPLIT = "2024-01-16 00:00:00"  # period A = before, period B = from
PSI_SCALE = 1_000_000_000  # nano-unit quantization of per-bin terms


@register(
    "distribution_drift_psi",
    f"""
    WITH qv AS (
      SELECT CAST(ts >= TIMESTAMP '{PSI_SPLIT}' AS INT) AS period,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    rng AS (
      SELECT MIN(v) AS lo,
             CAST(ceil(CAST(MAX(v) - MIN(v) + 1 AS DOUBLE) / {PSI_BINS}) AS BIGINT) AS width
      FROM qv
    ),
    binned AS (
      SELECT q.period, (q.v - r.lo) // r.width AS bin FROM qv q, rng r
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM counts
    ),
    terms AS (
      -- Laplace-smoothed shares (never zero), PSI term per bin quantized
      -- BEFORE the sum so the statistic is reduction-order-independent.
      SELECT CAST(floor(
               ((CAST(c.a + 1 AS DOUBLE) / (t.na + t.k)) - (CAST(c.b + 1 AS DOUBLE) / (t.nb + t.k)))
               * (ln(CAST(c.a + 1 AS DOUBLE) / (t.na + t.k)) - ln(CAST(c.b + 1 AS DOUBLE) / (t.nb + t.k)))
               * {PSI_SCALE}) AS BIGINT) AS term_q
      FROM counts c, tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(term_q) AS BIGINT) AS psi_q
    FROM terms
    """,
)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the month's first and second
    half — THE production drift alarm for feature/score distributions
    (PSI > 0.2 ⇒ investigate): shared fixed-width bins from the global
    range, Laplace-smoothed shares (zero-count bins stay defined), and
    per-bin (p−q)·ln(p/q) terms floor-quantized to int64 nano-units
    BEFORE the final sum — order-independent and bit-identical
    cross-engine despite the uncorrectly-rounded ln (same micro-unit
    discipline as surprisal and chi-square).

    Scale: one global min/max aggregate, one map-side-combined
    (period × bin) count, ≤{PSI_BINS} term rows — nothing rescans the
    facts."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        (F.col("ts") >= F.lit(PSI_SPLIT).cast("timestamp")).cast("int").alias("period"),
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    rng = qv.agg(
        F.min("v").alias("lo"),
        F.ceil((F.max("v") - F.min("v") + 1).cast("double") / PSI_BINS)
        .cast("bigint")
        .alias("width"),
    )
    binned = qv.crossJoin(rng).select(
        # integer-exact bin assignment (see value_histogram)
        "period", F.expr("(v - lo) div width").alias("bin")
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("bigint").alias("b"),
    )
    tot = counts.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
        F.count("*").cast("bigint").alias("k"),
    )
    pa = F.col("a").cast("double") + 1
    pb = F.col("b").cast("double") + 1
    sa = pa / (F.col("na") + F.col("k"))
    sb = pb / (F.col("nb") + F.col("k"))
    term_q = F.floor(((sa - sb) * (F.log(sa) - F.log(sb))) * PSI_SCALE).cast("bigint")
    terms = counts.crossJoin(tot).select(term_q.alias("term_q"))
    return terms.agg(
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum("term_q").cast("bigint").alias("psi_q"),
    )


APPROX_PCT_ACC = 100  # percentile_approx accuracy => rank error <= n/100


@register(
    "approx_quantile_check",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
               THEN o_totalprice END) AS exact_p50,
           TRUE AS approx_rank_ok
    FROM ranked GROUP BY o_orderpriority
    """,
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`percentile_approx` — the at-scale quantile (KLL-family sketch,
    bounded memory, one pass) — made hash-verifiable the same way as
    approx_distinct: assert the sketch's RANK-ERROR contract instead of
    its engine-specific output. Output carries the exact rank-method p50
    (hash-verified value) plus a boolean stating the approx answer's
    rank sits within n/{APPROX_PCT_ACC} + 1 of the true median rank —
    the documented guarantee at accuracy={APPROX_PCT_ACC}. The DuckDB
    oracle emits the same groups with literal TRUE, so a sketch
    regression beyond its bound flips the boolean and fails the hash.

    Scale note: the exact rank window exists only to audit the sketch at
    test scale; the production form is percentile_approx alone (map-side
    mergeable sketch, no sort, no window)."""
    o = table(spark, sf_dir, "orders")
    approx = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, APPROX_PCT_ACC).alias("va")
    )
    w_rank = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_all = W.partitionBy("o_orderpriority")
    ranked = (
        o.join(F.broadcast(approx), "o_orderpriority")
        .select(
            "o_orderpriority",
            "o_totalprice",
            "va",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_all).alias("n"),
        )
    )
    # rank of the approx answer = #rows <= va (upper rank); the sketch
    # guarantee is |rank - ceil(0.5 n)| <= n/accuracy (+1 for ties/edge).
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"),
                    F.col("o_totalprice"),
                )
            ).alias("exact_p50"),
            F.sum(F.when(F.col("o_totalprice") <= F.col("va"), 1).otherwise(0)).alias(
                "rank_va"
            ),
            F.max("n").alias("_n"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "exact_p50",
            (
                F.abs(F.col("rank_va") - F.ceil(0.5 * F.col("_n")))
                <= F.col("_n") / APPROX_PCT_ACC + 1
            ).alias("approx_rank_ok"),
        )
    )


MAD_K = 3  # robust outlier threshold: |v - median| > MAD_K * MAD


@register(
    "mad_outliers",
    f"""
    WITH qv AS (
      SELECT event_type, event_id,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS med
      FROM (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v ASC, event_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM qv
      ) GROUP BY event_type
    ),
    dev AS (
      SELECT q.event_type, q.event_id, q.v, m.med, abs(q.v - m.med) AS d
      FROM qv q JOIN med m ON m.event_type = q.event_type
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN d END) AS mad
      FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY d ASC, event_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      ) GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(d.med) AS median_q,
           MAX(a.mad) AS mad_q,
           CAST(SUM(CASE WHEN d.d > {MAD_K} * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: flag values
    with |v - median| > {MAD_K}*MAD per event_type — the heavy-tail-safe
    alternative to value_outliers_zscore (mean/stddev are themselves
    dragged by the outliers they hunt; the median/MAD breakdown point is
    50%). Values quantize to int64 so every median, deviation, and
    threshold comparison is integer-exact cross-engine; medians use the
    rank method under a total order (no interpolation).

    Scale: two rank-window passes partitioned on the SAME key (group
    shuffles reuse partitioning), each group's median join-back is a
    broadcast of |groups| rows, and the final aggregate is map-side
    combined. No all-row sort — ordering is per-group within the window.
    """
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )

    def rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w_rank = W.partitionBy("event_type").orderBy(
            F.col(col).asc(), F.col("event_id").asc()
        )
        w_all = W.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                col,
                F.row_number().over(w_rank).alias("rn"),
                F.count("*").over(w_all).alias("n"),
            )
            .groupBy("event_type")
            .agg(
                F.max(
                    F.when(
                        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"),
                        F.col(col),
                    )
                ).alias(out)
            )
        )

    med = rank_median(qv, "v", "med")
    dev = qv.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "v", "med", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = rank_median(dev, "d", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("med").alias("median_q"),
            F.max("mad").alias("mad_q"),
            F.sum(F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---- Kolmogorov-Smirnov two-sample drift --------------------------------
KS_GROUP_A = "click"
KS_GROUP_B = "view"
KS_SCALE = 1_000_000_000  # nano-unit quantization of the per-point gap


@register(
    "ks_two_sample",
    f"""
    WITH qv AS (
      SELECT event_type, CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events WHERE event_type IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
    ),
    per_v AS (
      SELECT v,
             CAST(SUM(CASE WHEN event_type = '{KS_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = '{KS_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM qv GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM per_v
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY v ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM per_v
    )
    SELECT t.na, t.nb,
           MAX(CAST(floor(abs(CAST(c.cum_a AS DOUBLE) / t.na
                              - CAST(c.cum_b AS DOUBLE) / t.nb) * {KS_SCALE})
                    AS BIGINT)) AS ks_q
    FROM cum c, tot t
    GROUP BY t.na, t.nb
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov two-sample statistic between the
    '{KS_GROUP_A}' and '{KS_GROUP_B}' value distributions — the
    nonparametric drift test next to PSI (binned, assumes a binning)
    and the z-score/MAD outlier family (pointwise): D = max |ECDF_a -
    ECDF_b| over the observed support, sensitive to ANY distributional
    difference, not just mean/scale shifts.

    Exactness: values quantize to int ({ZSCORE_Q} units) so the
    grouped counts are exact; ECDF gaps are two correctly-rounded
    divisions and a subtraction on exact ints, floored to nano-units
    per point BEFORE the max — so D is reduction-order-independent and
    hash-gated, not approximately compared.

    Scale: the per-value aggregate is one map-side-combined shuffle;
    the cumulative window orders the DISTINCT quantized values (support
    size, not row count). A truly global ECDF at 100 TB would instead
    range-partition the support and carry per-partition offsets (the
    standard distributed prefix-sum shape) or reuse PSI's binned form;
    the exact small-support window here is the audit-grade variant."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(KS_GROUP_A, KS_GROUP_B)
    )
    qv = ev.select(
        "event_type", F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v")
    )
    per_v = qv.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == KS_GROUP_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == KS_GROUP_B, 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = per_v.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    wcum = W.orderBy(F.col("v").asc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_v.select(
        F.sum("ca").over(wcum).alias("cum_a"), F.sum("cb").over(wcum).alias("cum_b")
    )
    gap_q = F.floor(
        F.abs(
            F.col("cum_a").cast("double") / F.col("na")
            - F.col("cum_b").cast("double") / F.col("nb")
        )
        * KS_SCALE
    ).cast("bigint")
    return (
        cum.crossJoin(F.broadcast(tot))
        .select("na", "nb", gap_q.alias("gap_q"))
        .groupBy("na", "nb")
        .agg(F.max("gap_q").alias("ks_q"))
    )


# ---- Equi-depth histogram ----------------------------------------------
EQD_BINS = 10


@register(
    "value_histogram_equidepth",
    f"""
    WITH qv AS (
      SELECT event_type, event_id, CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    binned AS (
      SELECT event_type, v,
             ntile({EQD_BINS}) OVER (PARTITION BY event_type
                                     ORDER BY v ASC, event_id ASC) AS bin
      FROM qv
    )
    SELECT event_type, CAST(bin AS INT) AS bin,
           MIN(v) AS v_lo, MAX(v) AS v_hi, CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY event_type, bin
    """,
)
def value_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram per group — the optimizer-statistics twin of
    value_histogram's equi-width form: {EQD_BINS} buckets of ~equal ROW
    COUNT whose [v_lo, v_hi] boundaries are the observed deciles, which
    is what selectivity estimators and range-partitioners actually want
    (equi-width buckets collapse under skew; equi-depth boundaries
    adapt). ntile ties break on event_id so both engines cut identical
    buckets.

    Scale: the per-group window sorts within event_type partitions —
    bounded group count, each sortable in parallel; a truly huge single
    group would use sampled range boundaries (repartitionByRange's own
    technique) at the cost of approximate depths — the exact form here
    is the audit-grade one, same note as the z-order ntile."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type", "event_id", F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v")
    )
    wn = W.partitionBy("event_type").orderBy(F.col("v").asc(), F.col("event_id").asc())
    binned = qv.select("event_type", "v", F.ntile(EQD_BINS).over(wn).alias("bin"))
    return binned.groupBy("event_type", "bin").agg(
        F.min("v").alias("v_lo"), F.max("v").alias("v_hi"),
        F.count("*").cast("bigint").alias("n"),
    ).select("event_type", F.col("bin").cast("int").alias("bin"), "v_lo", "v_hi", "n")


# ---- Rolling 7-day active users -----------------------------------------
WAU_WINDOW = 7  # days


@register(
    "rolling_active_users",
    f"""
    WITH day_user AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    expanded AS (
      SELECT DISTINCT d + CAST(u.k AS INT) AS report_day, user_id
      FROM day_user,
           LATERAL (SELECT unnest(generate_series(0, {WAU_WINDOW - 1})) AS k) u
    ),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
    )
    SELECT strftime(e.report_day, '%Y-%m-%d') AS report_day,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM expanded e, bounds b
    WHERE e.report_day >= b.lo AND e.report_day <= b.hi
    GROUP BY e.report_day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {WAU_WINDOW}-day active users per day (the WAU family):
    for each report day, how many distinct users had at least one event
    in the preceding {WAU_WINDOW}-day window. SQL's RANGE frames can't
    do windowed COUNT(DISTINCT); the scalable rewrite is the EXPANSION
    trick — each (day, user) activity row contributes the user to the
    {WAU_WINDOW} report days it keeps them active for, then one
    distinct + count per day. Bounded {WAU_WINDOW}x fan-out, no
    per-day sort, no window state — the same Expand shape Spark itself
    uses for sliding event-time windows (stream_sliding_counts).

    Report days clamp to the observed [min, max] event-date range so
    no partial-window tail days are emitted."""
    ev = table(spark, sf_dir, "events")
    day_user = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    expanded = (
        day_user.select(
            F.explode(F.sequence(F.lit(0), F.lit(WAU_WINDOW - 1))).alias("k"),
            "d",
            "user_id",
        )
        .select(F.date_add(F.col("d"), F.col("k")).alias("report_day"), "user_id")
        .distinct()
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter((F.col("report_day") >= F.col("lo")) & (F.col("report_day") <= F.col("hi")))
        .groupBy("report_day")
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("report_day"),
            "active_users",
        )
    )


# ---- Equi-depth histogram, banded-rank form -----------------------------
EQD_RANK_BANDS = 32


def _eqd_registry():
    from ..plans.registry import QUERIES

    return QUERIES


@register(
    "value_histogram_equidepth_scalable",
    lambda: _eqd_registry()["value_histogram_equidepth"].oracle,
)
def value_histogram_equidepth_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of value_histogram_equidepth (same oracle — the
    hash gate proves the rewrite): the exact form's per-group ntile
    sorts each event_type in ONE task, which the docstring flags as the
    huge-single-group risk. Here each group's rank is banded (the
    _banded_rank idea applied per group): per-group quantile boundaries
    from one grouped percentile_approx, band assignment as a pure
    expression (groups are low-cardinality — event types — so the
    boundary literals inline), exact within-(group, band) window ranks
    plus per-(group, band) prefix-sum offsets, and the SQL-standard
    ntile recovered closed-form from the exact rank with per-group
    (q, r) literals. No window sees more than one band of one group.

    Bounded driver state: G x (B-1) boundary doubles + G x B band
    counts (G = event-type cardinality, B = {EQD_RANK_BANDS})."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    pcts = [i / EQD_RANK_BANDS for i in range(1, EQD_RANK_BANDS)]
    gb = {
        r["event_type"]: sorted(set(r["bs"] or []))
        for r in qv.groupBy("event_type")
        .agg(F.percentile_approx("v", pcts, 10000).alias("bs"))
        .collect()
    }
    band = F.lit(0)
    for g, bs in sorted(gb.items()):
        chain = F.lit(0)
        for b in bs:
            chain = chain + F.when(F.col("v") >= F.lit(int(b)), 1).otherwise(0)
        band = F.when(F.col("event_type") == g, chain).otherwise(band)
    banded = qv.withColumn("_band", band.cast("int"))
    cells = banded.groupBy("event_type", "_band").agg(F.count("*").alias("c")).collect()
    counts: dict[str, dict[int, int]] = {}
    for r in cells:
        counts.setdefault(r["event_type"], {})[r["_band"]] = r["c"]
    off_entries, n_g = [], {}
    for g in sorted(counts):
        acc = 0
        for b in sorted(counts[g]):
            off_entries += [F.lit(f"{g}:{b}"), F.lit(acc)]
            acc += counts[g][b]
        n_g[g] = acc
    offmap = F.create_map(*off_entries)
    wr = W.partitionBy("event_type", "_band").orderBy(
        F.col("v").asc(), F.col("event_id").asc()
    )
    ranked = banded.withColumn(
        "rank",
        (
            offmap[F.format_string("%s:%d", F.col("event_type"), F.col("_band"))]
            + F.row_number().over(wr)
        ).cast("bigint"),
    )
    bucket = F.lit(0)
    for g in sorted(n_g):
        q, r = divmod(n_g[g], EQD_BINS)
        qd = max(q, 1)  # q=0 (n < bins): every row satisfies the when branch
        expr = F.when(
            F.col("rank") <= r * (q + 1),
            F.expr(f"(rank - 1) div {q + 1} + 1"),
        ).otherwise(F.expr(f"{r} + (rank - {r * (q + 1)} - 1) div {qd} + 1"))
        bucket = F.when(F.col("event_type") == g, expr).otherwise(bucket)
    return (
        ranked.withColumn("bin", bucket.cast("int"))
        .groupBy("event_type", "bin")
        .agg(
            F.min("v").alias("v_lo"),
            F.max("v").alias("v_hi"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select("event_type", "bin", "v_lo", "v_hi", "n")
    )


# ---- KS two-sample, banded-ECDF form ------------------------------------
KS_RANK_BANDS = 32


@register(
    "ks_two_sample_scalable",
    lambda: _eqd_registry()["ks_two_sample"].oracle,
)
def ks_two_sample_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ks_two_sample (same oracle — the hash gate
    proves the rewrite): the exact form's cumulative-ECDF window orders
    the whole distinct-value support in ONE task, which its docstring
    flags ("a truly global ECDF at 100 TB would range-partition the
    support and carry per-partition offsets — the standard distributed
    prefix-sum shape"). This is that shape, via the banded-rank
    machinery generalized to cumulative SUMS: quantile bands over the
    support, per-band count totals collected ({KS_RANK_BANDS}-bounded
    driver state), and the global running counts recovered as
    band-offset + within-band running sum under a PARTITIONED window.
    Band order equals value order (bands are value ranges), so the
    concatenated cumulative sums are exactly the global ECDF counts;
    the per-point quantized gap and its max are the exact query's own
    expressions."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(KS_GROUP_A, KS_GROUP_B)
    )
    qv = ev.select(
        "event_type", F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v")
    )
    per_v = qv.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == KS_GROUP_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == KS_GROUP_B, 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    pcts = [i / KS_RANK_BANDS for i in range(1, KS_RANK_BANDS)]
    bounds = sorted(
        set(
            per_v.agg(F.percentile_approx("v", pcts, 10000).alias("bs")).collect()[0][
                "bs"
            ]
            or []
        )
    )
    band = F.lit(0)
    for b in bounds:
        band = band + F.when(F.col("v") >= F.lit(int(b)), 1).otherwise(0)
    banded = per_v.withColumn("_band", band.cast("int"))
    cells = (
        banded.groupBy("_band")
        .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
        .collect()
    )
    offs_a, offs_b, acc_a, acc_b = {}, {}, 0, 0
    for r in sorted(cells, key=lambda r: r["_band"]):
        offs_a[r["_band"]], offs_b[r["_band"]] = acc_a, acc_b
        acc_a += r["sa"]
        acc_b += r["sb"]
    na, nb = acc_a, acc_b
    map_a = F.create_map(*[x for k in sorted(offs_a) for x in (F.lit(k), F.lit(offs_a[k]))])
    map_b = F.create_map(*[x for k in sorted(offs_b) for x in (F.lit(k), F.lit(offs_b[k]))])
    wcum = W.partitionBy("_band").orderBy(F.col("v").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = banded.select(
        (map_a[F.col("_band")] + F.sum("ca").over(wcum)).alias("cum_a"),
        (map_b[F.col("_band")] + F.sum("cb").over(wcum)).alias("cum_b"),
    )
    gap_q = F.floor(
        F.abs(
            F.col("cum_a").cast("double") / F.lit(na)
            - F.col("cum_b").cast("double") / F.lit(nb)
        )
        * KS_SCALE
    ).cast("bigint")
    return (
        cum.select(gap_q.alias("gap_q"))
        .agg(F.max("gap_q").alias("ks_q"))
        .select(
            F.lit(na).cast("bigint").alias("na"),
            F.lit(nb).cast("bigint").alias("nb"),
            "ks_q",
        )
    )


@register(
    "seasonal_outliers",
    f"""
    WITH qv AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hr, event_id,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    smed AS (
      SELECT event_type, hr,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS med
      FROM (
        SELECT event_type, hr, v,
               row_number() OVER (PARTITION BY event_type, hr
                                  ORDER BY v ASC, event_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type, hr) AS n
        FROM qv
      ) GROUP BY event_type, hr
    ),
    dev AS (
      SELECT q.event_type, q.event_id, abs(q.v - m.med) AS d
      FROM qv q JOIN smed m ON m.event_type = q.event_type AND m.hr = q.hr
    ),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN d END) AS mad
      FROM (
        SELECT event_type, d, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY d ASC, event_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      ) GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(a.mad) AS mad_q,
           CAST(SUM(CASE WHEN d.d > {MAD_K} * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted robust anomaly detection: values first
    deseasonalize against their (event_type, hour-of-day) rank-method
    median, then MAD-flag the RESIDUALS per event_type — the composition
    that separates "3am is always quiet" from "this 3am is broken",
    which the global mad_outliers / value_outliers_zscore cannot (a
    strong daily cycle inflates their global spread and hides intra-hour
    anomalies). The standard first rung of time-series anomaly detection
    (seasonal-median decomposition), on the same integer-exact
    quantize/rank machinery as mad_outliers.

    Scale: one rank-window pass partitioned on (event_type, hour) — 24x
    more, 24x smaller partitions than the global form — then the MAD
    pass on event_type; both median join-backs broadcast |groups| rows;
    final aggregate map-side combined. hour() is identical cross-engine
    on the µs-normalized timestamps (unlike dayofweek — the
    chi_square_independence caveat)."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    w_rank = W.partitionBy("event_type", "hr").orderBy(
        F.col("v").asc(), F.col("event_id").asc()
    )
    w_all = W.partitionBy("event_type", "hr")
    smed = (
        qv.select(
            "event_type",
            "hr",
            "v",
            F.row_number().over(w_rank).alias("rn"),
            F.count("*").over(w_all).alias("n"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"), F.col("v")
                )
            ).alias("med")
        )
    )
    dev = qv.join(F.broadcast(smed), ["event_type", "hr"]).select(
        "event_type", "event_id", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    w_rank2 = W.partitionBy("event_type").orderBy(F.col("d").asc(), F.col("event_id").asc())
    w_all2 = W.partitionBy("event_type")
    mad = (
        dev.select(
            "event_type",
            "d",
            F.row_number().over(w_rank2).alias("rn"),
            F.count("*").over(w_all2).alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint"), F.col("d")
                )
            ).alias("mad")
        )
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("mad").alias("mad_q"),
            F.sum(F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "max_drawdown_by_user",
    f"""
    WITH qv AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    runs AS (
      SELECT user_id, v,
             MAX(v) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
      FROM qv
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(run_max - v) AS BIGINT) AS max_drawdown_q,
           CAST(MAX(run_max) AS BIGINT) AS peak_q
    FROM runs
    GROUP BY user_id
    """,
)
def max_drawdown_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the running-extremum window pattern
    (peak-to-trough decline against the best value seen so far, the
    financial risk statistic and, generally, the "how far below its own
    high-water mark did this series fall" monitor for any metric
    stream). Distinct window shape from the ranking/lag/frame families
    already covered: a cumulative MAX frame composed with a
    per-partition aggregate over its own output.

    Integer-exact: values quantize before the window, the running max
    and differences stay int64, ordering is total (ts, event_id).

    Scale: ONE window pass partitioned by user (cumulative frames are
    O(1) per row — Spark keeps the running max, no frame rescan), then
    a map-side-combined groupBy on the same key — the exchange is
    reused between the window and the aggregate (same partitioning)."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = qv.select("user_id", "v", F.max("v").over(w).alias("run_max"))
    return runs.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(F.col("run_max") - F.col("v")).cast("bigint").alias("max_drawdown_q"),
        F.max("run_max").cast("bigint").alias("peak_q"),
    )


# ---- MAD family, banded per-group median form ---------------------------
MEDIAN_BANDS = 32
# Sketch accuracy for the band boundaries. Accuracy shapes BAND BALANCE
# only, never the answer (the median is located exactly from the banded
# counts whatever the boundaries are); r13 measured accuracy=10000 paying
# ~1.1 s/pass of pure GK-compression CPU at sf0.1 over accuracy=1000 for
# zero exactness benefit, so the default is the cheap one.
MEDIAN_ACC = 1000


def _group_quantile_bands(
    df: DataFrame, gcol: str, vcol: str,
    bands: int = MEDIAN_BANDS, accuracy: int = MEDIAN_ACC,
) -> dict:
    """Per-group approximate quantile boundaries (the band geometry fed
    to _banded_group_median) as a driver dict — factored out so a
    caller that already knows an approximate shape for a DERIVED column
    (see _fold_boundaries) can skip this pass entirely."""
    pcts = [i / bands for i in range(1, bands)]
    return {
        r[gcol]: sorted(set(r["bs"] or []))
        for r in df.groupBy(gcol)
        .agg(F.percentile_approx(vcol, pcts, accuracy).alias("bs"))
        .collect()
    }


def _fold_boundaries(gb: dict, med_map: dict, key_of=None) -> dict:
    """Approximate band boundaries for d = |v − med(group)| derived on
    the DRIVER by folding each source group's v-quantile grid around
    its own median — the MAD family's second median previously paid a
    whole percentile_approx pass over the deviation frame to learn a
    shape that is a pure function of state already collected (the
    v-grid and the medians). Folding is approximate (the fold of
    quantiles is not the quantiles of the fold), which is exactly as
    much as band geometry needs: balance only, never the answer.
    ``key_of`` maps a source group to its target group (the seasonal
    pass medians per type:hour but MADs per type — the folded pools of
    a type's 24 hours merge, then resample to MEDIAN_BANDS − 1)."""
    pools: dict = {}
    for g, bs in gb.items():
        m = med_map.get(g)
        if m is None:
            continue
        tg = key_of(g) if key_of is not None else g
        pools.setdefault(tg, []).extend(abs(int(b) - int(m)) for b in bs)
    out: dict = {}
    for tg, pool in pools.items():
        vals = sorted(set(pool))
        if len(vals) > MEDIAN_BANDS - 1:
            step = len(vals) / (MEDIAN_BANDS - 1)
            vals = sorted({vals[int(i * step)] for i in range(MEDIAN_BANDS - 1)})
        out[tg] = vals
    return out


def _banded_group_median(
    df: DataFrame, gcol: str, vcol: str, tie_col: str, out: str,
    bands: int = MEDIAN_BANDS, checkpoint: bool = True,
    boundaries: dict | None = None,
) -> DataFrame:
    """Exact per-group rank-method median WITHOUT a per-group global
    window — the per-group application of the _banded_rank idea
    (operators/text.py): approximate per-group quantile boundaries
    split each group's values into {MEDIAN_BANDS} value-range bands
    (band is a pure function of the value, so the approximation shapes
    balance, never the answer); every big-data window partitions by
    (group, band) and therefore ranks ~1/{MEDIAN_BANDS} of one group.
    The selected row is unique because the (value, tie) order is total.

    Round-13 shape (was: collect per-(group, band) counts, then a
    second pass over the target band): ONE action — rank all bands,
    derive each group's target (band, in-band rank) RELATIONALLY from
    the per-band counts (a G×B-row frame; its prefix-sum window is
    bounded by {MEDIAN_BANDS} rows per partition), and broadcast-join
    it back. The ranked frame's shuffle exchange is reused between the
    counts branch and the join, so the input is scanned and shuffled
    once; there is NO per-median driver collect and NO G×B driver
    state at all, and the band geometry rides a broadcast frame
    instead of plan-bloating literal maps (the r9 INSET lesson).

    Returns a |G|-row frame [gcol, out], localCheckpointed (eager) so
    downstream join-backs replay a tiny frame, not this plan (the
    bm25_prf_topk materialize-the-small-thing rationale). ``boundaries``
    (a _group_quantile_bands-shaped dict) skips the boundary pass when
    the caller already knows an approximate shape — geometry shapes
    balance only, so ANY boundary set is correct; groups absent from it
    default to a single band (empty boundary array) via the LEFT
    geometry join, which is still exact — a missing key can skew
    balance, never the median (ADVICE r13: an inner join here silently
    dropped uncovered groups' rows, yielding a missing median)."""
    import pandas as pd
    from pyspark.sql import types as T

    gb = (
        boundaries
        if boundaries is not None
        else _group_quantile_bands(df, gcol, vcol, bands)
    )
    spark = df.sparkSession
    keys = sorted(gb)
    bframe = spark.createDataFrame(
        pd.DataFrame(
            {gcol: keys, "_bs": [[int(b) for b in gb[g]] for g in keys]}
        ),
        schema=T.StructType(
            [
                df.schema[gcol],
                T.StructField("_bs", T.ArrayType(T.LongType())),
            ]
        ),
    )
    banded = (
        df.join(F.broadcast(bframe), gcol, "left")
        .withColumn(
            "_bs",
            F.coalesce(F.col("_bs"), F.array().cast("array<bigint>")),
        )
        .withColumn(
            "_band",
            F.size(F.filter(F.col("_bs"), lambda b: F.col(vcol) >= b)).cast(
                "int"
            ),
        )
        .drop("_bs")
    )
    wr = W.partitionBy(gcol, "_band").orderBy(
        F.col(vcol).asc(), F.col(tie_col).asc()
    )
    ranked = banded.withColumn("_rn", F.row_number().over(wr))
    cells = ranked.groupBy(gcol, "_band").agg(F.max("_rn").alias("_c"))
    wprev = (
        W.partitionBy(gcol)
        .orderBy(F.col("_band").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tgt = (
        cells.withColumn(
            "_cum_prev", F.coalesce(F.sum("_c").over(wprev), F.lit(0))
        )
        .withColumn(
            "_n_g",
            F.sum("_c").over(
                W.partitionBy(gcol)
                .orderBy(F.col("_band").asc())
                .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            ),
        )
        .withColumn("_target", F.expr("(_n_g + 1) div 2"))
        .filter(
            (F.col("_cum_prev") < F.col("_target"))
            & (F.col("_cum_prev") + F.col("_c") >= F.col("_target"))
        )
        .select(
            gcol,
            "_band",
            (F.col("_target") - F.col("_cum_prev")).alias("_tgt_rn"),
        )
    )
    med = (
        ranked.join(F.broadcast(tgt), [gcol, "_band"])
        .filter(F.col("_rn") == F.col("_tgt_rn"))
        .select(gcol, F.col(vcol).alias(out))
    )
    # checkpoint=False is the plan-shape test hook only (consumers of a
    # localCheckpoint see an RDD scan, hiding the window to assert on).
    return med.localCheckpoint(eager=True) if checkpoint else med


def _mad_registry():
    from ..plans.registry import QUERIES

    return QUERIES


@register(
    "mad_outliers_scalable",
    lambda: _mad_registry()["mad_outliers"].oracle,
)
def mad_outliers_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of mad_outliers (same oracle — the hash gate
    proves the rewrite): the exact form's two rank-window passes each
    order an ENTIRE event_type in one task, which at 100 TB with a
    handful of event types is a near-global sort per type. Both median
    passes here go through _banded_group_median: the only windows rank
    one value-range band of one group (~1/{MEDIAN_BANDS} of the rows),
    boundary/count driver state is G x {MEDIAN_BANDS} bounded, and the
    median join-backs broadcast |G|-row checkpointed frames. The final
    aggregate is unchanged from the exact form (map-side combined)."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    gb = _group_quantile_bands(qv, "event_type", "v")
    med = _banded_group_median(
        qv, "event_type", "v", "event_id", "med", boundaries=gb
    )
    med_map = {r["event_type"]: r["med"] for r in med.collect()}
    dev = qv.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "v", "med",
        F.abs(F.col("v") - F.col("med")).alias("d"),
    )
    # The deviation medians reuse folded v-boundaries (driver-only) —
    # one percentile_approx pass for the whole query, not two.
    mad = _banded_group_median(
        dev, "event_type", "d", "event_id", "mad",
        boundaries=_fold_boundaries(gb, med_map),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("med").alias("median_q"),
            F.max("mad").alias("mad_q"),
            F.sum(F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "seasonal_outliers_scalable",
    lambda: _mad_registry()["seasonal_outliers"].oracle,
)
def seasonal_outliers_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of seasonal_outliers (same oracle — the hash
    gate proves the rewrite): the exact form's second pass ranks
    residuals per event_type — with few event types that is a
    near-global window per type (the round-11 verdict's last
    unconverted member of the global-window family) — and its first
    pass, though 24x narrower, still sorts a whole (event_type, hour)
    cell in one task. Both convert to _banded_group_median: the
    seasonal pass keys on a fused "type:hour" group string (G x 24
    groups — driver state still bounded), the MAD pass on event_type;
    every window sees one band of one group. Same final aggregate."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        "event_id",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    ).withColumn("_g", F.format_string("%s:%d", F.col("event_type"), F.col("hr")))
    gb = _group_quantile_bands(qv, "_g", "v")
    smed = _banded_group_median(
        qv, "_g", "v", "event_id", "med", boundaries=gb
    )
    med_map = {r["_g"]: r["med"] for r in smed.collect()}
    dev = qv.join(F.broadcast(smed), "_g").select(
        "event_type", "event_id", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    # Residual-MAD boundaries fold the 24 hourly v-grids of each type
    # around their own medians on the driver — no second boundary pass.
    mad = _banded_group_median(
        dev, "event_type", "d", "event_id", "mad",
        boundaries=_fold_boundaries(
            gb, med_map, key_of=lambda g: g.rsplit(":", 1)[0]
        ),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("mad").alias("mad_q"),
            F.sum(F.when(F.col("d") > MAD_K * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# ---- Exponentially-weighted moving average ------------------------------
EWMA_LAGS = 16  # half-decay window: weight 2^(EWMA_LAGS-1-j) for lag j


def _ewma_oracle() -> str:
    wspec = "PARTITION BY user_id ORDER BY ts ASC, event_id ASC"
    num = " + ".join(
        f"COALESCE(lag(v, {j}) OVER ({wspec}), 0) * {1 << (EWMA_LAGS - 1 - j)}"
        for j in range(EWMA_LAGS)
    )
    den = " + ".join(
        f"CASE WHEN lag(v, {j}) OVER ({wspec}) IS NOT NULL"
        f" THEN {1 << (EWMA_LAGS - 1 - j)} ELSE 0 END"
        for j in range(EWMA_LAGS)
    )
    return f"""
    WITH qv AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * {ZSCORE_Q}) AS BIGINT) AS v
      FROM events
    ),
    sm AS (
      SELECT user_id, event_id, v,
             CAST({num} AS BIGINT) AS num,
             CAST({den} AS BIGINT) AS den
      FROM qv
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           v AS value_q,
           CAST((num * 1000000) // den AS BIGINT) AS ewma_q
    FROM sm
    """


@register("ewma_smoothed_values", _ewma_oracle())
def ewma_smoothed_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the smoothing
    primitive of every monitoring/anomaly stack, and a window shape the
    frame families don't cover: POSITION-DEPENDENT weights inside the
    frame (plain RANGE/ROWS frames weight uniformly). The truncated
    half-decay form (α = 1/2, window {EWMA_LAGS}) keeps everything in
    exact integers: y = Σⱼ x₍ₜ₋ⱼ₎·2^({EWMA_LAGS}−1−j) over available
    lags, normalized by the matching weight sum and quantized to
    micro-units with integer division — bit-identical cross-engine (no
    float powers anywhere). Partial windows at each user's history
    start renormalize over the lags that exist, matching the oracle's
    CASE chain exactly.

    Scale: ONE window pass partitioned by user (all {EWMA_LAGS} lag
    expressions share the window spec, so Spark evaluates them in a
    single Window operator with O(1) state per row — no frame rescan,
    no collect_list materialization); everything after is map-only
    integer arithmetic. At 100 TB this is the shape a per-entity
    smoothing pass must have: no global window, state bounded by the
    lag depth."""
    ev = table(spark, sf_dir, "events")
    qv = ev.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * ZSCORE_Q).cast("bigint").alias("v"),
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    num = None
    den = None
    for j in range(EWMA_LAGS):
        wt = 1 << (EWMA_LAGS - 1 - j)
        lj = F.lag("v", j).over(w) if j else F.col("v")
        n_term = F.coalesce(lj, F.lit(0)) * F.lit(wt)
        d_term = F.when(lj.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = n_term if num is None else num + n_term
        den = d_term if den is None else den + d_term
    sm = qv.select(
        "user_id", "event_id", "v",
        num.cast("bigint").alias("num"),
        den.cast("bigint").alias("den"),
    )
    # Integer division, not `/` (which is a double divide in Spark and
    # would round where the oracle's `//` truncates).
    return sm.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("v").alias("value_q"),
        F.expr("CAST((num * 1000000) div den AS BIGINT)").alias("ewma_q"),
    )


# ---- Sliding exact median (order statistic in a moving frame) ------------
MOVMED_FRAME = 15  # trailing orders per customer in the frame


@register(
    "moving_median_spend",
    f"""
    WITH q AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS price_q,
             o_orderdate
      FROM orders
    ),
    framed AS (
      SELECT o_orderkey, o_custkey, price_q,
             list(price_q) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN {MOVMED_FRAME - 1} PRECEDING AND CURRENT ROW
             ) AS fr
      FROM q
    )
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           price_q,
           CAST(list_sort(fr)[CAST((len(fr) + 1) // 2 AS INT)] AS BIGINT)
             AS moving_median_q
    FROM framed
    """,
)
def moving_median_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING exact median — the order-statistic-in-a-moving-frame
    window class (running medians for monitoring/robust baselines),
    which no SUM/MIN/MAX frame can express: at each order, the
    rank-method median of the customer's trailing {MOVMED_FRAME}
    order totals. Implemented as collect_list over a bounded ROWS
    frame + sort_array + element_at — the frame array is at most
    {MOVMED_FRAME} elements, so per-row cost is O(F log F) with F a
    CONSTANT, and partial frames at each customer's history start
    median over what exists (matching the oracle's len(fr)-based
    index). Prices quantize to int64 cents so the selected element is
    bit-identical cross-engine.

    Scale: ONE window pass partitioned by customer (never global);
    frame state is F values per row in flight — the same cost class as
    a rows-frame SUM times a constant. The contrast with
    _banded_group_median is deliberate and documented: banding solves
    the WHOLE-GROUP median at scale; a bounded moving frame needs no
    banding because the frame itself is the bound."""
    o = table(spark, sf_dir, "orders")
    q = o.select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price_q"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-(MOVMED_FRAME - 1), W.currentRow)
    )
    fr = F.sort_array(F.collect_list("price_q").over(w))
    med = F.element_at(fr, ((F.size(fr) + 1) / 2).cast("int"))
    return q.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        "price_q",
        med.cast("bigint").alias("moving_median_q"),
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY prev_type)
                AS BIGINT) AS prob_q
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV TRANSITION MATRIX over per-user event
    sequences — the classic behavioral statistic (what follows what,
    with what probability) behind next-event prediction features,
    anomaly scoring, and funnel-shape discovery. Per user the events
    order by (µs timestamp, event_id) — a total order identical in
    both engines (Spark's nanos→µs truncation mirrors DuckDB's
    TIMESTAMP_NS read; the id breaks µs ties) — lag() pairs each event
    with its predecessor, and the (prev, next) counts row-normalize to
    µ-unit integer probabilities (the established quantize-then-divide
    parity rule).

    Scale: the lag window partitions by user (bounded sequences, never
    a global sort); the pair aggregate is map-side combined to
    |event_type|² cells, and the normalizing window reads THAT
    cell frame — bounded by the type vocabulary however large the
    event volume grows."""
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.expr(
            "CAST((n * 1000000) div SUM(n) OVER (PARTITION BY prev_type)"
            " AS BIGINT)"
        ).alias("prob_q"),
    )


@register(
    "transition_surprisal_users",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    trans AS (
      SELECT user_id, prev_type, event_type
      FROM seq WHERE prev_type IS NOT NULL
    ),
    pairs AS (
      SELECT prev_type, event_type,
             CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_pair
      FROM trans GROUP BY prev_type, event_type
    ),
    prows AS (
      SELECT prev_type,
             CAST(floor(ln(COUNT(*)) * 1e6) AS BIGINT) AS q_ln_row
      FROM trans GROUP BY prev_type
    )
    SELECT t.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(r.q_ln_row - p.q_ln_pair) // COUNT(*) AS BIGINT)
             AS mean_surprisal_q
    FROM trans t
    JOIN pairs p ON p.prev_type = t.prev_type
                AND p.event_type = t.event_type
    JOIN prows r ON r.prev_type = t.prev_type
    GROUP BY t.user_id
    """,
)
def transition_surprisal_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user BEHAVIORAL ANOMALY score from the transition matrix:
    each observed transition's surprisal −ln p(next|prev) =
    ln c(prev·) − ln c(prev,next), averaged per user in µ-nats —
    users whose event sequences keep taking globally-rare transitions
    float to the top (the sequence-model analog of the corpus
    surprisal scorers). Logs follow the established
    quantized-ln-of-integer-count rule (floor(ln·10⁶) per TERM before
    any sum — ln is not correctly rounded cross-engine; see the
    surprisal block in operators/text.py).

    Scale: the lag window is per-user (bounded sequences); both
    statistic frames are |event_type|²-cell aggregates BROADCAST back
    onto the transition stream — the corpus-sized side is never
    shuffled; the final aggregate is user-grain."""
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
        .alias("prev_type"),
    )
    trans = seq.filter(F.col("prev_type").isNotNull())
    pairs = trans.groupBy("prev_type", "event_type").agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_pair")
    )
    prows = trans.groupBy("prev_type").agg(
        F.floor(F.ln(F.count("*")) * 1e6).cast("bigint").alias("q_ln_row")
    )
    return (
        trans.join(F.broadcast(pairs), ["prev_type", "event_type"])
        .join(F.broadcast(prows), "prev_type")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.expr(
                "CAST(SUM(q_ln_row - q_ln_pair) div COUNT(*) AS BIGINT)"
            ).alias("mean_surprisal_q"),
        )
    )


@register(
    "conversion_attribution",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(floor(value * 100) AS BIGINT) AS value_cents,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS journey
      FROM events
    ),
    purch AS (
      SELECT user_id, journey, value_cents
      FROM ordered WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, journey, event_type,
             row_number() OVER (PARTITION BY user_id, journey
                                ORDER BY ts, event_id) AS rn_f,
             row_number() OVER (PARTITION BY user_id, journey
                                ORDER BY ts DESC, event_id DESC) AS rn_l
      FROM ordered WHERE event_type <> 'purchase'
    ),
    att AS (
      SELECT 'first_touch' AS model, p.user_id, p.journey, p.value_cents,
             COALESCE(t.event_type, '(direct)') AS touch_type
      FROM purch p
      LEFT JOIN touches t ON t.user_id = p.user_id
                         AND t.journey = p.journey AND t.rn_f = 1
      UNION ALL
      SELECT 'last_touch', p.user_id, p.journey, p.value_cents,
             COALESCE(t.event_type, '(direct)')
      FROM purch p
      LEFT JOIN touches t ON t.user_id = p.user_id
                         AND t.journey = p.journey AND t.rn_l = 1
    )
    SELECT model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM att
    GROUP BY model, touch_type
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-analytics CONVERSION ATTRIBUTION — first-touch and
    last-touch credit per journey: each user's event stream splits
    into journeys at purchase boundaries (journey id = count of PRIOR
    purchases, an exclusive running sum), every purchase credits the
    journey's first and last non-purchase touch (purchases with no
    preceding touch since the previous conversion credit '(direct)'),
    and revenue aggregates per (model, touch type). Purchase values
    quantize to cents PER EVENT before any SUM (quantize-then-sum),
    and every window orders by (ts, event_id) — the engines' shared
    total order.

    Scale: all three windows partition by user (or user, journey) —
    bounded sequences, never a global sort; the attribution joins key
    on (user, journey) and the final aggregate is
    |models|x|event types| cells, map-side combined."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    wj = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = ev.withColumn(
        "journey",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wj),
            F.lit(0),
        ).cast("bigint"),
    )
    purch = ordered.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey", "value_cents"
    )
    wf = W.partitionBy("user_id", "journey").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wl = W.partitionBy("user_id", "journey").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    touches = (
        ordered.filter(F.col("event_type") != "purchase")
        .withColumn("rn_f", F.row_number().over(wf))
        .withColumn("rn_l", F.row_number().over(wl))
        .select("user_id", "journey", "event_type", "rn_f", "rn_l")
    )
    first = touches.filter(F.col("rn_f") == 1).select(
        "user_id", "journey", F.col("event_type").alias("touch_type")
    )
    last = touches.filter(F.col("rn_l") == 1).select(
        "user_id", "journey", F.col("event_type").alias("touch_type")
    )

    def credit(model: str, tdf: DataFrame) -> DataFrame:
        return (
            purch.join(tdf, ["user_id", "journey"], "left")
            .select(
                F.lit(model).alias("model"),
                F.coalesce(F.col("touch_type"), F.lit("(direct)")).alias(
                    "touch_type"
                ),
                "value_cents",
            )
        )

    att = credit("first_touch", first).unionByName(credit("last_touch", last))
    return att.groupBy("model", "touch_type").agg(
        F.count("*").cast("bigint").alias("n_conversions"),
        F.sum("value_cents").cast("bigint").alias("value_cents"),
    )


PATHS_TOP = 20  # converting journey paths kept


@register(
    "journey_path_counts",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(floor(value * 100) AS BIGINT) AS value_cents,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS journey
      FROM events
    ),
    purch AS (
      SELECT user_id, journey, value_cents
      FROM ordered WHERE event_type = 'purchase'
    ),
    paths AS (
      SELECT user_id, journey,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM ordered WHERE event_type <> 'purchase'
      GROUP BY user_id, journey
    ),
    joined AS (
      SELECT COALESCE(t.path, '(direct)') AS path, p.value_cents
      FROM purch p
      LEFT JOIN paths t ON t.user_id = p.user_id AND t.journey = p.journey
    ),
    agg AS (
      SELECT path,
             CAST(COUNT(*) AS BIGINT) AS n_conversions,
             CAST(SUM(value_cents) AS BIGINT) AS value_cents
      FROM joined GROUP BY path
    )
    SELECT path, n_conversions, value_cents, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_conversions DESC,
                                   value_cents DESC, path ASC) AS rank
      FROM agg
    ) WHERE rank <= {PATHS_TOP}
    """,
)
def journey_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERTING-PATH mining — the sequence-analytics complement of
    conversion_attribution: each converted journey's full touch
    sequence ('view>click>signup', ordered by the engines' shared
    (ts, event_id) total order) aggregated into the top-{PATHS_TOP}
    paths by conversions and revenue. This is the funnel-DISCOVERY
    query (which paths actually convert) where funnel_conversion
    measures a path stated up front. Path assembly is array_sort over
    (ts, event_id, type) structs — deterministic, no collect_list
    order reliance; revenue quantizes to cents per event before
    summing.

    Scale: journeys and paths build inside per-user windows and a
    (user, journey)-grain aggregate — bounded sequences, never a
    global sort; path cardinality is capped by journey length ^
    |event types| in principle but by observed-journey count in
    practice, and only path-grain aggregates reach the final
    TakeOrdered top-k."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    wj = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = ev.withColumn(
        "journey",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wj),
            F.lit(0),
        ).cast("bigint"),
    )
    purch = ordered.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey", "value_cents"
    )
    paths = (
        ordered.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "journey")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    agg = (
        purch.join(paths, ["user_id", "journey"], "left")
        .select(
            F.coalesce(F.col("path"), F.lit("(direct)")).alias("path"),
            "value_cents",
        )
        .groupBy("path")
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.sum("value_cents").cast("bigint").alias("value_cents"),
        )
    )
    top = agg.orderBy(
        F.col("n_conversions").desc(), F.col("value_cents").desc(),
        F.col("path").asc(),
    ).limit(PATHS_TOP)
    w = W.orderBy(
        F.col("n_conversions").desc(), F.col("value_cents").desc(),
        F.col("path").asc(),
    )
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "path", "n_conversions", "value_cents", "rank"
    )


@register(
    "cusum_changepoint_events",
    """
    WITH ev AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100) AS BIGINT) AS v_c
      FROM events WHERE value >= 0
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_c) AS BIGINT) AS s
      FROM ev GROUP BY event_type
    ),
    c AS (
      SELECT e.event_type, e.event_id, e.ts, m.n,
             CAST(m.s // m.n AS BIGINT) AS mean_c,
             CAST(SUM(e.v_c) OVER w
                  - (row_number() OVER w) * (m.s // m.n) AS BIGINT) AS cusum
      FROM ev e JOIN m ON m.event_type = e.event_type
      WINDOW w AS (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events, mean_c,
           CAST(event_id AS BIGINT) AS cp_event_id,
           CAST(abs(cusum) AS BIGINT) AS max_abs_cusum
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(cusum) DESC, ts ASC,
                                            event_id ASC) AS rk
      FROM c
    ) WHERE rk = 1
    """,
)
def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT per event type — the classic mean-shift
    detector (Page 1954) next to seasonal_outliers and
    value_outliers_zscore: per type, the cumulative sum of deviations
    from the type's mean value S_i = Σ_{j≤i}(v_j − mean) over the
    (ts, event_id) time order, and the event at argmax |S_i| — the
    most likely mean-shift point (ties to the earliest event). Values
    are per-event cents-quantized BEFORE any sum, the mean is the
    TRUNCATED integer mean s div n (all sums non-negative under the
    value ≥ 0 guard, so both engines' division semantics agree), and
    S_i = running_sum − i·mean needs only a running sum and a running
    count — no per-row subtraction column.

    Scale: the oracle's per-type window is a one-task-per-type funnel
    at event-stream scale, so the Spark plan runs the DISTRIBUTED
    PREFIX SUM shape (ks_two_sample_scalable's pattern, banded by
    calendar day): per-(type, day) sums and counts collect to
    calendar-bounded driver state, offsets broadcast back as a literal
    map, and the running sum/count windows partition by (type, day) —
    day-sized tasks however large the stream. The per-type argmax is a
    max_by aggregate (map-side partial), not a sort."""
    ev = table(spark, sf_dir, "events").filter(F.col("value") >= 0).select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_c"),
    )
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_c").cast("bigint").alias("s"),
    )
    banded = ev.withColumn("_day", F.to_date("ts"))
    cells = (
        banded.groupBy("event_type", "_day")
        .agg(F.sum("v_c").alias("ds"), F.count("*").alias("dn"))
        .collect()
    )
    # Offsets ride back as a BROADCAST-joined frame, not a create_map
    # literal: the (type, day) grid is calendar-bounded but grows with
    # the stream's time span — a 20k-entry literal map blows codegen
    # out of whole-stage compilation, a tiny broadcast join never does.
    off_rows = []
    acc: dict[str, tuple[int, int]] = {}
    for r in sorted(cells, key=lambda r: (r["event_type"], r["_day"])):
        sa, na = acc.get(r["event_type"], (0, 0))
        off_rows.append((r["event_type"], r["_day"], sa, na))
        acc[r["event_type"]] = (sa + r["ds"], na + r["dn"])
    offs = spark.createDataFrame(
        off_rows, "event_type string, _day date, off_s long, off_n long"
    )
    wcum = W.partitionBy("event_type", "_day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = banded.join(F.broadcast(offs), ["event_type", "_day"]).select(
        "event_type",
        "event_id",
        "ts",
        (F.col("off_s") + F.sum("v_c").over(wcum)).cast("bigint").alias("run_s"),
        (F.col("off_n") + F.count("*").over(wcum)).cast("bigint").alias("run_i"),
    )
    scored = cum.join(F.broadcast(m), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        "n",
        F.expr("CAST(s div n AS BIGINT)").alias("mean_c"),
        F.expr("CAST(abs(run_s - run_i * (s div n)) AS BIGINT)").alias(
            "abs_cusum"
        ),
    )
    return _cusum_select(scored)


def _cusum_select(scored: DataFrame) -> DataFrame:
    """Per-type changepoint pick over a candidate frame carrying
    (event_type, event_id, ts, n, mean_c, abs_cusum) — max |S| with
    the earliest-(ts, event_id) tiebreak as one max_by aggregate.
    Shared by the batch detector (candidates = every event) and the
    hull-store reader (candidates = hull vertices, which provably
    contain every achiever of the max — see stream_queries's
    cusum-store notes)."""
    return scored.groupBy("event_type").agg(
        F.first("n").alias("n_events"),
        F.first("mean_c").alias("mean_c"),
        F.max_by(
            F.col("event_id").cast("bigint"),
            F.struct(
                F.col("abs_cusum"),
                (-F.unix_micros("ts")).alias("nts"),
                (-F.col("event_id")).alias("nid"),
            ),
        ).alias("cp_event_id"),
        F.max("abs_cusum").cast("bigint").alias("max_abs_cusum"),
    )


KM_VALUE_FLOOR = 200  # a purchase this large is the conversion event


@register(
    "kaplan_meier_conversion",
    f"""
    WITH ev AS (
      SELECT user_id, event_type, value, CAST(ts AS DATE) AS day
      FROM events
    ),
    u AS (SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id),
    p AS (
      SELECT user_id, MIN(day) AS pd
      FROM ev WHERE event_type = 'purchase' AND value >= {KM_VALUE_FLOOR}
      GROUP BY user_id
    ),
    mx AS (SELECT MAX(day) AS m FROM ev),
    lab AS (
      SELECT u.user_id,
             CAST(date_trunc('week', u.fd) AS DATE) AS cohort_week,
             CASE WHEN p.pd IS NULL THEN mx.m - u.fd
                  ELSE p.pd - u.fd END AS t,
             CASE WHEN p.pd IS NULL THEN 1 ELSE 0 END AS cen
      FROM u LEFT JOIN p ON p.user_id = u.user_id CROSS JOIN mx
    ),
    g AS (
      SELECT cohort_week, CAST(t AS BIGINT) AS t_days,
             CAST(SUM(1 - cen) AS BIGINT) AS converted,
             CAST(SUM(cen) AS BIGINT) AS censored
      FROM lab GROUP BY cohort_week, t_days
    ),
    sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n
           FROM lab GROUP BY cohort_week),
    r AS (
      SELECT g.*,
             CAST(sz.n - COALESCE(SUM(g.converted + g.censored) OVER (
               PARTITION BY g.cohort_week ORDER BY g.t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS at_risk
      FROM g JOIN sz USING (cohort_week)
    ),
    t AS (
      SELECT *,
             CASE WHEN at_risk - converted = 0 THEN -1000000000
                  ELSE CAST(floor(ln(at_risk - converted) * 1000000) AS BIGINT)
                     - CAST(floor(ln(at_risk) * 1000000) AS BIGINT)
             END AS term
      FROM r
    )
    SELECT cohort_week, t_days, at_risk, converted, censored,
           CAST(SUM(term) OVER (PARTITION BY cohort_week ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS km_ln_q
    FROM t
    """,
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER SURVIVAL CURVE for time-to-conversion — the
    standard censored time-to-event estimator (Kaplan & Meier 1958)
    the retention family lacks: per signup-week cohort, a user's
    event time is the days from their first event to their first
    HIGH-VALUE purchase (value ≥ {KM_VALUE_FLOOR}); users who never
    convert are RIGHT-CENSORED at the observation end — they leave
    the risk set without a survival step, which is exactly what a
    naive conversion-rate cut gets wrong. Both branches are live on
    the fixtures (sf0.01: 32 conversions over 22 distinct days, 118
    censored). Per event time: the at-risk count, conversion/censor
    counts, and the curve as a QUANTIZED LOG — km_ln_q =
    Σ (flq(nᵢ−dᵢ) − flq(nᵢ)) with flq(x) = floor(ln(x)·1e6) per
    INTEGER count (the surprisal pattern: ln never emitted raw, both
    engines quantize the same integer argument); an exhausted risk
    set writes the −1e9 absorbing sentinel. exp(km_ln_q/1e6)
    recovers S(t) to ~1e-6.

    Scale: one user-grain aggregate + one filtered user-grain min
    (both map-side combined), then a cohort-week × days-grain frame
    (calendar-bounded however large the stream) and running sums over
    that bounded frame — the windows never see user-grain rows."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    u = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    p = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= KM_VALUE_FLOOR)
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("pd"))
    )
    mx = ev.agg(F.max("day").alias("m"))
    return _km_curve_from_user_times(u.join(p, "user_id", "left"), mx)


def _km_curve_from_user_times(up: DataFrame, mx: DataFrame) -> DataFrame:
    """Kaplan–Meier epilogue over a user-times frame (user_id, fd
    first-event day, pd nullable first-conversion day) and a 1-row
    observation-end frame (m) — shared by the batch
    kaplan_meier_conversion and the min-merge-store-served
    stream_kaplan_meier (streaming.stream_queries)."""
    lab = up.crossJoin(F.broadcast(mx)).select(
        F.date_trunc("week", F.col("fd")).cast("date").alias("cohort_week"),
        F.when(
            F.col("pd").isNull(), F.datediff(F.col("m"), F.col("fd"))
        )
        .otherwise(F.datediff(F.col("pd"), F.col("fd")))
        .cast("bigint")
        .alias("t_days"),
        F.when(F.col("pd").isNull(), 1).otherwise(0).alias("cen"),
    )
    g = lab.groupBy("cohort_week", "t_days").agg(
        F.sum(1 - F.col("cen")).cast("bigint").alias("converted"),
        F.sum("cen").cast("bigint").alias("censored"),
    )
    sz = lab.groupBy("cohort_week").agg(F.count("*").cast("bigint").alias("n"))
    wprev = (
        W.partitionBy("cohort_week")
        .orderBy(F.col("t_days").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = g.join(sz, "cohort_week").withColumn(
        "at_risk",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("converted") + F.col("censored")).over(wprev),
                F.lit(0),
            )
        ).cast("bigint"),
    )
    flq = lambda c: F.floor(F.log(c.cast("double")) * 1000000).cast("bigint")
    t = r.withColumn(
        "term",
        F.when(
            F.col("at_risk") - F.col("converted") == 0, F.lit(-1000000000)
        ).otherwise(
            flq(F.col("at_risk") - F.col("converted")) - flq(F.col("at_risk"))
        ),
    )
    wcum = (
        W.partitionBy("cohort_week")
        .orderBy(F.col("t_days").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.select(
        "cohort_week",
        "t_days",
        "at_risk",
        "converted",
        "censored",
        F.sum("term").over(wcum).cast("bigint").alias("km_ln_q"),
    )


MARKOV_VI_ROUNDS = 16  # unrolled value-iteration rounds (truncated contract)
MARKOV_TARGET = "purchase"  # the absorbing conversion state


def _markov_absorption_oracle() -> str:
    rounds = []
    for k in range(MARKOV_VI_ROUNDS):
        rounds.append(f"""e{k + 1} AS (
      SELECT t.prev_type AS typ,
             CAST(1000 + COALESCE(SUM(t.p_ppm * COALESCE(e.v, 0)
                                      // 1000000), 0) AS BIGINT) AS v
      FROM pm t LEFT JOIN e{k} e ON e.typ = t.event_type
                                AND t.event_type <> '{MARKOV_TARGET}'
      GROUP BY t.prev_type
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    ),
    pm AS (
      SELECT prev_type, event_type,
             CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type)
                  AS BIGINT) AS p_ppm
      FROM pairs
    ),
    e0 AS (SELECT DISTINCT prev_type AS typ, CAST(0 AS BIGINT) AS v
           FROM pm WHERE prev_type <> '{MARKOV_TARGET}'),
    {", ".join(rounds)},
    conv AS (
      SELECT prev_type AS typ, p_ppm AS conv_p_ppm
      FROM pm WHERE event_type = '{MARKOV_TARGET}'
    )
    SELECT e.typ AS event_type,
           e.v AS expected_steps_milli,
           CAST(COALESCE(c.conv_p_ppm, 0) AS BIGINT) AS conv_p_ppm
    FROM e{MARKOV_VI_ROUNDS} e LEFT JOIN conv c ON c.typ = e.typ
    """


@register("markov_absorption_time", _markov_absorption_oracle())
def markov_absorption_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-PASSAGE TIME to conversion in the behavioral Markov chain
    — the absorbing-chain statistic built on event_transition_matrix:
    from each event type, the expected number of events until the next
    '{MARKOV_TARGET}' (for the {MARKOV_TARGET} row itself: the
    RECURRENCE time to the next one), estimated by
    {MARKOV_VI_ROUNDS} rounds of integer value iteration
    E ← 1 + P·E with E({MARKOV_TARGET}) pinned to 0 — the truncated
    fixed-round contract (the LPA-rounds pattern: a pure function of
    the chain, unrolled identically in the oracle). Probabilities are
    the matrix's own ppm integers; expectations accumulate in
    milli-steps; every multiply-divide is BIGINT — both engines run
    the identical recurrence. Alongside each expectation: the one-step
    conversion probability (ppm).

    Scale: the distributed work is the lag window (user-partitioned,
    bounded sequences) + the |types|²-cell aggregate; the chain solve
    runs on that bounded cell table collected to the driver (the
    doremi/kmeans bounded-driver-state pattern — O(100) event types at
    any corpus size) and the result frame derives from the cell frame
    by a broadcast join."""
    seq = table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("ts").asc(), F.col("event_id").asc()
            )
        )
        .alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return _markov_vi(spark, pairs)


def _markov_vi(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Integer value-iteration epilogue over a (prev_type, event_type,
    n) pair-count frame — shared by the batch markov_absorption_time
    and the transition-store-served stream_markov_absorption
    (streaming.stream_queries)."""
    pm = pairs.select(
        "prev_type",
        "event_type",
        F.expr(
            "CAST(n * 1000000 div SUM(n) OVER (PARTITION BY prev_type)"
            " AS BIGINT)"
        ).alias("p_ppm"),
    ).persist()
    defer_unpersist(pm)
    # Bounded collect: |event types|^2 cells (see scale note).
    cells = pm.collect()
    p: dict[str, dict[str, int]] = {}
    for r in cells:
        p.setdefault(r["prev_type"], {})[r["event_type"]] = int(r["p_ppm"])
    types = sorted(p)
    e = {t: 0 for t in types}
    for _ in range(MARKOV_VI_ROUNDS):
        e = {
            i: 1000
            + sum(
                pij * (e.get(j, 0) if j != MARKOV_TARGET else 0) // 1_000_000
                for j, pij in p[i].items()
            )
            for i in types
        }
    edf = spark.createDataFrame(
        [(t, int(e[t]), int(p[t].get(MARKOV_TARGET, 0))) for t in types],
        "event_type string, expected_steps_milli long, conv_p_ppm long",
    )
    # Tie the result to the distributed cell frame (one row per type).
    base = pm.select(F.col("prev_type").alias("event_type")).distinct()
    return base.join(F.broadcast(edf), "event_type").select(
        "event_type", "expected_steps_milli", "conv_p_ppm"
    )


@register(
    "logrank_conversion_ab",
    f"""
    WITH ev AS (
      SELECT user_id, event_type, value, CAST(ts AS DATE) AS day
      FROM events
    ),
    u AS (SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id),
    p AS (
      SELECT user_id, MIN(day) AS pd
      FROM ev WHERE event_type = 'purchase' AND value >= {KM_VALUE_FLOOR}
      GROUP BY user_id
    ),
    mx AS (SELECT MAX(day) AS m FROM ev),
    lab AS (
      SELECT CAST(u.user_id % 2 AS INT) AS grp,
             CASE WHEN p.pd IS NULL THEN mx.m - u.fd
                  ELSE p.pd - u.fd END AS t,
             CASE WHEN p.pd IS NULL THEN 1 ELSE 0 END AS cen
      FROM u LEFT JOIN p ON p.user_id = u.user_id CROSS JOIN mx
    ),
    g AS (
      SELECT CAST(t AS BIGINT) AS t_days,
             CAST(SUM(CASE WHEN grp = 1 AND cen = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 1 AND cen = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp = 0 AND cen = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d0,
             CAST(SUM(CASE WHEN grp = 0 AND cen = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c0
      FROM lab GROUP BY t_days
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1t,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0t
      FROM lab
    ),
    r AS (
      SELECT g.*,
             CAST(tot.n1t - COALESCE(SUM(g.d1 + g.c1) OVER (ORDER BY g.t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1,
             CAST(tot.n0t - COALESCE(SUM(g.d0 + g.c0) OVER (ORDER BY g.t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n0
      FROM g CROSS JOIN tot
    ),
    terms AS (
      SELECT d1, d0, n1, n0, n1 + n0 AS n, d1 + d0 AS d,
             CAST(d1 * 1000000 - (d1 + d0) * n1 * 1000000 // (n1 + n0)
                  AS BIGINT) AS oe_q,
             CAST((d1 + d0)
                  * ((n1 * 1000000 // (n1 + n0))
                     * ((n1 + n0 - n1) * 1000000 // (n1 + n0)) // 1000000)
                  * (CASE WHEN n1 + n0 - 1 = 0 THEN 0
                          ELSE (n1 + n0 - (d1 + d0)) * 1000000
                               // (n1 + n0 - 1) END)
                  // 1000000 AS BIGINT) AS v_q
      FROM r WHERE d1 + d0 > 0
    ),
    s AS (
      SELECT CAST(SUM(oe_q) AS BIGINT) AS oe_q,
             CAST(SUM(v_q) AS BIGINT) AS var_q,
             CAST(SUM(d1) AS BIGINT) AS events1,
             CAST(SUM(d0) AS BIGINT) AS events0
      FROM terms
    )
    SELECT tot.n1t AS n_group1, tot.n0t AS n_group0,
           s.events1, s.events0, s.oe_q, s.var_q,
           CAST(CASE WHEN s.var_q = 0 THEN 0 ELSE floor(
             (CAST(s.oe_q AS DOUBLE) / 1000000)
             * (CAST(s.oe_q AS DOUBLE) / 1000000)
             / (CAST(s.var_q AS DOUBLE) / 1000000) * 1000) END AS BIGINT)
             AS logrank_z2_milli
    FROM s CROSS JOIN tot
    """,
)
def logrank_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK TEST between two exposure groups' time-to-conversion
    curves — the censoring-aware A/B significance test that pairs with
    kaplan_meier_conversion (Mantel 1966; comparing raw conversion
    rates ignores that censored users had less time to convert): users
    hash-assign to groups by id parity (the dataset_split_assign
    pattern — on this fixture the groups are exchangeable, so the
    statistic should sit near zero; the OPERATOR is the deliverable),
    share the KM clock (first event → first value-≥{KM_VALUE_FLOOR}
    purchase, censored at observation end), and at every conversion
    time the observed group-1 conversions compare against the
    hypergeometric expectation, with the matching variance. All terms
    are stepwise ppm-quantized BIGINT (each factor ≤ 1e6 before the
    next multiply, so nothing overflows up to ~1e9 users); the final
    χ² forms from the two exact integer sums via correctly-rounded
    double multiply/divide only (no pow, no ln), emitted as
    milli-units.

    Scale: user-grain aggregates (map-side combined) collapse to a
    conversion-time-grain frame bounded by the observation calendar —
    the running at-risk sums and the term sums never see user-grain
    rows."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    u = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    p = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= KM_VALUE_FLOOR)
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("pd"))
    )
    mx = ev.agg(F.max("day").alias("m"))
    return _logrank_from_user_times(u.join(p, "user_id", "left"), mx)


def _logrank_from_user_times(up: DataFrame, mx: DataFrame) -> DataFrame:
    """Log-rank epilogue over a user-times frame (user_id, fd, pd
    nullable) and a 1-row observation-end frame — shared by the batch
    logrank_conversion_ab and the KM-store-served stream_logrank
    (streaming.stream_queries)."""
    lab = (
        up
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.when(
                F.col("pd").isNull(), F.datediff(F.col("m"), F.col("fd"))
            )
            .otherwise(F.datediff(F.col("pd"), F.col("fd")))
            .cast("bigint")
            .alias("t_days"),
            F.when(F.col("pd").isNull(), 1).otherwise(0).alias("cen"),
        )
    )
    g = lab.groupBy("t_days").agg(
        F.sum(F.when((F.col("grp") == 1) & (F.col("cen") == 0), 1).otherwise(0))
        .cast("bigint").alias("d1"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("cen") == 1), 1).otherwise(0))
        .cast("bigint").alias("c1"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("cen") == 0), 1).otherwise(0))
        .cast("bigint").alias("d0"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("cen") == 1), 1).otherwise(0))
        .cast("bigint").alias("c0"),
    )
    tot = lab.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1t"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0t"),
    )
    # The running at-risk window runs over the conversion-time grain —
    # bounded by the observation calendar, never user-grain (see note).
    wprev = W.orderBy(F.col("t_days").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    r = g.crossJoin(F.broadcast(tot)).select(
        "*",
        (
            F.col("n1t")
            - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(wprev), F.lit(0))
        ).cast("bigint").alias("n1"),
        (
            F.col("n0t")
            - F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(wprev), F.lit(0))
        ).cast("bigint").alias("n0"),
    )
    terms = r.filter(F.col("d1") + F.col("d0") > 0).select(
        "d1",
        "d0",
        F.expr(
            "CAST(d1 * 1000000 - (d1 + d0) * n1 * 1000000 div (n1 + n0)"
            " AS BIGINT)"
        ).alias("oe_q"),
        F.expr(
            "CAST((d1 + d0)"
            " * ((n1 * 1000000 div (n1 + n0))"
            "    * ((n1 + n0 - n1) * 1000000 div (n1 + n0)) div 1000000)"
            " * (CASE WHEN n1 + n0 - 1 = 0 THEN 0"
            "         ELSE (n1 + n0 - (d1 + d0)) * 1000000"
            "              div (n1 + n0 - 1) END)"
            " div 1000000 AS BIGINT)"
        ).alias("v_q"),
    )
    s = terms.agg(
        F.sum("oe_q").cast("bigint").alias("oe_q"),
        F.sum("v_q").cast("bigint").alias("var_q"),
        F.sum("d1").cast("bigint").alias("events1"),
        F.sum("d0").cast("bigint").alias("events0"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("n1t").alias("n_group1"),
        F.col("n0t").alias("n_group0"),
        "events1",
        "events0",
        "oe_q",
        "var_q",
        F.expr(
            "CAST(CASE WHEN var_q = 0 THEN 0 ELSE floor("
            " (CAST(oe_q AS DOUBLE) / 1000000)"
            " * (CAST(oe_q AS DOUBLE) / 1000000)"
            " / (CAST(var_q AS DOUBLE) / 1000000) * 1000) END AS BIGINT)"
        ).alias("logrank_z2_milli"),
    )


# Wald sequential probability-ratio test (SPRT, Wald 1945) on the
# conversion rate: H0 p<=SPRT_P0 vs H1 p>=SPRT_P1 at alpha=beta=0.05.
# Per-user log-likelihood increments and the decision boundaries are
# precomputed in Python as exact micro-nat BIGINTs (the RBO-weights
# pattern: neither engine ever evaluates ln at query time).
SPRT_P0 = 0.20
SPRT_P1 = 0.35
import math as _math

_SPRT_C1 = _math.floor(_math.log(SPRT_P1 / SPRT_P0) * 1e6)  # converter
_SPRT_C0 = _math.floor(
    _math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e6
)  # non-converter
_SPRT_A = _math.floor(_math.log(0.95 / 0.05) * 1e6)  # accept H1 at +A
_SPRT_B = -_SPRT_A  # accept H0 at -A (symmetric alpha=beta)


@register(
    "sprt_conversion_monitor",
    f"""
    WITH ev AS (
      SELECT user_id, event_type, value, CAST(ts AS DATE) AS day
      FROM events
    ),
    u AS (SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id),
    p AS (
      SELECT user_id, 1 AS conv
      FROM ev WHERE event_type = 'purchase' AND value >= {KM_VALUE_FLOOR}
      GROUP BY user_id
    ),
    w AS (
      SELECT u.user_id, u.fd,
             CASE WHEN p.conv IS NULL THEN CAST({_SPRT_C0} AS BIGINT)
                  ELSE CAST({_SPRT_C1} AS BIGINT) END AS inc,
             CASE WHEN p.conv IS NULL THEN 0 ELSE 1 END AS conv
      FROM u LEFT JOIN p ON p.user_id = u.user_id
    ),
    walk AS (
      SELECT user_id, fd, conv,
             CAST(SUM(inc) OVER (ORDER BY fd, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS llr,
             CAST(row_number() OVER (ORDER BY fd, user_id) AS BIGINT)
               AS pos
      FROM w
    ),
    cr AS (
      SELECT MIN(CASE WHEN llr >= {_SPRT_A} THEN pos END) AS p1,
             MIN(CASE WHEN llr <= {_SPRT_B} THEN pos END) AS p0
      FROM walk
    ),
    fin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS BIGINT) AS n_converters,
             CAST(MAX(CASE WHEN pos = (SELECT MAX(pos) FROM walk)
                           THEN llr END) AS BIGINT) AS llr_final_q
      FROM walk
    )
    SELECT fin.n_users, fin.n_converters, fin.llr_final_q,
           CASE WHEN cr.p0 IS NOT NULL
                     AND (cr.p1 IS NULL OR cr.p0 <= cr.p1) THEN 'h0'
                WHEN cr.p1 IS NOT NULL THEN 'h1'
                ELSE 'none' END AS decision,
           CAST(COALESCE(least(COALESCE(cr.p0, cr.p1),
                               COALESCE(cr.p1, cr.p0)), -1) AS BIGINT)
             AS cross_position
    FROM fin CROSS JOIN cr
    """,
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SEQUENTIAL PROBABILITY-RATIO TEST on the conversion rate —
    the early-stopping monitor the fixed-horizon tests (chi-square,
    log-rank) can't provide (Wald 1945): users enter the walk in
    ARRIVAL order (first-event day, id tiebreak), each adds an exact
    micro-nat log-likelihood increment for H1 p≥{SPRT_P1} vs H0
    p≤{SPRT_P0} (converter = first value-≥{KM_VALUE_FLOOR} purchase,
    the KM clock), and the walk reports the FIRST boundary crossing
    (±ln 19 at α=β=0.05) — position, decision, and the final LLR. All
    increments/boundaries are Python-precomputed BIGINT constants (the
    RBO-weights pattern: no engine ln); the walk, the crossing argmins,
    and the decision rule are pure integer/rank logic. On the fixtures
    the ~21% empirical rate drifts the walk to the H0 boundary at
    sf0.01 (decision 'h0', crossing mid-walk) while sf0.001's 15 users
    end undecided ('none') — both branches exercised across the gates.

    Scale: the oracle's user-grain global window is a funnel; the
    Spark plan banders the walk by ARRIVAL DAY (the cusum pattern):
    per-day increment totals collect to calendar-bounded driver state,
    offsets broadcast back, and the running sums partition by day.
    The crossing search is two conditional MIN aggregates — no sort."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    u = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    conv = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= KM_VALUE_FLOOR)
        )
        .select("user_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    w = u.join(conv, "user_id", "left").select(
        "user_id", "fd", F.coalesce("conv", F.lit(0)).alias("conv")
    )
    return _sprt_from_user_flags(w.sparkSession, w)


def _sprt_from_user_flags(spark: SparkSession, flags: DataFrame) -> DataFrame:
    """SPRT walk + crossing decision over a per-user (user_id, fd
    first-event day, conv 0/1) frame — shared by the batch monitor
    (sprt_conversion_monitor) and the KM-store-served reader
    (stream_queries.stream_sprt), the same one-epilogue split as
    _logrank_from_user_times."""
    w = flags.select(
        "user_id",
        "fd",
        "conv",
        F.when(F.col("conv") == 0, F.lit(_SPRT_C0))
        .otherwise(F.lit(_SPRT_C1))
        .cast("bigint")
        .alias("inc"),
    )
    # Banded distributed prefix sum over arrival days (cusum pattern).
    cells = (
        w.groupBy("fd")
        .agg(F.sum("inc").alias("ds"), F.count("*").alias("dn"))
        .collect()
    )
    off_rows, acc_s, acc_n = [], 0, 0
    for r in sorted(cells, key=lambda r: r["fd"]):
        off_rows.append((r["fd"], acc_s, acc_n))
        acc_s += r["ds"]
        acc_n += r["dn"]
    offs = spark.createDataFrame(
        off_rows, "fd date, off_s long, off_n long"
    )
    wcum = (
        W.partitionBy("fd")
        .orderBy(F.col("user_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    walk = w.join(F.broadcast(offs), "fd").select(
        "conv",
        (F.col("off_s") + F.sum("inc").over(wcum)).cast("bigint").alias("llr"),
        (F.col("off_n") + F.count("*").over(wcum)).cast("bigint").alias("pos"),
    )
    agg = walk.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_converters"),
        F.max_by("llr", "pos").cast("bigint").alias("llr_final_q"),
        F.min(F.when(F.col("llr") >= _SPRT_A, F.col("pos"))).alias("p1"),
        F.min(F.when(F.col("llr") <= _SPRT_B, F.col("pos"))).alias("p0"),
    )
    return agg.select(
        "n_users",
        "n_converters",
        "llr_final_q",
        F.when(
            F.col("p0").isNotNull()
            & (F.col("p1").isNull() | (F.col("p0") <= F.col("p1"))),
            F.lit("h0"),
        )
        .when(F.col("p1").isNotNull(), F.lit("h1"))
        .otherwise(F.lit("none"))
        .alias("decision"),
        F.coalesce(
            F.least(
                F.coalesce("p0", "p1"), F.coalesce("p1", "p0")
            ),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("cross_position"),
    )


# --- Mann–Whitney U: nonparametric split-quality comparison ----------------
#
# Value-range band width for the distributed rank walk: quality values
# are ppm-quantized into [-3e6, ~3.1e6], so div-banding by 1e5 yields a
# CALENDAR-CLASS bounded cell count (~65) however large the corpus —
# the cusum/sprt banding pattern applied to the value axis instead of
# the time axis.
MWU_BAND = 100_000

_MWU_VAR = (
    "((CAST(n_train AS DOUBLE)*n_val/12.0) * ((n_train+n_val+1)"
    " - CAST(tie_term AS DOUBLE)/((n_train+n_val)*(n_train+n_val-1.0))))"
)


def _quality_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-quality-value counts per split — (v ppm-quantized
    quality, n1v train count, n2v val count), the shared front half of
    mann_whitney_quality_ab and winsorized_quality_ab (and the frame
    the value-count store resolves to)."""
    return _quality_split_counts_of(table(spark, sf_dir, "documents"))


def _quality_split_counts_of(d: DataFrame) -> DataFrame:
    """_quality_split_counts over ANY (doc_id, text) frame — the
    streaming value-count store ingests each micro-batch with the
    identical plan (per-doc scoring is batch-local == corpus-global,
    and the counts are pure addition across batches)."""
    from ..functions.scalar import hex_hash64
    from .text import SPLIT_BUCKETS, SPLIT_TRAIN_LT, SPLIT_VAL_LT, _quality_of

    qs = (
        _quality_of(d)
        .select(
            F.floor(F.col("quality_score") * 1000000.0)
            .cast("bigint")
            .alias("v"),
            (hex_hash64(F.col("doc_id"), salt="sp|") % SPLIT_BUCKETS).alias(
                "b"
            ),
        )
        .filter(F.col("b") < SPLIT_VAL_LT)
    )
    return (
        qs.select(
            "v",
            F.when(F.col("b") < SPLIT_TRAIN_LT, 1).otherwise(0).alias("g"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1v"),
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n2v"),
        )
    )


def _split_count_walk(spark: SparkSession, per: DataFrame) -> DataFrame:
    """Value-range-banded EXCLUSIVE cumulative counts over the
    distinct-value frame: (v, n1v, n2v, c1, c2) where c_g counts
    strictly-smaller values per split. The MWU_BAND cells (bounded by
    the score range, not the data) collect to the driver; offsets
    broadcast back; windows partition per band — the cusum banding
    pattern on the value axis."""
    banded = per.withColumn("vb", F.expr(f"v div {MWU_BAND}"))
    cells = (
        banded.groupBy("vb")
        .agg(F.sum("n1v").alias("c1"), F.sum("n2v").alias("c2"))
        .collect()
    )
    off_rows, a1, a2 = [], 0, 0
    for r in sorted(cells, key=lambda r: r["vb"]):
        off_rows.append((r["vb"], a1, a2))
        a1 += r["c1"]
        a2 += r["c2"]
    offs = spark.createDataFrame(off_rows, "vb long, off1 long, off2 long")
    w2 = (
        W.partitionBy("vb")
        .orderBy(F.col("v").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return banded.join(F.broadcast(offs), "vb").select(
        "v",
        "n1v",
        "n2v",
        (F.col("off1") + F.coalesce(F.sum("n1v").over(w2), F.lit(0)))
        .cast("bigint")
        .alias("c1"),
        (F.col("off2") + F.coalesce(F.sum("n2v").over(w2), F.lit(0)))
        .cast("bigint")
        .alias("c2"),
    )


def _mwu_from_counts(spark: SparkSession, per: DataFrame) -> DataFrame:
    """Mann-Whitney U epilogue over the distinct-value count frame —
    shared by the batch query and the value-count store reader."""
    wd = _split_count_walk(spark, per)
    agg = wd.agg(
        F.sum("n1v").cast("bigint").alias("n_train"),
        F.sum("n2v").cast("bigint").alias("n_val"),
        F.sum(F.expr("2*n1v*c2 + n1v*n2v")).cast("bigint").alias("u_x2"),
        F.sum(F.expr("(n1v+n2v)*(n1v+n2v)*(n1v+n2v) - (n1v+n2v)"))
        .cast("bigint")
        .alias("tie_term"),
    )
    return agg.select(
        "n_train",
        "n_val",
        "u_x2",
        "tie_term",
        F.expr(
            f"CAST(CASE WHEN n_train = 0 OR n_val = 0 THEN 0"
            f" WHEN {_MWU_VAR} <= 0.0 THEN 0"
            f" ELSE floor((u_x2 - n_train*n_val) / (2.0*sqrt({_MWU_VAR}))"
            f" * 1000000.0) END AS BIGINT)"
        ).alias("z_q"),
    )


def _register_mann_whitney() -> None:
    from .text import SPLIT_BUCKETS, SPLIT_TRAIN_LT, SPLIT_VAL_LT

    @register(
        "mann_whitney_quality_ab",
        rf"""
    WITH q AS (
      SELECT CAST(floor((
               (CAST(length(regexp_extract_all(lower(text),
                     '\b(the|and|of|to|a|in|is)\b')) AS DOUBLE) /
                greatest(length(regexp_extract_all(text, '\S+')), 1)) * 2.0
               - (CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                  / length(text)) * 3.0
               + (CASE WHEN greatest(length(regexp_extract_all(text, '\S+')), 1)
                       BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
             ) * 1000000) AS BIGINT) AS v,
             CAST(concat('0x', substr(md5(concat('sp|', doc_id)), 1, 15))
                  AS BIGINT) % {SPLIT_BUCKETS} AS b
      FROM documents
    ),
    grp AS (
      SELECT v, CASE WHEN b < {SPLIT_TRAIN_LT} THEN 1 ELSE 0 END AS g
      FROM q WHERE b < {SPLIT_VAL_LT}
    ),
    per AS (
      SELECT v,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2v
      FROM grp GROUP BY v
    ),
    wd AS (
      SELECT n1v, n2v,
             CAST(COALESCE(SUM(n2v) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c2
      FROM per
    ),
    agg AS (
      SELECT CAST(SUM(n1v) AS BIGINT) AS n_train,
             CAST(SUM(n2v) AS BIGINT) AS n_val,
             CAST(SUM(2*n1v*c2 + n1v*n2v) AS BIGINT) AS u_x2,
             CAST(SUM((n1v+n2v)*(n1v+n2v)*(n1v+n2v) - (n1v+n2v)) AS BIGINT)
               AS tie_term
      FROM wd
    )
    SELECT n_train, n_val, u_x2, tie_term,
           CAST(CASE WHEN n_train = 0 OR n_val = 0 THEN 0
                WHEN {_MWU_VAR} <= 0.0 THEN 0
                ELSE floor((u_x2 - n_train*n_val) / (2.0*sqrt({_MWU_VAR}))
                     * 1000000.0)
                END AS BIGINT) AS z_q
    FROM agg
    """,
    )
    def mann_whitney_quality_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MANN–WHITNEY U between the train and val splits' quality
        scores — the nonparametric location test next to
        ks_two_sample (distribution shape) and logrank_conversion_ab
        (censored time-to-event): does the hash-ring val split carry
        the same quality distribution as train (it must, by
        construction — this is the split-health audit that would
        expose a selection-biased split)? U is computed at
        DISTINCT-VALUE grain — U₁ = Σ_v n₁(v)·cum₂(<v) + ½·n₁(v)·n₂(v)
        (reported doubled, u_x2, to stay integer) — with the
        tie-corrected normal approximation z = (U₁ − n₁n₂/2)/σ,
        σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1))). Quality values are
        the established ppm-quantized score (curriculum ql), the split
        is dataset_split_assign's md5 ring, and z is ppm-floored; the
        double arithmetic is a fixed parenthesized expression of exact
        integers — sqrt/divide/multiply are correctly rounded, so both
        engines produce the identical double (the no-raw-ln rule).
        EXPLICIT OPERATING BOUND (r18, ADVICE): the tie cube Σt³ is
        summed in BIGINT, so no single exact score value may be shared
        by more than ~2.1M documents (2^63 ^(1/3) ≈ 2,097,152) — the
        score DOES have exact atoms (e.g. 0, or 1000000 for whole
        no-stopword/no-punct document classes), and past the bound
        Spark wraps silently while DuckDB raises, so the engines
        diverge rather than agree. A corpus that concentrates one atom
        past ~2.1M docs needs the tie cube computed in DOUBLE in both
        engines (it only feeds the double variance); the BIGINT form
        is kept here because the fixtures and the oracle contract are
        exact-integer and far below the bound.

        Scale: one map-only score+hash pass, one distinct-value-grain
        aggregate (map-side combine), and the rank walk banded by
        VALUE RANGE (MWU_BAND): the band cells (≤ ~65, bounded by the
        score range, not the data) collect to the driver, offsets
        broadcast back, and the cumulative-count windows partition per
        band — no global sort, no one-task funnel, however large the
        corpus."""
        return _mwu_from_counts(spark, _quality_split_counts(spark, sf_dir))


_register_mann_whitney()


# --- CUPED: variance-reduced A/B readout -----------------------------------
#
# All second-moment terms are computed as doubles FROM exact integer
# sums (cast-before-multiply): the bigint sums themselves stay exact,
# and every subsequent double op (multiply/divide/subtract) is
# correctly rounded, so both engines produce identical doubles — the
# same discipline as the MWU z and the logrank chi-square. Products of
# raw bigint sums are never formed (n·Σxy overflows int64 first).
_CUPED_COV = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n)"
_CUPED_VARX = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n)"
_CUPED_VARY = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)"
_CUPED_THETA = (
    f"(CASE WHEN {_CUPED_VARX} <= 0.0 THEN 0.0"
    f" ELSE {_CUPED_COV} / {_CUPED_VARX} END)"
)
_CUPED_RHO2_PPM = (
    f"(CASE WHEN {_CUPED_VARX} <= 0.0 OR {_CUPED_VARY} <= 0.0 THEN 0"
    f" ELSE floor({_CUPED_COV} * {_CUPED_COV}"
    f" / ({_CUPED_VARX} * {_CUPED_VARY}) * 1000000.0) END)"
)


def _cuped_user_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, grp, x = pre-period cents, y = post-period cents) —
    the per-user period-spend frame under the calendar-midpoint split
    and id-parity arms, shared by cuped_adjusted_ab /
    diff_in_differences / permutation_test_ab (one user-grain
    shuffle, three experiment readouts)."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") >= 0)
        .select(
            "user_id",
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.floor(F.col("value") * 100).cast("bigint").alias("v_c"),
            F.to_date("ts").alias("day"),
        )
    )
    span = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    pre = F.datediff(F.col("day"), F.col("d0")) * 2 <= F.datediff(
        F.col("d1"), F.col("d0")
    )
    return (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id", "grp")
        .agg(
            F.coalesce(F.sum(F.when(pre, F.col("v_c"))), F.lit(0))
            .cast("bigint")
            .alias("x"),
            F.coalesce(F.sum(F.when(~pre, F.col("v_c"))), F.lit(0))
            .cast("bigint")
            .alias("y"),
        )
    )



@register(
    "cuped_adjusted_ab",
    f"""
    WITH ev AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
             CAST(floor(value * 100) AS BIGINT) AS v_c,
             CAST(ts AS DATE) AS day
      FROM events WHERE value >= 0
    ),
    span AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
    ),
    ux AS (
      SELECT e.user_id, e.grp,
             CAST(COALESCE(SUM(CASE WHEN datediff('day', s.d0, e.day) * 2
                    <= datediff('day', s.d0, s.d1) THEN e.v_c END), 0)
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN datediff('day', s.d0, e.day) * 2
                    > datediff('day', s.d0, s.d1) THEN e.v_c END), 0)
                  AS BIGINT) AS y
      FROM ev e CROSS JOIN span s
      GROUP BY e.user_id, e.grp
    ),
    pool AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy
      FROM ux
    ),
    arms AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS gx, CAST(SUM(y) AS BIGINT) AS gy
      FROM ux GROUP BY grp
    )
    SELECT a.grp, a.n_users,
           CAST(floor(CAST(a.gy AS DOUBLE)/a.n_users * 1000000.0) AS BIGINT)
             AS mean_y_q,
           CAST(floor(CAST(a.gx AS DOUBLE)/a.n_users * 1000000.0) AS BIGINT)
             AS mean_x_q,
           CAST(floor((CAST(a.gy AS DOUBLE)/a.n_users
                - {_CUPED_THETA} * (CAST(a.gx AS DOUBLE)/a.n_users
                                    - CAST(sx AS DOUBLE)/n))
                * 1000000.0) AS BIGINT) AS adj_mean_y_q,
           CAST(floor({_CUPED_THETA} * 1000000.0) AS BIGINT) AS theta_q,
           CAST({_CUPED_RHO2_PPM} AS BIGINT) AS var_reduction_ppm
    FROM arms a CROSS JOIN pool
    """,
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-ADJUSTED A/B readout — the variance-reduction standard of
    production experimentation (Deng, Xu, Kohavi & Walker 2013) next
    to the significance tests (log-rank, SPRT, chi-square): split the
    observation calendar at its midpoint, use each user's PRE-period
    spend as the covariate X for their POST-period spend Y, estimate
    θ = cov(X,Y)/var(X) POOLED across arms (id-parity assignment, the
    logrank convention), and report each arm's adjusted mean
    Ȳ_g − θ·(X̄_g − X̄) plus the achieved variance-reduction factor
    ρ² = cov²/(var X · var Y) in ppm. Values are per-event
    cents-quantized before any sum; every moment is an exact BIGINT
    sum; θ/ρ²/means form from those sums via correctly-rounded double
    divide/multiply in one fixed expression order (no pow, no ln) and
    are micro-floored. Σx², Σxy fit int64 while per-user period spend
    stays under ~$30M — event-scale cents, not an at-scale hazard.

    Scale: one map-only pass (parity arm, day bucket vs a
    broadcast-scalar calendar span), ONE user-grain shuffle with
    map-side combine, then two tiny aggregates (5 global sums, one
    row per arm) — the whole statistic rides the aggregate tree; no
    window, no sort, no per-row Python."""
    ux = _cuped_user_xy(spark, sf_dir)
    pool = ux.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x*y")).cast("bigint").alias("sxy"),
        F.sum(F.expr("x*x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y*y")).cast("bigint").alias("syy"),
    )
    arms = ux.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("gx"),
        F.sum("y").cast("bigint").alias("gy"),
    )
    return arms.crossJoin(F.broadcast(pool)).select(
        "grp",
        "n_users",
        F.expr(
            "CAST(floor(CAST(gy AS DOUBLE)/n_users * 1000000.0) AS BIGINT)"
        ).alias("mean_y_q"),
        F.expr(
            "CAST(floor(CAST(gx AS DOUBLE)/n_users * 1000000.0) AS BIGINT)"
        ).alias("mean_x_q"),
        F.expr(
            f"CAST(floor((CAST(gy AS DOUBLE)/n_users"
            f" - {_CUPED_THETA} * (CAST(gx AS DOUBLE)/n_users"
            f" - CAST(sx AS DOUBLE)/n)) * 1000000.0) AS BIGINT)"
        ).alias("adj_mean_y_q"),
        F.expr(
            f"CAST(floor({_CUPED_THETA} * 1000000.0) AS BIGINT)"
        ).alias("theta_q"),
        F.expr(f"CAST({_CUPED_RHO2_PPM} AS BIGINT)").alias(
            "var_reduction_ppm"
        ),
    )


# Shared oracle CTE: the per-user (grp, pre x, post y) frame (the SQL
# twin of _cuped_user_xy), reused by diff-in-differences and the
# permutation test exactly as the Spark side shares one builder.
_UX_CTE = """ev AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
             CAST(floor(value * 100) AS BIGINT) AS v_c,
             CAST(ts AS DATE) AS day
      FROM events WHERE value >= 0
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
    ux AS (
      SELECT e.user_id, e.grp,
             CAST(COALESCE(SUM(CASE WHEN datediff('day', s.d0, e.day) * 2
                    <= datediff('day', s.d0, s.d1) THEN e.v_c END), 0)
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN datediff('day', s.d0, e.day) * 2
                    > datediff('day', s.d0, s.d1) THEN e.v_c END), 0)
                  AS BIGINT) AS y
      FROM ev e CROSS JOIN span s
      GROUP BY e.user_id, e.grp
    )"""


@register(
    "srm_check",
    """
    WITH u AS (
      SELECT DISTINCT user_id, CAST(user_id % 2 AS INT) AS grp
      FROM events
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM u
    )
    SELECT n0, n1,
           CAST(CASE WHEN n0 + n1 = 0 THEN 0
                ELSE floor((CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                     * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                     / (CAST(n0 + n1 AS DOUBLE)/2.0) * 2.0 * 1000.0)
                END AS BIGINT) AS chi2_milli,
           CAST(CASE WHEN n0 + n1 = 0 THEN 0
                ELSE CASE WHEN floor((CAST(n0 AS DOUBLE)
                     - CAST(n0 + n1 AS DOUBLE)/2.0)
                     * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)
                     / (CAST(n0 + n1 AS DOUBLE)/2.0) * 2.0 * 1000.0) > 3841
                     THEN 1 ELSE 0 END
                END AS BIGINT) AS srm_flag
    FROM c
    """,
)
def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guardrail — the first check every
    experiment readout must pass (Kohavi et al.'s trustworthy-A/B
    canon: a biased assignment invalidates every downstream statistic
    before any metric is read): χ² of the observed arm counts against
    the designed 50/50 under the id-parity assignment, flagged at the
    α=0.05 critical value 3.841. Both (n₀−E)²/E terms are equal under
    a two-arm split, so χ² = 2·(n₀−E)²/E — one fixed double
    expression over two exact BIGINT counts, milli-floored; the flag
    compares the QUANTIZED statistic to the quantized critical value
    (integer compare, no float threshold).

    Scale: one distinct-user aggregate (map-side partial) to two
    numbers — the cheapest query in the registry, by design: it runs
    before anything else in an experiment pipeline."""
    u = (
        table(spark, sf_dir, "events")
        .select("user_id", (F.col("user_id") % 2).cast("int").alias("grp"))
        .distinct()
    )
    return _srm_from_users(u)


def _srm_from_users(u: DataFrame) -> DataFrame:
    """SRM epilogue over a distinct (user_id, grp) frame — shared by
    the batch guardrail and the KM-store reader (stream_srm)."""
    c = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    chi = (
        "floor((CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)"
        " * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE)/2.0)"
        " / (CAST(n0 + n1 AS DOUBLE)/2.0) * 2.0 * 1000.0)"
    )
    return c.select(
        "n0",
        "n1",
        F.expr(
            f"CAST(CASE WHEN n0 + n1 = 0 THEN 0 ELSE {chi} END AS BIGINT)"
        ).alias("chi2_milli"),
        F.expr(
            f"CAST(CASE WHEN n0 + n1 = 0 THEN 0"
            f" ELSE CASE WHEN {chi} > 3841 THEN 1 ELSE 0 END END AS BIGINT)"
        ).alias("srm_flag"),
    )


_WELCH_S2 = {
    g: (
        f"((CAST(syy{g} AS DOUBLE) - CAST(sy{g} AS DOUBLE)"
        f"*CAST(sy{g} AS DOUBLE)/n{g}) / (n{g} - 1.0))"
    )
    for g in (0, 1)
}
_WELCH_SE2 = f"({_WELCH_S2[1]}/n1 + {_WELCH_S2[0]}/n0)"


@register(
    "welch_t_ab",
    f"""
    WITH {_UX_CTE},
    a AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
             CAST(SUM(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
             CAST(SUM(CASE WHEN grp = 0 THEN y*y ELSE 0 END) AS BIGINT) AS syy0,
             CAST(SUM(CASE WHEN grp = 1 THEN y*y ELSE 0 END) AS BIGINT) AS syy1
      FROM ux
    )
    SELECT n0, n1,
           CAST(floor(CAST(sy1 AS DOUBLE)/n1 * 1000.0) AS BIGINT)
             AS mean1_milli,
           CAST(floor(CAST(sy0 AS DOUBLE)/n0 * 1000.0) AS BIGINT)
             AS mean0_milli,
           CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0
                ELSE floor((CAST(sy1 AS DOUBLE)/n1 - CAST(sy0 AS DOUBLE)/n0)
                     / sqrt({_WELCH_SE2}) * 1000.0)
                END AS BIGINT) AS t_milli,
           CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0
                ELSE floor({_WELCH_SE2} * {_WELCH_SE2}
                     / (({_WELCH_S2[1]}/n1) * ({_WELCH_S2[1]}/n1) / (n1 - 1.0)
                        + ({_WELCH_S2[0]}/n0) * ({_WELCH_S2[0]}/n0) / (n0 - 1.0))
                     * 1000.0)
                END AS BIGINT) AS df_milli
    FROM a
    """,
)
def welch_t_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S T-TEST on post-period user spend between the id-parity
    arms — the workhorse unequal-variance A/B readout (Welch 1947)
    completing the experiment family's readouts (CUPED adjusts it,
    SRM guards it, SPRT/log-rank sequence it): per-arm means and
    sample variances from exact BIGINT moments
    (cast-before-multiply), the t statistic, and the
    Welch–Satterthwaite effective degrees of freedom — all formed via
    correctly-rounded double divide/multiply/sqrt in one fixed
    expression order, milli-floored (no ln, no pow).

    Scale: the shared _cuped_user_xy user-grain shuffle + one
    six-sum aggregate (map-side combined) to a single row — the
    statistic rides the aggregate tree."""
    return _welch_from_ux(_cuped_user_xy(spark, sf_dir))


def _welch_from_ux(ux: DataFrame) -> DataFrame:
    """Welch-t epilogue over a (grp, y) frame — shared by the batch
    readout and the spend-store reader (stream_welch_t)."""
    a = ux.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy0"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy1"),
        F.sum(F.when(F.col("grp") == 0, F.expr("y*y")).otherwise(0))
        .cast("bigint")
        .alias("syy0"),
        F.sum(F.when(F.col("grp") == 1, F.expr("y*y")).otherwise(0))
        .cast("bigint")
        .alias("syy1"),
    )
    return a.select(
        "n0",
        "n1",
        F.expr(
            "CAST(floor(CAST(sy1 AS DOUBLE)/n1 * 1000.0) AS BIGINT)"
        ).alias("mean1_milli"),
        F.expr(
            "CAST(floor(CAST(sy0 AS DOUBLE)/n0 * 1000.0) AS BIGINT)"
        ).alias("mean0_milli"),
        F.expr(
            f"CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0"
            f" ELSE floor((CAST(sy1 AS DOUBLE)/n1 - CAST(sy0 AS DOUBLE)/n0)"
            f" / sqrt({_WELCH_SE2}) * 1000.0) END AS BIGINT)"
        ).alias("t_milli"),
        F.expr(
            f"CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0"
            f" ELSE floor({_WELCH_SE2} * {_WELCH_SE2}"
            f" / (({_WELCH_S2[1]}/n1) * ({_WELCH_S2[1]}/n1) / (n1 - 1.0)"
            f" + ({_WELCH_S2[0]}/n0) * ({_WELCH_S2[0]}/n0) / (n0 - 1.0))"
            f" * 1000.0) END AS BIGINT)"
        ).alias("df_milli"),
    )


@register(
    "diff_in_differences",
    f"""
    WITH {_UX_CTE},
    a AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
      FROM ux GROUP BY grp
    ),
    d AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS has1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS has0,
             SUM(CASE WHEN grp = 1
                 THEN CAST(sy AS DOUBLE)/n_users - CAST(sx AS DOUBLE)/n_users
                 ELSE 0.0 END)
             - SUM(CASE WHEN grp = 0
                 THEN CAST(sy AS DOUBLE)/n_users - CAST(sx AS DOUBLE)/n_users
                 ELSE 0.0 END) AS did
      FROM a
    )
    SELECT a.grp, a.n_users,
           CAST(floor(CAST(a.sx AS DOUBLE)/a.n_users * 1000.0) AS BIGINT)
             AS pre_mean_milli,
           CAST(floor(CAST(a.sy AS DOUBLE)/a.n_users * 1000.0) AS BIGINT)
             AS post_mean_milli,
           CAST(floor((CAST(a.sy AS DOUBLE)/a.n_users
                       - CAST(a.sx AS DOUBLE)/a.n_users) * 1000.0) AS BIGINT)
             AS delta_milli,
           CAST(CASE WHEN d.has1 = 0 OR d.has0 = 0 THEN 0
                ELSE floor(d.did * 1000.0) END AS BIGINT) AS did_milli
    FROM a CROSS JOIN d
    """,
)
def diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES readout — the quasi-experimental
    estimator (Card & Krueger 1994 canon) over the same
    calendar-midpoint pre/post frame CUPED uses: each arm's
    (post − pre) per-user mean delta, and the treatment effect
    estimate DiD = Δ₁ − Δ₀ that differences away any shared time
    trend. Complements CUPED (which needs randomized arms) when the
    arms are observational. Same exact-BIGINT-sums-then-
    correctly-rounded-doubles discipline, milli-floored.

    Scale: the shared _cuped_user_xy user-grain shuffle + one
    arm-grain aggregate (2 rows) and a broadcast-scalar DiD join —
    nothing wider than two rows after the shared shuffle."""
    return _did_from_ux(_cuped_user_xy(spark, sf_dir))


def _did_from_ux(ux: DataFrame) -> DataFrame:
    """Diff-in-differences epilogue over a (grp, x, y) frame — shared
    by the batch readout and the spend-store reader (stream_did)."""
    a = ux.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    delta = "CAST(sy AS DOUBLE)/n_users - CAST(sx AS DOUBLE)/n_users"
    d = a.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("has1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("has0"),
        (
            F.sum(F.when(F.col("grp") == 1, F.expr(delta)).otherwise(0.0))
            - F.sum(F.when(F.col("grp") == 0, F.expr(delta)).otherwise(0.0))
        ).alias("did"),
    )
    return a.crossJoin(F.broadcast(d)).select(
        "grp",
        "n_users",
        F.expr(
            "CAST(floor(CAST(sx AS DOUBLE)/n_users * 1000.0) AS BIGINT)"
        ).alias("pre_mean_milli"),
        F.expr(
            "CAST(floor(CAST(sy AS DOUBLE)/n_users * 1000.0) AS BIGINT)"
        ).alias("post_mean_milli"),
        F.expr(f"CAST(floor(({delta}) * 1000.0) AS BIGINT)").alias(
            "delta_milli"
        ),
        F.expr(
            "CAST(CASE WHEN has1 = 0 OR has0 = 0 THEN 0"
            " ELSE floor(did * 1000.0) END AS BIGINT)"
        ).alias("did_milli"),
    )


PERM_REPS = 64  # pseudo-assignments for the permutation null


@register(
    "permutation_test_ab",
    f"""
    WITH {_UX_CTE},
    obs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(CASE WHEN SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) = 0
                    OR SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) = 0 THEN 0
                  ELSE floor((CAST(SUM(CASE WHEN grp = 1 THEN y ELSE 0 END)
                               AS DOUBLE)
                              / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                            - CAST(SUM(CASE WHEN grp = 0 THEN y ELSE 0 END)
                               AS DOUBLE)
                              / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END))
                        * 1000.0)
                  END AS BIGINT) AS obs_diff_milli
      FROM ux
    ),
    drawn AS (
      SELECT b.b, u.y,
             CAST(concat('0x', substr(md5(concat('pm|', b.b, '|', u.user_id)),
                                      1, 15)) AS BIGINT) % 2 AS pg
      FROM ux u,
           LATERAL (SELECT unnest(generate_series(0, {PERM_REPS - 1})) AS b) b
    ),
    reps AS (
      SELECT b,
             CAST(CASE WHEN SUM(CASE WHEN pg = 1 THEN 1 ELSE 0 END) = 0
                    OR SUM(CASE WHEN pg = 0 THEN 1 ELSE 0 END) = 0 THEN 0
                  ELSE floor((CAST(SUM(CASE WHEN pg = 1 THEN y ELSE 0 END)
                               AS DOUBLE)
                              / SUM(CASE WHEN pg = 1 THEN 1 ELSE 0 END)
                            - CAST(SUM(CASE WHEN pg = 0 THEN y ELSE 0 END)
                               AS DOUBLE)
                              / SUM(CASE WHEN pg = 0 THEN 1 ELSE 0 END))
                        * 1000.0)
                  END AS BIGINT) AS d_milli
      FROM drawn GROUP BY b
    ),
    ext AS (
      SELECT CAST(SUM(CASE WHEN abs(r.d_milli) >= abs(o.obs_diff_milli)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
      FROM reps r CROSS JOIN obs o
    )
    SELECT o.n_users, CAST({PERM_REPS} AS BIGINT) AS n_reps,
           o.obs_diff_milli, e.n_extreme,
           CAST((1 + e.n_extreme) * 1000 // ({PERM_REPS} + 1) AS BIGINT)
             AS p_milli
    FROM obs o CROSS JOIN ext e
    """,
)
def permutation_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC PERMUTATION TEST on the arm mean-spend difference
    — the assumption-free significance readout next to welch_t_ab
    (exact under exchangeability, no normality needed; Fisher 1935
    by way of the hash-seeded at-scale form): {PERM_REPS} pseudo
    re-assignments of users to arms via the 60-bit md5 uniform of
    ('pm|', b, user_id) build the null distribution of the
    post-period mean difference, and p = (1 + #extreme)/(B+1) — the
    bootstrap_quality_ci pattern applied to testing (precomputed-hash
    draws, no engine RNG, reproducible across engines/runs/cluster
    sizes). Differences are milli-floored BEFORE the extremity
    compare (quantize-then-compare, both engines identical).

    Scale: the shared _cuped_user_xy user-grain shuffle, then a
    {PERM_REPS}x map-only explode collapsing under map-side combine
    to 2·{PERM_REPS} partial sums — no shuffle wider than the
    replicate count, the extremity count is over a {PERM_REPS}-row
    frame."""
    ux = _cuped_user_xy(spark, sf_dir)
    mdiff = (
        "CAST(CASE WHEN n1b = 0 OR n0b = 0 THEN 0"
        " ELSE floor((CAST(s1 AS DOUBLE)/n1b - CAST(s0 AS DOUBLE)/n0b)"
        " * 1000.0) END AS BIGINT)"
    )
    obs = ux.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1b"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0b"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0)).alias("s0"),
    ).select("n_users", F.expr(mdiff).alias("obs_diff_milli"))
    from ..functions.scalar import hex_hash64

    drawn = ux.select(
        "user_id",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_REPS - 1))).alias("b"),
    ).select(
        "b",
        "y",
        (
            hex_hash64(
                F.concat(F.lit("pm|"), F.col("b"), F.lit("|"), F.col("user_id"))
            )
            % 2
        ).alias("pg"),
    )
    reps = drawn.groupBy("b").agg(
        F.sum(F.when(F.col("pg") == 1, 1).otherwise(0)).alias("n1b"),
        F.sum(F.when(F.col("pg") == 0, 1).otherwise(0)).alias("n0b"),
        F.sum(F.when(F.col("pg") == 1, F.col("y")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("pg") == 0, F.col("y")).otherwise(0)).alias("s0"),
    ).select("b", F.expr(mdiff).alias("d_milli"))
    ext = reps.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(
                F.abs(F.col("d_milli")) >= F.abs(F.col("obs_diff_milli")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extreme")
    )
    return obs.crossJoin(F.broadcast(ext)).select(
        "n_users",
        F.lit(PERM_REPS).cast("bigint").alias("n_reps"),
        "obs_diff_milli",
        "n_extreme",
        F.expr(
            f"CAST((1 + n_extreme) * 1000 div ({PERM_REPS} + 1) AS BIGINT)"
        ).alias("p_milli"),
    )


def _register_winsorized() -> None:
    from .text import SPLIT_BUCKETS, SPLIT_TRAIN_LT, SPLIT_VAL_LT

    @register(
        "winsorized_quality_ab",
        rf"""
    WITH q AS (
      SELECT CAST(floor((
               (CAST(length(regexp_extract_all(lower(text),
                     '\b(the|and|of|to|a|in|is)\b')) AS DOUBLE) /
                greatest(length(regexp_extract_all(text, '\S+')), 1)) * 2.0
               - (CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                  / length(text)) * 3.0
               + (CASE WHEN greatest(length(regexp_extract_all(text, '\S+')), 1)
                       BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
             ) * 1000000) AS BIGINT) AS v,
             CAST(concat('0x', substr(md5(concat('sp|', doc_id)), 1, 15))
                  AS BIGINT) % {SPLIT_BUCKETS} AS b
      FROM documents
    ),
    grp AS (
      SELECT v, CASE WHEN b < {SPLIT_TRAIN_LT} THEN 1 ELSE 0 END AS g
      FROM q WHERE b < {SPLIT_VAL_LT}
    ),
    per AS (
      SELECT v,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
             CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2v
      FROM grp GROUP BY v
    ),
    wd AS (
      SELECT v, n1v, n2v,
             CAST(SUM(n1v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS ic1,
             CAST(SUM(n2v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS ic2
      FROM per
    ),
    tot AS (
      SELECT CAST(SUM(n1v) AS BIGINT) AS n1, CAST(SUM(n2v) AS BIGINT) AS n2
      FROM per
    ),
    th AS (
      SELECT MIN(CASE WHEN ic1 >= (n1 + 19) // 20 THEN v END) AS lo1,
             MIN(CASE WHEN ic1 >= (19*n1 + 19) // 20 THEN v END) AS hi1,
             MIN(CASE WHEN ic2 >= (n2 + 19) // 20 THEN v END) AS lo2,
             MIN(CASE WHEN ic2 >= (19*n2 + 19) // 20 THEN v END) AS hi2
      FROM wd CROSS JOIN tot
    ),
    s AS (
      SELECT CAST(SUM(least(greatest(v, lo1), hi1) * n1v) AS BIGINT) AS s1,
             CAST(SUM(least(greatest(v, lo2), hi2) * n2v) AS BIGINT) AS s2
      FROM wd CROSS JOIN th
    )
    SELECT 'train' AS split, n1 AS n_docs,
           CAST(lo1 AS BIGINT) AS lo_q, CAST(hi1 AS BIGINT) AS hi_q,
           CAST(CASE WHEN n1 = 0 THEN 0 ELSE s1 // n1 END AS BIGINT)
             AS wins_mean_q
    FROM s CROSS JOIN th CROSS JOIN tot
    UNION ALL
    SELECT 'val', n2, CAST(lo2 AS BIGINT), CAST(hi2 AS BIGINT),
           CAST(CASE WHEN n2 = 0 THEN 0 ELSE s2 // n2 END AS BIGINT)
    FROM s CROSS JOIN th CROSS JOIN tot
    """,
    )
    def winsorized_quality_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
        """WINSORIZED MEAN QUALITY per split — the robust-metric
        standard (Tukey; every experiment platform winsorizes heavy-
        tailed metrics before averaging): per split, the EXACT
        p05/p95 value thresholds (smallest value whose inclusive
        cumulative count reaches ceil(q·n), pure integer), and the
        mean with values clamped into [p05, p95] — the outlier-robust
        companion to mann_whitney_quality_ab over the same
        distinct-value count frame (_quality_split_counts +
        _split_count_walk: one value walk, two statistics). The
        clamped mean uses exact integer floor division (matched to
        DuckDB's // via pmod — quality values go negative).

        Scale: the shared distinct-value aggregate and value-banded
        walk (≤ ~65 cells); thresholds are conditional MIN aggregates
        (no sort, no ntile); the clamped mean is one more sum over
        the distinct-value frame."""
        return _winsorized_from_counts(
            spark, _quality_split_counts(spark, sf_dir)
        )


def _winsorized_from_counts(spark: SparkSession, per: DataFrame) -> DataFrame:
    """Winsorized-mean epilogue over the distinct-value count frame —
    shared by the batch query and the value-count store reader
    (stream_winsorized)."""
    wd = _split_count_walk(spark, per).select(
        "v",
        "n1v",
        "n2v",
        (F.col("c1") + F.col("n1v")).cast("bigint").alias("ic1"),
        (F.col("c2") + F.col("n2v")).cast("bigint").alias("ic2"),
    )
    tot = per.agg(
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum("n2v").cast("bigint").alias("n2"),
    )
    j = wd.crossJoin(F.broadcast(tot))
    th = j.agg(
        F.min(
            F.when(F.col("ic1") >= F.expr("(n1 + 19) div 20"), F.col("v"))
        ).alias("lo1"),
        F.min(
            F.when(
                F.col("ic1") >= F.expr("(19*n1 + 19) div 20"), F.col("v")
            )
        ).alias("hi1"),
        F.min(
            F.when(F.col("ic2") >= F.expr("(n2 + 19) div 20"), F.col("v"))
        ).alias("lo2"),
        F.min(
            F.when(
                F.col("ic2") >= F.expr("(19*n2 + 19) div 20"), F.col("v")
            )
        ).alias("hi2"),
    )
    s = j.crossJoin(F.broadcast(th)).agg(
        F.sum(F.expr("least(greatest(v, lo1), hi1) * n1v"))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.expr("least(greatest(v, lo2), hi2) * n2v"))
        .cast("bigint")
        .alias("s2"),
    )
    one = s.crossJoin(F.broadcast(th)).crossJoin(F.broadcast(tot))
    train = one.select(
        F.lit("train").alias("split"),
        F.col("n1").alias("n_docs"),
        F.col("lo1").cast("bigint").alias("lo_q"),
        F.col("hi1").cast("bigint").alias("hi_q"),
        F.expr(
            "CAST(CASE WHEN n1 = 0 THEN 0"
            " ELSE (s1 - pmod(s1, n1)) div n1 END AS BIGINT)"
        ).alias("wins_mean_q"),
    )
    val = one.select(
        F.lit("val").alias("split"),
        F.col("n2").alias("n_docs"),
        F.col("lo2").cast("bigint").alias("lo_q"),
        F.col("hi2").cast("bigint").alias("hi_q"),
        F.expr(
            "CAST(CASE WHEN n2 = 0 THEN 0"
            " ELSE (s2 - pmod(s2, n2)) div n2 END AS BIGINT)"
        ).alias("wins_mean_q"),
    )
    return train.unionByName(val)


_register_winsorized()


# z(1-0.025) and z(0.8): Python-precomputed literals (the RBO/SPRT
# constant pattern — no engine quantile function), verbatim in both
# engines.
_Z_ALPHA2 = 1.959963984540054
_Z_POWER = 0.8416212335729143
_MDE_EXPR = (
    f"(({_Z_ALPHA2!r} + {_Z_POWER!r}) * sqrt({_WELCH_SE2}))"
)


@register(
    "mde_power_ab",
    f"""
    WITH {_UX_CTE},
    a AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
             CAST(SUM(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
             CAST(SUM(CASE WHEN grp = 0 THEN y*y ELSE 0 END) AS BIGINT) AS syy0,
             CAST(SUM(CASE WHEN grp = 1 THEN y*y ELSE 0 END) AS BIGINT) AS syy1
      FROM ux
    )
    SELECT n0, n1,
           CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0
                ELSE floor(sqrt({_WELCH_SE2}) * 1000.0)
                END AS BIGINT) AS se_milli,
           CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0 THEN 0
                ELSE floor({_MDE_EXPR} * 1000.0)
                END AS BIGINT) AS mde_milli,
           CAST(CASE WHEN n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0
                     OR CAST(sy0 AS DOUBLE)/n0 <= 0.0 THEN 0
                ELSE floor({_MDE_EXPR} / (CAST(sy0 AS DOUBLE)/n0) * 1000000.0)
                END AS BIGINT) AS mde_rel_ppm
    FROM a
    """,
)
def mde_power_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT at α=0.05 / power 0.8 — the
    design-side readout that closes the experiment family (run it
    BEFORE the test: an A/B whose MDE exceeds any plausible effect is
    theater): MDE = (z_{{1−α/2}} + z_{{power}})·SE with the same
    Welch standard error the t-test uses, both z constants
    Python-precomputed literals (no engine quantile function), plus
    the relative MDE against the control mean in ppm. Same exact
    moments, same correctly-rounded double discipline, milli/ppm
    floored.

    Scale: the shared _cuped_user_xy user-grain shuffle + one six-sum
    aggregate — identical plan to welch_t_ab with a different
    epilogue expression."""
    ux = _cuped_user_xy(spark, sf_dir)
    a = ux.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy0"),
        F.sum(F.when(F.col("grp") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy1"),
        F.sum(F.when(F.col("grp") == 0, F.expr("y*y")).otherwise(0))
        .cast("bigint")
        .alias("syy0"),
        F.sum(F.when(F.col("grp") == 1, F.expr("y*y")).otherwise(0))
        .cast("bigint")
        .alias("syy1"),
    )
    guard = f"n0 < 2 OR n1 < 2 OR {_WELCH_SE2} <= 0.0"
    return a.select(
        "n0",
        "n1",
        F.expr(
            f"CAST(CASE WHEN {guard} THEN 0"
            f" ELSE floor(sqrt({_WELCH_SE2}) * 1000.0) END AS BIGINT)"
        ).alias("se_milli"),
        F.expr(
            f"CAST(CASE WHEN {guard} THEN 0"
            f" ELSE floor({_MDE_EXPR} * 1000.0) END AS BIGINT)"
        ).alias("mde_milli"),
        F.expr(
            f"CAST(CASE WHEN {guard} OR CAST(sy0 AS DOUBLE)/n0 <= 0.0 THEN 0"
            f" ELSE floor({_MDE_EXPR} / (CAST(sy0 AS DOUBLE)/n0)"
            f" * 1000000.0) END AS BIGINT)"
        ).alias("mde_rel_ppm"),
    )
