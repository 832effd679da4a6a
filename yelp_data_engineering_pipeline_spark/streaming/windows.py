"""Time-window aggregations (SURVEY.md §2.9 extensions).

These use Spark's ``window()`` / sessionization expressions, which are
the SAME expressions Structured Streaming plans incrementally — the
batch queries here are the correctness oracle surface; the streaming
wiring (readStream → withWatermark → writeStream) lives in
streaming/ingest.py and is exercised by tests/test_streaming.py.

Scale posture: tumbling/sliding windows are hash-aggregates keyed by
(window, key) — partial aggregation happens map-side, so the shuffle
carries one row per window per key per map partition. Sessionization is
a per-key window function — one shuffle keyed by user, no skew at
bounded per-user event counts; for whale users combine with salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalog output carries the window start as EPOCH SECONDS, not a
    # timestamp: a collected timestamp renders in the harness session's
    # timezone (unknown for external harnesses), while unix_micros reads
    # the tz-free internal epoch — hash-stable under ANY session tz.
    return tumbling_agg(load(spark, sf_dir, "events")).select(
        F.expr("unix_micros(win_start) div 1000000").alias("win_start_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


register(
    "stream_tumbling_window",
    stream_tumbling,
    """
    SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start_epoch,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


def sliding_agg(events: DataFrame) -> DataFrame:
    """2-hour windows sliding by 1 hour — every event lands in exactly
    two windows."""
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        # avg as round(sum,2)/n: the rounded sum is an exact grid point
        # in both engines and integer division is IEEE-deterministic —
        # unlike round(avg, d), which can land exactly on a rounding
        # boundary (e.g. n a power of two) and diverge across engines.
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n", "avg_value")
    )


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # epoch-seconds output for tz-independent hashing (see stream_tumbling)
    return sliding_agg(load(spark, sf_dir, "events")).select(
        F.expr("unix_micros(win_start) div 1000000").alias("win_start_epoch"),
        "n",
        "avg_value",
    )


register(
    "stream_sliding_window",
    stream_sliding,
    """
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS win_start, value FROM events
    )
    SELECT CAST(epoch(win_start) AS BIGINT) AS win_start_epoch,
           COUNT(*) AS n, ROUND(SUM(value), 2) / COUNT(*) AS avg_value
    FROM assigned
    GROUP BY win_start
    """,
)


_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


def sessionize(events: DataFrame, gap_us: int = _GAP_US) -> DataFrame:
    """Gap-based sessionization: lag + cumulative sum of gap-breaks.
    Batch analogue of session_window(ts, gap)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    is_new = F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sess = sessionize(ev)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            (F.max("session_id") + 1).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("n_events"),
        )
    )


register(
    "stream_sessionize",
    stream_sessionize,
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
           MAX(n_events) AS max_session_events,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM per_session
    GROUP BY user_id
    """,
)


def sessionize_native(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions via the NATIVE ``session_window`` expression —
    the operator Structured Streaming plans with merging session state
    (vs. :func:`sessionize`'s lag+cumsum batch analogue). Verified to
    share boundary semantics: an event exactly ``gap`` after the
    previous one MERGES (new session only when diff > gap)."""
    return events.groupBy("user_id", F.session_window("ts", gap).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def stream_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_session = sessionize_native(ev)
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


# Same oracle as stream_sessionize (the two formulations must agree) —
# only the n_sessions derivation differs (count of sessions vs max id+1).
register(
    "stream_session_window_native",
    stream_sessionize_native,
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           MAX(n_events) AS max_session_events,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM per_session
    GROUP BY user_id
    """,
)


def approx_distinct_hourly(events: DataFrame) -> DataFrame:
    """Streaming-safe per-hour distinct-user sketch (HLL++ only — exact
    COUNT(DISTINCT) is not supported on streaming DataFrames). HLL
    register merges are order-invariant, so the sketch drained through
    micro-batches is bit-identical to the batch sketch — the parity
    contract tests/test_streaming.py drains end-to-end."""
    return (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("bucket_hour"), "user_id"
        )
        .groupBy("bucket_hour")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )


def window_approx_distinct(events: DataFrame) -> DataFrame:
    """Per-hour distinct users, exact AND sketched. At 100 TB the exact
    per-window COUNT(DISTINCT) is the expensive path (full shuffle of
    (window, user) pairs); HLL++ partial aggregates merge map-side and
    keep the shuffle O(windows × sketch size). Emitted like
    agg_approx_sketches: exact value + a bound boolean both engines can
    hash (sketch VALUES are engine-specific; honoring the error bound
    is the portable contract)."""
    by_hour = events.select(
        F.expr("unix_micros(ts) div 3600000000").alias("bucket_hour"), "user_id"
    ).groupBy("bucket_hour")
    agg = by_hour.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    return agg.select(
        F.col("bucket_hour").cast("bigint").alias("bucket_hour"),
        F.col("exact_users").cast("bigint").alias("exact_users"),
        # rsd=0.02 HLL++ shows small-cardinality bias (a 16-user bucket
        # can miss 5% relative); the honest contract for tiny windows is
        # relative-OR-small-absolute: within 5% or ±2 users.
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(2.0))
        ).alias("within_5pct"),
    )


def stream_window_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return window_approx_distinct(load(spark, sf_dir, "events"))


register(
    "stream_window_approx_distinct",
    stream_window_approx_distinct,
    """
    SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket_hour,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY 1
    """,
)


# --- stream-stream join: view→click attribution ------------------------------
_ATTR_WINDOW_US = 6 * 3600 * 1_000_000  # 6-hour attribution lookback


def attribution_pairs(views: DataFrame, clicks: DataFrame,
                      window_us: int = _ATTR_WINDOW_US) -> DataFrame:
    """Stream-stream inner join core: every (view, click) pair for the
    same user where the click lands within ``window_us`` AFTER the view
    (6 h default: sized so the sparse synthetic stream yields real matches).

    The SAME plan runs batch and streaming: streaming callers watermark
    both inputs first, and the two-sided time bound lets Spark expire
    join state (views older than the window can never match again — the
    canonical watermarked interval join). The bound is expressed
    DIRECTLY on the watermarked timestamp columns (``v_ts <= c_ts AND
    v_ts > c_ts - INTERVAL``) — never through ``unix_micros`` arithmetic,
    which StreamingJoinHelper's state-watermark derivation cannot solve,
    so state would grow unboundedly in a continuous run (ADVICE.md r3).
    Scale: ONE shuffle keyed by user_id on each side; state per key is
    bounded by the window, not the stream length.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return c.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") > F.col("c_ts") - F.expr(f"INTERVAL {window_us} MICROSECOND")),
        "inner",
    )


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: last-touch attribution — each click is credited to
    the LATEST view within the lookback (ties broken by view_id).

    The argmax is a row_number over the per-click candidate set (small:
    views-per-user-per-10min), mirrored token-for-token in the oracle.
    Timestamps leave as epoch micros (tz-free ints).
    """
    ev = load(spark, sf_dir, "events")
    pairs = attribution_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )
    w = Window.partitionBy("click_id").orderBy(
        F.unix_micros("v_ts").desc(), F.col("view_id").desc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "click_id",
            "view_id",
            (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("gap_us"),
        )
    )


register(
    "stream_stream_join",
    stream_stream_join,
    f"""
    WITH pairs AS (
      SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
             epoch_us(c.ts) AS c_us, epoch_us(v.ts) AS v_us
      FROM events c
      JOIN events v
        ON c.user_id = v.user_id
       AND v.event_type = 'view'
       AND epoch_us(v.ts) <= epoch_us(c.ts)
       AND epoch_us(v.ts) >  epoch_us(c.ts) - {_ATTR_WINDOW_US}
      WHERE c.event_type = 'click'
    ),
    ranked AS (
      SELECT user_id, click_id, view_id, c_us - v_us AS gap_us,
             ROW_NUMBER() OVER (PARTITION BY click_id ORDER BY v_us DESC, view_id DESC) AS rn
      FROM pairs
    )
    SELECT user_id, click_id, view_id, gap_us
    FROM ranked WHERE rn = 1
    """,
)


# ---------------------------------------------------------------------------
# Watermark late-data accounting (batch simulation of streaming drop)
# ---------------------------------------------------------------------------

_WM_DELAY_US = 30 * 60 * 1_000_000  # withWatermark("ts", "30 minutes")


def late_data_accounting(
    events: DataFrame, delay_us: int = _WM_DELAY_US, late_filter_lag: int = 1
) -> DataFrame:
    """How many events WOULD a 30-minute watermark drop? — the audit you
    run on historical data before picking a streaming delay.

    Streaming semantics simulated exactly, per source partition:
    Structured Streaming (like Flink) advances a watermark per input
    partition as max(event_time) - delay over ARRIVAL order and drops
    rows older than it. Arrival order here is event_id (the append
    sequence, the same proxy tests/test_streaming.py uses), partitioned
    by user_id — the per-key source-partition analog, which keeps the
    running max a KEY-PARTITIONED window (never the single global sort
    a whole-stream watermark would need in batch; a real stream
    computes it incrementally, with no sort at all).

    ``late_filter_lag`` selects WHICH of Spark's two per-batch
    watermarks to simulate (SPARK-40925 separates them; verified
    empirically in tests/test_streaming.py's differential): the
    EVICTION watermark is max(event time) through the previous
    arrival (lag=1, the default — the number that matches "state
    the stream has finalized", hash-locked by the catalog oracle),
    while the LATE-EVENT FILTER uses the watermark from one batch
    earlier still (lag=2) — rows between the two land in state and
    survive. With one event per micro-batch, lag=2 reproduces a real
    ``withWatermark`` run's drop count row-for-row.

    All arithmetic is integer micros; output is counts per event_type.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -late_filter_lag)
    )
    tagged = events.select(
        "event_type",
        (
            F.expr("unix_micros(ts)")
            < F.max(F.expr("unix_micros(ts)")).over(w) - F.lit(delay_us)
        ).alias("late"),
    )
    return tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("bigint").alias("n_late"),
        F.sum(F.when(F.col("late"), 0).otherwise(1)).cast("bigint").alias("n_ontime"),
    )


def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return late_data_accounting(load(spark, sf_dir, "events"))


register(
    "stream_watermark_late_drop",
    stream_watermark_late_drop,
    f"""
    WITH tagged AS (
      SELECT event_type,
             epoch_us(ts) < MAX(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) - {_WM_DELAY_US} AS late
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime
    FROM tagged
    GROUP BY event_type
    """,
)
