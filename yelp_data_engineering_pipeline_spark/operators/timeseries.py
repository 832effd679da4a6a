"""Time-series gap fill + LOCF resample (hypertable-style operator).

Spark has no native ``time_bucket_gapfill`` (the TimescaleDB/hypertable
continuous-rollup companion op); this is the declarative composition:

    aggregate to (key, bucket) → per-key bucket grid via
    ``sequence`` + ``explode`` → left join observed buckets →
    LOCF via ``last(value, ignorenulls)`` over a KEY-PARTITIONED window

Scale notes (100 TB): every stage is key-partitioned. The grid explode
is bounded by the observation time span (buckets per key =
span / width — independent of input row count), the grid join
co-partitions on (key, bucket), and the LOCF window partitions by key,
so no global sort or single-partition stage exists anywhere. Skewed
keys cost grid-width work, not data-volume work. For multi-year spans
at second granularity, chunk the sequence per (key, day) first — the
same pattern one level down.

Complements plans/analytics.py ``rollup_time_cascade`` (hour→day
monoid cascade); reference parity: the reference has no time-series
gap semantics at all — this is part of the extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load

_HOUR_US = 3_600_000_000


def gapfill_locf(
    agg: DataFrame,
    key: str,
    bucket_col: str,
    locf_cols: Seq[str],
) -> DataFrame:
    """Fill missing buckets of an aggregated (key, bucket) frame.

    ``agg`` must hold one row per (key, bucket). Missing buckets inside
    each key's [min, max] bucket range are generated; ``locf_cols`` get
    last-observation-carried-forward values, all other columns stay
    NULL on generated rows (callers coalesce as needed).
    """
    bounds = agg.groupBy(key).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1")
    )
    grid = bounds.select(
        key, F.explode(F.sequence("_b0", "_b1")).alias(bucket_col)
    )
    filled = grid.join(agg, [key, bucket_col], "left")
    w = Window.partitionBy(key).orderBy(bucket_col)
    for c in locf_cols:
        filled = filled.withColumn(
            f"{c}_locf", F.last(c, ignorenulls=True).over(w)
        )
    return filled


def ts_gapfill_hourly(spark, sf_dir: str) -> DataFrame:
    """Hourly per-event-type resample of ``events`` with gap fill.

    Buckets are epoch-hour ints (tz-free); the carried value is the
    quantized hourly sum (FLOOR(value*100) — integer sums are
    order-exact across engines). The first bucket per key is the key's
    first observation, so LOCF is never NULL.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("bucket_hour"),
        F.floor(F.col("value") * 100).cast("long").alias("q"),
    )
    agg = ev.groupBy("event_type", "bucket_hour").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("q").alias("sum_q")
    )
    filled = gapfill_locf(agg, "event_type", "bucket_hour", ["sum_q"])
    return filled.select(
        "event_type",
        F.col("bucket_hour").cast("bigint").alias("bucket_hour"),
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        F.col("sum_q_locf").cast("bigint").alias("sum_q_locf"),
    )


register(
    "ts_gapfill_locf",
    ts_gapfill_hourly,
    """
    WITH agg AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket_hour,
             COUNT(*) AS cnt,
             SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS sum_q
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, MIN(bucket_hour) AS b0, MAX(bucket_hour) AS b1
      FROM agg GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(generate_series(b0, b1)) AS bucket_hour
      FROM bounds
    )
    SELECT g.event_type,
           CAST(g.bucket_hour AS BIGINT) AS bucket_hour,
           CAST(COALESCE(a.cnt, 0) AS BIGINT) AS cnt,
           CAST(LAST_VALUE(a.sum_q IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.bucket_hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS sum_q_locf
    FROM grid g LEFT JOIN agg a USING (event_type, bucket_hour)
    """,
)


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


def transition_counts(
    events: DataFrame, key: str, order_cols: Seq[str], type_col: str
) -> DataFrame:
    """First-order transition matrix of an event log: for each user the
    per-``key`` event sequence (ordered by ``order_cols``) is paired with
    its successor via ``lead``, then (from, to) pairs are counted and
    given a within-``from`` share.

    Scale: one hash shuffle on ``key`` for the lead window (the same
    partitioning any sessionization needs), then a partial-agg'd count
    to |types|² rows — the share window runs on that tiny grid. The
    share division happens once on identical BIGINT operands in both
    engines (bit-exact)."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    paired = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    per_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(per_from)).alias("share"),
    ).orderBy("from_type", "to_type")


def event_transitions(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return transition_counts(ev, "user_id", ["ts", "event_id"], "event_type")


register(
    "event_transitions",
    event_transitions,
    """
    WITH paired AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    counts AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM paired WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           n / SUM(n) OVER (PARTITION BY from_type) AS share
    FROM counts
    ORDER BY from_type, to_type
    """,
)


# ---------------------------------------------------------------------------
# Per-key exponential moving average (sequential recurrence via Arrow UDF)
# ---------------------------------------------------------------------------


def ema_half(df: DataFrame, key_col: str, order_cols: Seq[str], value_col: str) -> DataFrame:
    """Per-key EMA with alpha = 1/2: y_1 = x_1, y_k = (y_{k-1} + x_k)/2.

    A linear recurrence is the one analytic shape Spark's declarative
    surface cannot express (no recursive window frame), so this is the
    sanctioned Arrow escape hatch: ``applyInPandas`` per key — ONE
    shuffle to co-locate each key, then a linear scan per group inside
    an Arrow batch. That is the theoretical minimum work for a
    recurrence; the alternative (Blelloch segmented scan over the
    associative map y→(y+x)/2) only pays off when single keys span
    executors, and per-key skew here is bounded by events-per-user.

    alpha = 1/2 is not just convention: halving is EXACT in binary
    floating point, so each step rounds once — and fl(x/2 + y/2) ==
    fl(x + y)/2 (rounding commutes with exact power-of-two scaling),
    which makes the Python loop bit-identical to the DuckDB
    left-fold oracle. An arbitrary alpha would add a second rounding
    per step on one engine only.

    Output schema is the input schema plus an ``ema`` DOUBLE column —
    derived from ``df.schema``, so any (key, order, value) column names
    and types work, not just the events-table shape.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    if "ema" in df.columns:
        raise ValueError("input already has an 'ema' column")
    schema = StructType(list(df.schema.fields) + [StructField("ema", DoubleType())])

    def _per_key(pdf):
        import pandas as pd  # noqa: F401 — Arrow batch boundary

        pdf = pdf.sort_values(list(order_cols)).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype="float64")
        out = vals.copy()
        for i in range(1, len(out)):
            out[i] = (out[i - 1] + vals[i]) / 2.0
        pdf["ema"] = out
        return pdf

    return df.groupBy(key_col).applyInPandas(_per_key, schema=schema)


def ts_ema_user(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_id"),
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.col("value"),
    ).filter(F.col("value").isNotNull())
    return ema_half(ev, "user_id", ("ts_us", "event_id"), "value")


register(
    "ts_ema_user",
    ts_ema_user,
    """
    WITH ev AS (
      SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
      FROM events WHERE value IS NOT NULL
    ),
    ordered AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
      FROM ev
    ),
    arr AS (
      SELECT user_id,
             list(value ORDER BY rn) AS vs,
             list(event_id ORDER BY rn) AS ids,
             list(ts_us ORDER BY rn) AS tss
      FROM ordered GROUP BY user_id
    ),
    idx AS (SELECT user_id, vs, ids, tss, UNNEST(range(1, len(vs) + 1)) AS i FROM arr)
    SELECT user_id,
           ids[i] AS event_id,
           tss[i] AS ts_us,
           vs[i] AS value,
           list_reduce(vs[1:i], (a, b) -> (a + b) / 2) AS ema
    FROM idx
    """,
)


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest same-value streak per key
# ---------------------------------------------------------------------------


def longest_streak(
    df: DataFrame, key_col: str, order_cols: Seq[str], value_col: str
) -> DataFrame:
    """Longest run of consecutive equal values per key — the
    gaps-and-islands idiom (rn − rn_per_value difference groups
    consecutive equal rows into islands) that windowed aggregation
    alone cannot express.

    Two windows over the SAME key partitioning (one sort, Spark fuses
    them), one groupBy on (key, value, island), one max per key: every
    stage is key-partitioned, no global sort. Integer output only."""
    w_all = Window.partitionBy(key_col).orderBy(*order_cols)
    w_val = Window.partitionBy(key_col, value_col).orderBy(*order_cols)
    islands = df.select(
        key_col,
        value_col,
        (F.row_number().over(w_all) - F.row_number().over(w_val)).alias("island"),
    )
    runs = islands.groupBy(key_col, value_col, "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    w_rank = Window.partitionBy(key_col).orderBy(
        F.desc("run_len"), F.asc(value_col), F.asc("island")
    )
    return (
        runs.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") == 1)
        .select(
            key_col,
            F.col(value_col).alias("streak_value"),
            F.col("run_len").alias("streak_len"),
        )
        .orderBy(key_col)
    )


def window_longest_streak(spark, sf_dir: str) -> DataFrame:
    """Per user: the longest run of consecutive same-type events in
    time order (ties by event_id) — e.g. 7 errors in a row."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return longest_streak(ev, "user_id", ("ts_us", "event_id"), "event_type")


register(
    "window_longest_streak",
    window_longest_streak,
    """
    WITH ev AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id, event_type
      FROM events
    ),
    islands AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
             AS island
      FROM ev
    ),
    runs AS (
      SELECT user_id, event_type, island, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type AS streak_value, run_len AS streak_len
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY run_len DESC, event_type ASC, island ASC
      ) AS rk
      FROM runs
    ) WHERE rk = 1
    ORDER BY user_id
    """,
)


# ---------------------------------------------------------------------------
# OHLC resampling (open/high/low/close per time bucket)
# ---------------------------------------------------------------------------


def ohlc(
    df: DataFrame, key_col: str, ts_us_col: str, tie_col: str, value_c: Column,
    bucket_us: int,
) -> DataFrame:
    """Open/high/low/close per (key, bucket) — the canonical downsample
    for plotting and feature windows. open/close are min_by/max_by over
    the (ts, tie) order — ONE hash aggregate total, no window, no sort:
    at 100 TB this is a single map-combined groupBy whose shuffle
    carries 4 numbers per (key, bucket). Values ride an integer cents
    grid so min/max/first ties are engine-exact."""
    # fixed-width string order key: lexicographic == numeric for
    # NON-NEGATIVE ts/tie (the "%020d" sign prefix breaks ordering
    # among negatives — identically on both engines, but callers with
    # pre-1970 data should pre-shift ts to a nonnegative grid), and
    # both engines' arg_min/min_by accept VARCHAR keys (DuckDB 1.0 has
    # no struct-keyed arg_min)
    ordkey = F.format_string("%020d%012d", F.col(ts_us_col), F.col(tie_col))
    # exact integer FLOOR division matching the DuckDB oracle's `//`:
    # double division + bigint cast truncates and is float-precision-
    # fragile, and Spark's own `div` ALSO truncates toward zero (wrong
    # for pre-1970 timestamps) — `(a - pmod(a, b)) div b` is exact
    # because the numerator is exactly divisible (the cross-engine trap
    # diag_source_drift documents, ADVICE r5)
    base = df.select(
        F.col(key_col).alias("grp"),
        F.expr(
            f"(`{ts_us_col}` - pmod(`{ts_us_col}`, {bucket_us})) div {bucket_us}"
        ).alias("bucket"),
        ordkey.alias("ord"),
        value_c.alias("vc"),
    )
    return (
        base.groupBy("grp", "bucket")
        .agg(
            F.min_by("vc", "ord").alias("open_c"),
            F.max("vc").alias("high_c"),
            F.min("vc").alias("low_c"),
            F.max_by("vc", "ord").alias("close_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("grp", "bucket")
    )


def ts_ohlc_hourly(spark, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ohlc(
        ev.select(
            "event_type",
            F.expr("unix_micros(ts)").alias("ts_us"),
            "event_id",
            "value",
        ),
        "event_type",
        "ts_us",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint"),
        bucket_us=_HOUR_US,
    )


register(
    "ts_ohlc_hourly",
    ts_ohlc_hourly,
    f"""
    WITH base AS (
      SELECT event_type AS grp,
             CAST(epoch_us(ts) AS BIGINT) // {_HOUR_US} AS bucket,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL
    )
    SELECT grp, bucket,
           arg_min(vc, printf('%020d%012d', ts_us, event_id)) AS open_c,
           MAX(vc) AS high_c,
           MIN(vc) AS low_c,
           arg_max(vc, printf('%020d%012d', ts_us, event_id)) AS close_c,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM base
    GROUP BY grp, bucket
    ORDER BY grp, bucket
    """,
)


# ---------------------------------------------------------------------------
# Rolling z-score anomaly flags (trailing-window outlier detection)
# ---------------------------------------------------------------------------

_Z_PREV = 6  # trailing window size (rows), excluding the current row
_Z_MIN_N = 4  # minimum history before a score is emitted


def rolling_zscore(
    df: DataFrame, key_col: str, order_cols: Seq[str], cents_col: str,
    n_prev: int = _Z_PREV, min_n: int = _Z_MIN_N,
) -> DataFrame:
    """Per-key trailing z-score: each value scored against the mean/std
    of its own previous ``n_prev`` observations (current row EXCLUDED —
    an outlier must not dilute its own baseline).

    Engine-exact by construction: the windowed SUM/COUNT/SUM-of-squares
    run on an integer cents grid (exact on any engine), and mean /
    variance / z are then derived with the SAME double expression tree
    on both sides — never stddev_samp(), whose streaming formulation
    (Welford vs. two-pass) differs between engines in the last ulps.
    One shuffle (by key), three window aggregates over one frame.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-n_prev, -1)
    )
    c = F.col(cents_col)
    stats = df.select(
        *df.columns,
        F.count(c).over(w).alias("_n"),
        F.sum(c).over(w).alias("_s"),
        F.sum(c * c).over(w).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    z = (c.cast("double") - mean) / F.sqrt(var)
    return (
        stats.filter((F.col("_n") >= min_n) & (var > 0))
        .withColumn("z_score", F.round(z, 2))
        .drop("_n", "_s", "_ss")
    )


def ts_anomaly_zscore(spark, sf_dir: str) -> DataFrame:
    """Events whose value is >= 2 trailing standard deviations from the
    user's own recent history (|rounded z| >= 2)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    scored = rolling_zscore(base, "user_id", ("ts_us", "event_id"), "cents")
    return scored.filter(F.abs(F.col("z_score")) >= 2).select(
        "user_id", "event_id", "z_score"
    )


# Same frame + same derived-moments expression tree (no native stddev
# on either side — see rolling_zscore docstring).
register(
    "ts_anomaly_zscore",
    ts_anomaly_zscore,
    f"""
    WITH base AS (
      SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT user_id, event_id, cents,
             COUNT(cents) OVER w AS n,
             SUM(cents) OVER w AS s,
             SUM(cents * cents) OVER w AS ss
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN {_Z_PREV} PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, event_id,
             ROUND((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   / SQRT((CAST(ss AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(n AS DOUBLE) - 1.0)), 2) AS z_score
      FROM stats
      WHERE n >= {_Z_MIN_N}
        AND (CAST(ss AS DOUBLE)
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1.0) > 0
    )
    SELECT user_id, event_id, z_score FROM scored WHERE ABS(z_score) >= 2
    """,
)
