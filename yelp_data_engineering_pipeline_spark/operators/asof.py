"""As-of join and bucketized range join — temporal operators Spark
lacks natively (extensions; the pyspark guide's "as-of / range join"
patterns, re-expressed scalably).

**As-of join** (for each left row, the latest right row with
``right.ts <= left.ts``, per key): implemented with the union+window
formulation rather than per-key ``pd.merge_asof``:

    tag both sides → union → window last(right value, ignorenulls)
    over (key ORDER BY ts, side) → keep left rows

One shuffle (by key), no Python, no per-group materialization — works
for billions of rows per key-partition and AQE handles skewed keys.

**Range join** (pairs within a time distance): naive formulation is a
cross join; the scale-safe pattern buckets both sides by
``floor(ts / width)`` and equi-joins on adjacent buckets, then applies
the exact range filter — shuffle bounded by bucket population, and the
equi-join is hash-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql.types import TimestampType

from ..plans.catalog import register
from ..tables import load


def _as_us(col, dtype):
    """Microsecond scalar for gap arithmetic: timestamps via
    unix_micros, integer time grids pass through as-is."""
    return F.unix_micros(col) if isinstance(dtype, TimestampType) else col.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row: the nearest right row in the same ``by``
    group — ``backward`` (most recent right with right[on] <= left[on],
    the default) or ``forward`` (earliest right with
    right[on] >= left[on]). Left rows with no match keep NULLs.

    ``tolerance_us`` (pandas ``merge_asof`` parity) NULLs the match when
    the nearest row is further than the tolerance — by definition every
    other candidate is further still, so no fallback scan is needed.

    Ties on ``on`` resolve right-before-left in either direction (a
    right row at exactly left.ts matches), mirroring ASOF JOIN
    semantics. Same plan shape regardless of options: one union, one
    key-partitioned window, no Python.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # The match (timestamp + every value column) travels through the
    # window as ONE struct, so the returned values always come from the
    # SAME winning right row. Separate per-column last(ignorenulls)
    # calls would let a NULL-valued nearest row gate the tolerance on
    # its (nearer) timestamp while the value came from an OLDER row —
    # pandas merge_asof returns NaN there (ADVICE r5, asof.py:94).
    payload = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in value_cols]
    )
    payload_type = right.select(payload.alias("_m")).schema["_m"].dataType
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_m"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in (by, on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        payload.alias("_m"),
        *[F.col(c).alias(f"_tb_{c}") for c in value_cols],
    )
    unioned = l.unionByName(r)
    # right rows sort before left rows at equal ts (_side 0 < 1); the
    # forward direction is the same scan over reversed time. The value
    # columns are a DETERMINISTIC tiebreak between right rows sharing a
    # timestamp: without one, "last over the frame" picks whichever
    # duplicate the shuffle happened to order last (pandas resolves the
    # same tie by input order — a notion a distributed engine cannot
    # honor, so max-value-wins is the documented contract; NULLs on
    # left rows sort first and never win). No-op when ts are unique.
    # NULL ORDER IS PART OF THE CONTRACT (ADVICE r6): a NULL-valued
    # duplicate must sort FIRST so the max NON-NULL value wins "last
    # over the frame". Spark's ascending default happens to be NULLS
    # FIRST but DuckDB's is NULLS LAST, so both this side and every
    # as-of oracle spell it explicitly — a silent engine-default
    # divergence here is a latent differential mismatch.
    tiebreak = [F.col(f"_tb_{c}").asc_nulls_first() for c in value_cols]
    order = (
        [F.col(on).desc(), F.col("_side"), *tiebreak]
        if direction == "forward"
        else [on, "_side", *tiebreak]
    )
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        F.last("_m", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    in_tol = F.col("_m").isNotNull()
    if tolerance_us is not None:
        on_us = _as_us(F.col(on), right.schema[on].dataType)
        m_us = _as_us(F.col("_m._on"), right.schema[on].dataType)
        gap = (m_us - on_us) if direction == "forward" else (on_us - m_us)
        in_tol = in_tol & (gap <= F.lit(tolerance_us))
    return out.select(
        *lcols,
        *[F.when(in_tol, F.col(f"_m.{c}")).alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    max_lag_seconds: int,
) -> DataFrame:
    """Pairs (l, r) with same ``by`` key and
    ``left_ts - max_lag <= right_ts <= left_ts``, via bucketed
    equi-join (bucket width = max_lag)."""
    width_us = max_lag_seconds * 1_000_000
    lb = left.withColumn("_bucket", F.floor(F.unix_micros(F.col(left_ts)) / width_us))
    rb = right.withColumn("_rbucket", F.floor(F.unix_micros(F.col(right_ts)) / width_us))
    # each right row can match left rows in its own or the next bucket
    rb = rb.withColumn("_bucket", F.explode(F.array(F.col("_rbucket"), F.col("_rbucket") + 1)))
    joined = lb.join(rb, [by, "_bucket"])
    # exact range check in microseconds (second-truncated epochs would
    # disagree with the sub-second oracle at the boundary)
    return joined.filter(
        (F.col(right_ts) <= F.col(left_ts))
        & (F.unix_micros(F.col(right_ts)) > F.unix_micros(F.col(left_ts)) - width_us)
    ).drop("_bucket", "_rbucket")


# ---------------------------------------------------------------------------
# Catalog entries (DuckDB has native ASOF JOIN → strong oracle)
# ---------------------------------------------------------------------------


def asof_purchase_before_error(spark, sf_dir: str) -> DataFrame:
    """For each error event: the user's most recent purchase at or
    before it (value carried as-of)."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(errors, purchases, on="ts", by="user_id", value_cols=["purchase_value"])
    return out.select(
        "user_id",
        "event_id",
        F.col("purchase_value_asof").alias("last_purchase_value"),
    )


# Oracle mirrors the union+window formulation INCLUDING the
# max-value-wins duplicate-timestamp tiebreak and the one-struct match
# payload (DuckDB's native ASOF picks an arbitrary duplicate, so a
# tie-handling regression would silently pass against it — ADVICE r5).
register(
    "join_asof",
    asof_purchase_before_error,
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 1 AS side, CAST(NULL AS DOUBLE) AS v,
             CAST(NULL AS STRUCT(o TIMESTAMP, v DOUBLE)) AS m
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, NULL, 0, value, struct_pack(o := ts, v := value)
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT user_id, event_id, side,
             LAST_VALUE(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, v NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM u
    )
    SELECT user_id, event_id, m.v AS last_purchase_value
    FROM cand WHERE side = 1
    """,
)


def asof_next_purchase_after_error(spark, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for each error, the FIRST purchase
    by the same user at-or-after the error, NULLed when it happens more
    than 6 hours later — pandas ``merge_asof(direction='forward',
    tolerance=...)`` parity, distributed."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        errors,
        purchases,
        on="ts",
        by="user_id",
        value_cols=["purchase_value"],
        direction="forward",
        tolerance_us=6 * 3600 * 1_000_000,
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("purchase_value_asof").alias("next_purchase_value"),
    ).orderBy("user_id", "event_id")


# Forward scan = same formulation over reversed time (ORDER BY ts
# DESC); tiebreak and struct payload identical to join_asof's oracle.
register(
    "join_asof_forward_tolerance",
    asof_next_purchase_after_error,
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 1 AS side, CAST(NULL AS DOUBLE) AS v,
             CAST(NULL AS STRUCT(o TIMESTAMP, v DOUBLE)) AS m
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, NULL, 0, value, struct_pack(o := ts, v := value)
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT user_id, ts, event_id, side,
             LAST_VALUE(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts DESC, side, v NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM u
    )
    SELECT user_id, event_id,
           CASE WHEN m.o IS NOT NULL
                 AND epoch_us(m.o) - epoch_us(ts) <= 21600000000
                THEN m.v END AS next_purchase_value
    FROM cand WHERE side = 1
    ORDER BY user_id, event_id
    """,
)


def range_join_clicks_before_error(spark, sf_dir: str) -> DataFrame:
    """Errors joined to clicks by the same user within the preceding
    10 minutes — bucketized interval join."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    pairs = range_join_buckets(
        errors, clicks, by="user_id", left_ts="err_ts", right_ts="click_ts", max_lag_seconds=600
    )
    return pairs.select("user_id", "err_id", "click_id")


register(
    "join_range_bucketed",
    range_join_clicks_before_error,
    """
    SELECT e.user_id, e.event_id AS err_id, c.event_id AS click_id
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND c.ts <= e.ts
     AND epoch_us(c.ts) > epoch_us(e.ts) - 600000000
    """,
)


# ---------------------------------------------------------------------------
# Keyless interval-overlap join (extension)
# ---------------------------------------------------------------------------

_OVL_BUCKET_S = 3600
_DAY_S = 86400


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "s",
    l_end: str = "e",
    r_start: str = "s",
    r_end: str = "e",
    bucket_seconds: int = _OVL_BUCKET_S,
) -> DataFrame:
    """All pairs (l, r) whose [start, end] intervals overlap, with NO
    equi key — the genuinely hard interval join.

    Naive formulation is a cross join; the scale-safe plan explodes
    each interval onto the coarse time buckets it spans (bounded by
    interval length / bucket width), hash equi-joins on bucket, applies
    the exact overlap predicate, and deduplicates each pair to the ONE
    bucket containing ``greatest(l.start, r.start)`` — every
    overlapping pair intersects that bucket exactly once, so no
    distinct is needed. Shuffle volume is bucket-population-bounded;
    AQE splits hot buckets. Interval columns are epoch-second longs.
    """
    lcols = [F.col(c).alias(f"l_{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"r_{c}") for c in right.columns]
    lb = left.select(*lcols).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"l_{l_start} div {bucket_seconds}"),
                F.expr(f"l_{l_end} div {bucket_seconds}"),
            )
        ),
    )
    rb = right.select(*rcols).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"r_{r_start} div {bucket_seconds}"),
                F.expr(f"r_{r_end} div {bucket_seconds}"),
            )
        ),
    )
    return (
        lb.join(rb, "_bkt")
        .filter(
            (F.col(f"l_{l_start}") <= F.col(f"r_{r_end}"))
            & (F.col(f"r_{r_start}") <= F.col(f"l_{l_end}"))
        )
        .filter(
            F.col("_bkt")
            == F.expr(f"greatest(l_{l_start}, r_{r_start}) div {bucket_seconds}")
        )
        .drop("_bkt")
    )


def overlap_clicks_errors(spark, sf_dir: str) -> DataFrame:
    """Daily count of (click, error) pairs whose activity intervals
    overlap, across ALL users (keyless). Interval = [ts, ts + value
    minutes] with the duration floored to whole seconds (integer-exact
    in both engines)."""
    ev = load(spark, sf_dir, "events")
    epoch_s = F.expr("unix_micros(ts) div 1000000")
    base = ev.select(
        "event_type",
        epoch_s.alias("s"),
        (epoch_s + F.greatest(F.floor(F.col("value") * 60).cast("long"), F.lit(0))).alias("e"),
    )
    clicks = base.filter(F.col("event_type") == "click").select("s", "e")
    errors = base.filter(F.col("event_type") == "error").select("s", "e")
    pairs = interval_overlap_join(clicks, errors)
    return (
        pairs.groupBy(F.expr(f"greatest(l_s, r_s) div {_DAY_S}").cast("bigint").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


register(
    "join_interval_overlap",
    overlap_clicks_errors,
    """
    WITH iv AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             CAST(epoch_us(ts) // 1000000
                  + GREATEST(CAST(FLOOR(value * 60) AS BIGINT), 0) AS BIGINT) AS e
      FROM events
    ),
    a AS (SELECT s, e FROM iv WHERE event_type = 'click'),
    b AS (SELECT s, e FROM iv WHERE event_type = 'error')
    SELECT CAST(GREATEST(a.s, b.s) // 86400 AS BIGINT) AS day,
           COUNT(*) AS n_pairs
    FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# Nearest-direction as-of (completes backward / forward / nearest)
# ---------------------------------------------------------------------------


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_col: str,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')`` parity, distributed:
    for each left row the CLOSER of (latest right at-or-before, first
    right strictly-after); ties at equal distance resolve backward,
    and an equal-timestamp right row is a zero-gap backward match —
    both exactly pandas' rules.

    One union, ONE sort: both candidates come from two window frames
    over the SAME (key, ts, side) ordering — an unbounded-preceding
    ``last`` and an unbounded-following ``first`` — so the plan has a
    single Exchange+Sort feeding two Window ops, not two shuffled
    joins. Gap comparison is integer microseconds.
    """
    lcols = left.columns
    # match payload as ONE struct per direction (same rationale as
    # asof_join: timestamp and value must come from the same winning
    # row even when the value is NULL)
    payload = F.struct(F.col(on).alias("_on"), F.col(value_col).alias("_v"))
    payload_type = right.select(payload.alias("_m")).schema["_m"].dataType
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_m"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
    )
    r = right.select(
        *[
            F.col(c) if c in (by, on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        payload.alias("_m"),
        F.col(value_col).alias("_v"),
    )
    unioned = l.unionByName(r)
    # _v as deterministic tiebreak between equal-ts right rows (see
    # asof_join; for the FOLLOWING frame's `first` the symmetric choice
    # is min-value-wins, i.e. the same ascending order works for both).
    # asc_nulls_first is explicit — the NULL order is part of the
    # contract and the oracles spell the same (ADVICE r6).
    wb = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_v").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cand = unioned.select(
        *lcols,
        "_side",
        F.last("_m", ignorenulls=True).over(wb).alias("_b"),
        F.first("_m", ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_side") == 1)
    cand = cand.select(
        *lcols,
        F.col("_b._on").alias("_b_on"),
        F.col("_b._v").alias("_b_v"),
        F.col("_f._on").alias("_f_on"),
        F.col("_f._v").alias("_f_v"),
    )
    on_type = right.schema[on].dataType
    b_gap = _as_us(F.col(on), on_type) - _as_us(F.col("_b_on"), on_type)
    f_gap = _as_us(F.col("_f_on"), on_type) - _as_us(F.col(on), on_type)
    take_b = F.col("_b_on").isNotNull() & (
        F.col("_f_on").isNull() | (b_gap <= f_gap)
    )
    gap = F.when(take_b, b_gap).otherwise(f_gap)
    val = F.when(take_b, F.col("_b_v")).otherwise(F.col("_f_v"))
    matched = F.col("_b_on").isNotNull() | F.col("_f_on").isNotNull()
    if tolerance_us is not None:
        matched = matched & (gap <= F.lit(tolerance_us))
    return cand.select(
        *lcols,
        F.when(matched, val).alias(f"{value_col}{suffix}"),
        F.when(matched, gap).cast("bigint").alias("gap_us"),
    )


def asof_nearest_purchase(spark, sf_dir: str) -> DataFrame:
    """For each error event: the nearest purchase by the same user in
    EITHER direction (ties backward), with the signed-magnitude gap."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_nearest_join(
        errors, purchases, on="ts", by="user_id", value_col="purchase_value"
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("purchase_value_asof").alias("nearest_purchase_value"),
        "gap_us",
    ).orderBy("user_id", "event_id")


# Oracle mirrors the union+two-frame formulation (DuckDB's native ASOF
# is backward-only); IGNORE NULLS window frames express both candidates
# over one ordering, tie/equal-ts conventions identical by construction.
register(
    "join_asof_nearest",
    asof_nearest_purchase,
    """
    WITH u AS (
      SELECT user_id, ts, event_id, 1 AS side, CAST(NULL AS DOUBLE) AS v,
             CAST(NULL AS STRUCT(o TIMESTAMP, v DOUBLE)) AS m
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, NULL, 0, value, struct_pack(o := ts, v := value)
      FROM events WHERE event_type = 'purchase'
    ),
    frames AS (
      SELECT user_id, ts, event_id, side,
             LAST_VALUE(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, v NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b,
             FIRST_VALUE(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, v NULLS FIRST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
      FROM u
    ),
    cand AS (
      SELECT user_id, ts, event_id, side,
             b.o AS b_on, b.v AS b_v, f.o AS f_on, f.v AS f_v
      FROM frames
    )
    SELECT user_id, event_id,
           CASE WHEN b_on IS NULL AND f_on IS NULL THEN NULL
                WHEN b_on IS NOT NULL AND (f_on IS NULL
                      OR epoch_us(ts) - epoch_us(b_on) <= epoch_us(f_on) - epoch_us(ts))
                THEN b_v ELSE f_v END AS nearest_purchase_value,
           CAST(CASE WHEN b_on IS NULL AND f_on IS NULL THEN NULL
                WHEN b_on IS NOT NULL AND (f_on IS NULL
                      OR epoch_us(ts) - epoch_us(b_on) <= epoch_us(f_on) - epoch_us(ts))
                THEN epoch_us(ts) - epoch_us(b_on)
                ELSE epoch_us(f_on) - epoch_us(ts) END AS BIGINT) AS gap_us
    FROM cand WHERE side = 1
    ORDER BY user_id, event_id
    """,
)
