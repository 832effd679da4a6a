"""Analytic-function catalog (extensions past the reference's window
surface, SURVEY.md §2.5 note: "rank/dense_rank/lag/lead/rowsBetween
over events"): ranking distributions, value-range frames, map columns,
date-series generation, unpivot, conditional aggregates.

Parity notes: percent_rank/cume_dist are exact-integer ratios → output
unrounded (IEEE-identical across engines); range-frame sums stay on the
cents grid → round 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .catalog import register


# --- ranking distribution: ntile / percent_rank / cume_dist ------------------
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking WITHOUT a single-partition window (VERDICT.md r1
    flagged `Window.orderBy` over the whole fact table as a scale-killer:
    one task serializes the table). Two-phase instead: global rank =
    per-cell row_number + prefix-sum offset, with cells on a FIXED
    integer grid (``rank_histogram_grid_lazy``, operators/ids.py) —
    ONE action, no boundary sampling, no persist, no driver collect
    (r6 introduced the grid over the range-repartition scheme; r14
    moved the prefix sum JVM-side so the counts ride a broadcast
    instead of an eager job; dense_ids keeps the range scheme for
    unbounded domains). The ordering (o_totalprice, o_orderkey) is total, so
    rank == row_number and the SQL-standard definitions reduce to pure
    integer arithmetic on (rank, n):

      percent_rank = (rank-1)/(n-1);  cume_dist = rank/n
      ntile(k): first n%k tiles get n//k+1 rows, the rest n//k.

    Exact-integer ratios are emitted unrounded (IEEE-identical in
    DuckDB, see module docstring).
    """
    from ..operators.ids import ntile_from_rank_col, rank_histogram_grid_lazy

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # r14 (VERDICT r13 next-6 class): the grid scheme's cell-count
    # collect + eager job are gone — offsets AND the total n ride the
    # broadcast-joined counts frame, so the whole query is ONE action
    # with no driver materialization; the ntile/percent_rank/cume_dist
    # arithmetic is the identical integer math with n as a column.
    ranked = rank_histogram_grid_lazy(
        orders, "o_totalprice", "o_orderkey", id_col="_rank", n_col="_n"
    )
    rank = F.col("_rank")
    n = F.col("_n")
    quartile = ntile_from_rank_col(rank, n, 4)
    pct_rank = (
        F.when(n <= 1, F.lit(0.0))
        .otherwise((rank - 1) / (n - 1).cast("double"))
        .cast("double")
    )
    return ranked.select(
        "o_orderkey",
        quartile.alias("quartile"),
        pct_rank.alias("pct_rank"),
        (rank / n.cast("double")).cast("double").alias("cume"),
    )


register(
    "window_rank_distribution",
    window_rank_distribution,
    """
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
           PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey) AS cume
    FROM orders
    """,
)


# --- first/nth value with explicit frame -------------------------------------
def window_first_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # synthetic lineitem has duplicate linenumbers per order — tiebreak
    # on partkey for a total order (else nth_value is nondeterministic)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.nth_value("l_partkey", 2).over(w).alias("second_part"),
        F.last("l_partkey").over(w).alias("last_part"),
    )


register(
    "window_first_nth",
    window_first_nth,
    """
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           NTH_VALUE(l_partkey, 2) OVER w AS second_part,
           LAST_VALUE(l_partkey) OVER w AS last_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)


# --- RANGE frame over a value ordering ----------------------------------------
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_within_10k_below"),
    )


register(
    "window_range_frame",
    window_range_frame,
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS n_similar_cheaper,
           ROUND(SUM(o_totalprice) OVER w, 2) AS sum_within_10k_below
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    """,
)


# --- map column construction + access -----------------------------------------
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("bucket"), F.when(F.col("value") >= 250, F.lit("high")).otherwise(F.lit("low")),
    )
    return ev.select(
        "event_id",
        m.getItem("type").alias("m_type"),
        m.getItem("bucket").alias("m_bucket"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.size(m).alias("m_size"),
    )


register(
    "map_functions",
    map_functions,
    """
    SELECT event_id,
           event_type AS m_type,
           CASE WHEN value >= 250 THEN 'high' ELSE 'low' END AS m_bucket,
           'type,bucket' AS m_keys,
           2 AS m_size
    FROM events
    """,
)


# --- date-series generation (sequence + explode) --------------------------------
def date_series_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    months = F.sequence(
        F.trunc(F.col("o_orderdate").cast("date"), "month"),
        F.add_months(F.trunc(F.col("o_orderdate").cast("date"), "month"), 2),
        F.expr("interval 1 month"),
    )
    return (
        orders.select("o_orderkey", F.explode(months).alias("active_month"))
    )


register(
    "date_series_explode",
    date_series_explode,
    """
    SELECT o_orderkey, CAST(unnest(generate_series(
             date_trunc('month', o_orderdate),
             date_trunc('month', o_orderdate) + INTERVAL 2 MONTH,
             INTERVAL 1 MONTH)) AS DATE) AS active_month
    FROM orders WHERE o_orderkey <= 200
    """,
)


# --- unpivot / stack -------------------------------------------------------------
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', qty, 'price', price) AS (metric, metric_value)",
    )


register(
    "unpivot_stack",
    unpivot_stack,
    """
    WITH wide AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2) AS qty,
             ROUND(SUM(l_extendedprice), 2) AS price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS metric, qty AS metric_value FROM wide
    UNION ALL
    SELECT l_returnflag, 'price' AS metric, price AS metric_value FROM wide
    """,
)


# --- conditional aggregates: count_if / bool_or / bool_and -----------------------
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (count_if / bool_or / bool_and / filtered sum).

    ``sum_big_cents`` is accumulated on the integer cents grid — each value
    is rounded to cents and CAST to BIGINT *before* the SUM — so the result
    is an exact integer on both engines.  That cents-grid rewrite (r4) did
    NOT clear the external driver row.  Root cause found in r5: DuckDB's
    ``count_if`` returns HUGEINT, which pandas converts to **float64**
    (``1.0``) while Spark's ``count_if`` yields int64 (``1``) — a dtype
    divergence invisible to the local ``fetchall()``-based differential
    (HUGEINT fetches as a Python int) but fatal to any pandas-mediated
    hash compare.  ``n_big`` was present and uncast in BOTH red rounds,
    which the boolean/double theories never explained.  Fix: the oracle
    CASTs ``count_if`` to BIGINT.  ``any_huge``/``all_nonneg`` are also
    CAST to INT (0/1) on both engines per VERDICT r4 §next-1 —
    booleans elsewhere in the catalog have passed the driver's hash, but
    removing them here costs nothing and shrinks the output domain to
    {string, int64} (see tests/test_schema_domain.py for the
    catalog-wide pandas-dtype-parity gate this incident produced)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 400).alias("n_big"),
        F.bool_or(F.col("value") > 489).cast("int").alias("any_huge"),
        F.bool_and(F.col("value") >= 0).cast("int").alias("all_nonneg"),
        F.sum(
            F.when(
                F.col("value") > 400,
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("sum_big_cents"),
    )


register(
    "agg_conditional",
    agg_conditional,
    """
    SELECT event_type,
           CAST(count_if(value > 400) AS BIGINT) AS n_big,
           CAST(bool_or(value > 489) AS INT) AS any_huge,
           CAST(bool_and(value >= 0) AS INT) AS all_nonneg,
           CAST(SUM(CASE WHEN value > 400
                         THEN CAST(ROUND(value * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_big_cents
    FROM events
    GROUP BY event_type
    """,
)


# --- cube grouping sets ----------------------------------------------------------
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


register(
    "agg_cube",
    agg_cube,
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


# --- explicit grouping sets -------------------------------------------------------
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP desugar to):
    per-status, per-priority, and grand-total groups in ONE pass with
    ``grouping()`` flags disambiguating real NULLs from rolled-up rows.

    Scale: grouping sets expand rows by |sets| BEFORE the hash agg, but
    partial aggregation collapses each set map-side, so the shuffle is
    O(distinct groups × sets) — never a second scan per set (DataFrame
    API ``groupingSets``, Spark 4)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / F.lit(100.0)
            ).alias("total_price"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


register(
    "agg_grouping_sets",
    agg_grouping_sets,
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)


# --- median absolute deviation ----------------------------------------------------
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MAD (median absolute deviation) — the robust dispersion
    companion to winsorization: median of |v - median(v)|. Two exact
    percentile passes with the |groups|-row medians broadcast between
    them; all deviations are integer cents, the floored-percentile
    stability argument from agg_winsorized_stats applies to both
    levels."""
    ev = load(spark, sf_dir, "events")
    vc = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("v_c"))
    med = vc.groupBy("event_type").agg(
        F.floor(F.expr("percentile(v_c, 0.5)")).cast("long").alias("med_c")
    )
    dev = vc.join(F.broadcast(med), "event_type").select(
        "event_type", "med_c", F.abs(F.col("v_c") - F.col("med_c")).alias("dev_c")
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.first("med_c").alias("med_c"),
            F.floor(F.expr("percentile(dev_c, 0.5)")).cast("long").alias("mad_c"),
        )
        .select(
            "event_type",
            (F.col("med_c") / F.lit(100.0)).alias("median_value"),
            (F.col("mad_c") / F.lit(100.0)).alias("mad_value"),
        )
        .orderBy("event_type")
    )


register(
    "agg_mad_robust",
    agg_mad_robust,
    """
    WITH vc AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c FROM events
    ),
    med AS (
      SELECT event_type, CAST(floor(quantile_cont(v_c, 0.5)) AS BIGINT) AS med_c
      FROM vc GROUP BY event_type
    ),
    dev AS (
      SELECT vc.event_type AS event_type, med_c, abs(v_c - med_c) AS dev_c
      FROM vc JOIN med USING (event_type)
    )
    SELECT event_type,
           ANY_VALUE(med_c) / 100.0 AS median_value,
           CAST(floor(quantile_cont(dev_c, 0.5)) AS BIGINT) / 100.0 AS mad_value
    FROM dev
    GROUP BY event_type
    ORDER BY event_type
    """,
)


# --- ordered string aggregation (LISTAGG family) ----------------------------------
def agg_string_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region sorted nation roster as ONE string — the
    LISTAGG/STRING_AGG family. Order inside the aggregate is explicit
    (array_sort before concat): an unordered listagg is partitioning-
    dependent and non-reproducible, the classic hidden flake."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


register(
    "agg_string_listagg",
    agg_string_listagg,
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)


# --- deterministic per-group mode (argmax) ----------------------------------------
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type — the argmax-per-group family, done
    DETERMINISTICALLY: native max_by/arg_max leave ties
    engine/partitioning-defined, so the tie-break is explicit
    (count desc, then type asc) via row_number over the counted grid.

    Scale: count agg shuffles on (user, type); the ranking window runs
    on the counted grid (|users|×|types| rows), never the raw events."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
        .orderBy("user_id")
    )


register(
    "agg_mode_argmax",
    agg_mode_argmax,
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS modal_type, n
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
)


# --- winsorized statistics --------------------------------------------------------
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-group mean: values clipped to the group's
    [p05, p95] band before averaging (winsorization — the data-cleaning
    step before quality metrics trust a mean).

    Parity discipline: values ride the cents grid as BIGINT; the
    percentile bounds are FLOORED to integer cents (floor of an
    interpolated value is stable — it only moves if the double sits
    within an ulp of an integer, which the exact-position case computes
    without arithmetic); clipping and summing stay in integers, with ONE
    trailing division. Scale: two aggs over the table, the |groups|-row
    bounds table broadcasts back — no window, no sort."""
    ev = load(spark, sf_dir, "events")
    vc = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("v_c"))
    bounds = vc.groupBy("event_type").agg(
        F.floor(F.expr("percentile(v_c, 0.05)")).cast("long").alias("lo_c"),
        F.floor(F.expr("percentile(v_c, 0.95)")).cast("long").alias("hi_c"),
    )
    clipped = vc.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo_c",
        "hi_c",
        F.least(F.greatest(F.col("v_c"), F.col("lo_c")), F.col("hi_c")).alias("w_c"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("lo_c").alias("lo_c"),
            F.first("hi_c").alias("hi_c"),
            (F.sum("w_c") / F.lit(100.0) / F.count(F.lit(1))).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


register(
    "agg_winsorized_stats",
    agg_winsorized_stats,
    """
    WITH vc AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c FROM events
    ),
    bounds AS (
      SELECT event_type,
             CAST(floor(quantile_cont(v_c, 0.05)) AS BIGINT) AS lo_c,
             CAST(floor(quantile_cont(v_c, 0.95)) AS BIGINT) AS hi_c
      FROM vc GROUP BY event_type
    )
    SELECT vc.event_type AS event_type,
           COUNT(*) AS n,
           ANY_VALUE(lo_c) AS lo_c,
           ANY_VALUE(hi_c) AS hi_c,
           CAST(SUM(least(greatest(v_c, lo_c), hi_c)) AS BIGINT) / 100.0 / COUNT(*)
             AS winsorized_mean
    FROM vc JOIN bounds USING (event_type)
    GROUP BY vc.event_type
    ORDER BY event_type
    """,
)


# --- running distinct count -------------------------------------------------------
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key — not directly expressible as a
    window aggregate in either engine; the standard decomposition is
    first-occurrence flags (row_number == 1 over (key, value)) summed by
    an ordinary running window. Two key-partitioned windows, no distinct
    state blow-up: the flag costs O(1) per row.

    Use: "how many distinct event types has this user touched as of each
    event" — breadth-of-engagement over time."""
    ev = load(spark, sf_dir, "events")
    first_w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.row_number().over(first_w) == 1).cast("int").alias("_first"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("_first").over(run_w).cast("bigint").alias("n_types_seen"),
    ).orderBy("user_id", "event_id")


register(
    "window_running_distinct",
    window_running_distinct,
    """
    WITH flagged AS (
      SELECT user_id, event_id,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen,
             ts
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_seen
    FROM flagged
    ORDER BY user_id, event_id
    """,
)


# --- group-wise OLS trend ---------------------------------------------------------
_X_EPOCH0 = 1_704_067_200  # 2024-01-01T00:00Z; centers x so Sxx fits in int64


def agg_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (value vs time) from SUFFICIENT
    STATISTICS — the monoid pattern for distributed regression: five
    integer sums (n, Σx, Σy, Σxx, Σxy) combine map-side, shuffle
    O(groups) rows, and the closed-form slope/intercept are single
    double divisions on identical BIGINT operands in both engines.

    x is centered on a fixed epoch so the integer SUMS stay exact in
    int64 (x ≤ 3.5e6 s, cent-grid y: Σxx ≈ 3.4e17 at sf0.1 « 2^63;
    exact through ~sf1 — beyond that re-center per partition-month and
    merge, same monoid). The closed-form COMBINATION (n·Σxx − Σx²) is
    ~1e23 at sf0.1 and must NOT run in int64 — DuckDB silently promotes
    to int128 while Spark's ANSI mode throws ARITHMETIC_OVERFLOW (found
    by the round-4 full sf0.1 differential). Both engines therefore cast
    the five exact sums to DOUBLE first and combine with the same IEEE
    operation order — bit-identical results, no overflow at any scale.
    This is how MLlib's linear summarizers work under the hood —
    expressed declaratively."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (F.expr("unix_micros(ts) div 1000000") - F.lit(_X_EPOCH0)).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    stats = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    sxx_d = F.col("sxx").cast("double")
    sxy_d = F.col("sxy").cast("double")
    den = n_d * sxx_d - sx_d * sx_d
    slope = (n_d * sxy_d - sx_d * sy_d) / den
    return (
        stats.select(
            "event_type",
            "n",
            F.when(den != 0, slope).alias("slope_cents_per_sec"),
            F.when(den != 0, (sy_d - slope * sx_d) / n_d).alias("intercept_cents"),
        )
        .orderBy("event_type")
    )


register(
    "agg_groupwise_ols",
    agg_groupwise_ols,
    f"""
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - {_X_EPOCH0} AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pts GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS n_d, CAST(sx AS DOUBLE) AS sx_d,
             CAST(sy AS DOUBLE) AS sy_d, CAST(sxx AS DOUBLE) AS sxx_d,
             CAST(sxy AS DOUBLE) AS sxy_d
      FROM stats
    )
    SELECT event_type, n,
           CASE WHEN n_d * sxx_d - sx_d * sx_d <> 0
                THEN (n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d)
           END AS slope_cents_per_sec,
           CASE WHEN n_d * sxx_d - sx_d * sx_d <> 0
                THEN (sy_d - ((n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d)) * sx_d)
                       / n_d
           END AS intercept_cents
    FROM d
    ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# Conversion funnel (sequence matching)
# ---------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel, each step within 24 h of the
    previous step's FIRST occurrence; one row of stage counts and
    exact-ratio conversion rates.

    Set-based, not per-row sequence scans: each stage is a keyed
    (user_id) agg of the stage events joined to the previous stage's
    first-timestamp — three shuffles total, all on user_id, so at scale
    the stages stay co-partitioned after the first exchange. Time math
    on epoch-micros BIGINTs (tz-free, engine-portable); ratios are
    exact-int IEEE divisions, emitted unrounded.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("v_us")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("us") > F.col("v_us")) & (F.col("us") <= F.col("v_us") + _DAY_US))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("us") > F.col("c_us")) & (F.col("us") <= F.col("c_us") + _DAY_US))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            (F.col("n_click").cast("double") / F.col("n_view")).alias("view_to_click"),
            (F.col("n_purchase").cast("double") / F.col("n_click")).alias("click_to_purchase"),
        )
    )


register(
    "funnel_conversion",
    funnel_conversion,
    f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, MIN(us) AS v_us FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.us) AS c_us
      FROM ev e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.us > v.v_us AND e.us <= v.v_us + {_DAY_US}
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.us) AS p_us
      FROM ev e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.us > c.c_us AND e.us <= c.c_us + {_DAY_US}
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase,
           CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM v) AS view_to_click,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM c) AS click_to_purchase
    """,
)


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week (epoch-week ints — tz-free), each later week's distinct-active
    count and exact-ratio retention against the cohort size.

    Shape: one distinct over (user, week) — a keyed shuffle collapsed
    map-side by partial agg; cohorts from a per-user min; the matrix is
    a (cohort × offset) hash-agg joined to broadcast-sized cohort
    counts. Nothing global, nothing windowed.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        # integer `div`, not floor(double /): a double quotient can round
        # up across an integer boundary within half an ulp
        F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("week"),
    )
    activity = ev.distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    matrix = (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))  # (user, week) distinct already
    )
    return matrix.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


register(
    "cohort_retention",
    cohort_retention,
    f"""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(epoch_us(ts) // {_WEEK_US} AS BIGINT) AS week
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id),
    sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_week),
    matrix AS (
      SELECT c.cohort_week, a.week - c.cohort_week AS week_offset, COUNT(*) AS n_active
      FROM activity a JOIN cohort c USING (user_id)
      GROUP BY c.cohort_week, a.week - c.cohort_week
    )
    SELECT cohort_week, week_offset, n_active, cohort_size,
           CAST(n_active AS DOUBLE) / cohort_size AS retention
    FROM matrix JOIN sizes USING (cohort_week)
    """,
)


# ---------------------------------------------------------------------------
# Multi-resolution time rollup cascade (continuous-aggregate pattern)
# ---------------------------------------------------------------------------


def rollup_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day aggregate cascade: the day level is computed FROM the
    hour level's registers, never from raw events — the
    continuous-aggregate / hypertable-rollup pattern. Works because the
    registers (count, quantized-int value sum) are monoids, the same
    property agg_incremental_merge exploits for batch maintenance; at
    100 TB the day rollup touches |hours| rows instead of |events|.

    The value register is quantized to integer hundredths BEFORE the
    first sum (floor(v·100)): double sums would drift between the
    cascaded and direct paths (different add order); integer sums make
    cascade == direct BIT-exactly — which is what the oracle (computed
    straight from raw) certifies. Time buckets are epoch-int `div`s,
    tz-free.
    """
    ev = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 3600000000").alias("hour"),  # epoch hours
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_c"),
    )
    hourly = ev.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_c").alias("sum_c"),
    )
    daily = (
        hourly.groupBy(
            F.expr("hour div 24").alias("day"), F.col("event_type")
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sum_c").alias("sum_c"),
            F.count(F.lit(1)).alias("n_hours_active"),
        )
    )
    return daily.select(
        "day",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        "n_hours_active",
        (F.col("sum_c").cast("double") / 100).alias("sum_value"),
    )


register(
    "rollup_time_cascade",
    rollup_time_cascade,
    """
    WITH ev AS (
      SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS v_c
      FROM events
    )
    SELECT CAST(hour // 24 AS BIGINT) AS day, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT hour) AS n_hours_active,
           CAST(CAST(SUM(v_c) AS BIGINT) AS DOUBLE) / 100 AS sum_value
    FROM ev GROUP BY 1, 2
    """,
)
