"""The remaining 14 TPC-H query shapes (Q2/4/6/7/8/10/12/14/15/16/17/19/20/21).

Together with plans/tpch.py (Q1/3/5/9/11/13/18/22) this completes the
22-query decision-support suite over the driver's synthetic star schema.
The reference pipeline never ships a warehouse benchmark (BASELINE.md —
no published numbers), but its query surface is join+agg shaped
(SURVEY.md §2.3/§2.4); the full TPC-H suite exercises every canonical
hard case of that surface: correlated scalar subqueries (Q2/15/17),
EXISTS / NOT EXISTS chains (Q4/20/21), conditional aggregation (Q12/14),
disjunctive pushdown (Q19), distinct-count with exclusion (Q16), and
two-sided nation volume (Q7/8).

Schema adaptations (the synthetic tables are narrower than spec — no
partsupp, no commit/receipt dates, no shipmode/container/comment):
- Q2/Q16/Q20: the part↔supplier relation is DISTINCT (l_partkey,
  l_suppkey) observed in lineitem; "supply cost" is the min observed
  extended price.
- Q4/Q12/Q21: "late" is l_shipdate > o_orderdate + N days (the only
  date pair available); Q12's ship modes become lateness buckets.
- Q19: the container predicate arm becomes a size-band arm.
Every adaptation keeps the ORIGINAL query's plan shape — that is what
is being tested, not the spec constants.

Parity discipline (see plans/tpch.py): all money on integer grids
(cents / 1e-4 discounted-cents), all fraction compares cross-multiplied
to BIGINT, exactly one trailing float division per output column,
mirrored token-for-token in the DuckDB oracle. Dates leave as ISO
strings; day arithmetic uses integer datediff on both sides.

Scale posture (100 TB):
- Selective dim filters (part brand/size, nation, region) are applied
  BEFORE joins and those dims broadcast — the fact table is probed at
  scan speed, never shuffled against an unfiltered dim.
- Correlated subqueries are decorrelated by hand into aggregate-then-
  join-back (Q2/15/17/20/21), so each needs one keyed shuffle of the
  fact table, not a per-row subquery.
- Per-order / per-part / per-supplier grouped states are orders of
  magnitude smaller than lineitem; AQE turns the join-backs into
  broadcasts at runtime.
- Q21's EXISTS pair collapses into ONE per-order aggregate (supplier
  count + late-supplier count) — two boolean registers instead of two
  extra joins against lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..tables import load
from .catalog import register
from .tpch import _DISC_UNITS, _SQL_UNITS, _cents, _li_units

# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated scalar min + join back)
# ---------------------------------------------------------------------------


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the MINIMUM cost inside one region — the correlated scalar-min
    subquery, decorrelated into min-per-part ⋈ back on (part, min).

    Adaptation: supply cost := min l_extendedprice cents observed for the
    (part, supplier) pair in lineitem (no partsupp table). Scale: the
    part filter (type+size → ~1% of parts) SEMI-joins lineitem before
    the heavy per-(part,supp) aggregate, and the EUROPE supplier set is
    broadcast; the min-per-part join-back runs on the tiny survivor agg.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size") == 15)
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem")
    # observed part↔supplier cost relation, bounded by the part filter
    cost = (
        li.select("l_partkey", "l_suppkey", _cents("l_extendedprice").alias("_cost_c"))
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "p_type", "p_size",
                 "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("_cost_c").alias("_pair_min_c"))
    )
    cost = tracked_persist(cost)  # feeds both the per-part min and the probe
    part_min = cost.groupBy(F.col("p_partkey").alias("_mp")).agg(
        F.min("_pair_min_c").alias("_part_min_c")
    )
    return (
        cost.join(
            part_min,
            (F.col("p_partkey") == F.col("_mp"))
            & (F.col("_pair_min_c") == F.col("_part_min_c")),
        )
        .select(
            (F.round(F.col("s_acctbal") * 100).cast("long") / F.lit(100.0)).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            (F.col("_pair_min_c") / F.lit(100.0)).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


_Q2_SQL = """
WITH cost AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         s_suppkey, s_name, s_acctbal, n_name,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS pair_min_c
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type <> 'PROMO' AND p_size = 15 AND r_name = 'EUROPE'
  GROUP BY p_partkey, p_brand, p_type, p_size, s_suppkey, s_name, s_acctbal, n_name
)
SELECT
  CAST(round(s_acctbal * 100) AS BIGINT) / 100.0 AS s_acctbal,
  s_name,
  n_name AS nation,
  p_partkey,
  p_brand,
  pair_min_c / 100.0 AS supplycost
FROM cost c
WHERE pair_min_c = (SELECT MIN(pair_min_c) FROM cost c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having AT LEAST ONE late
    lineitem, counted per priority — the EXISTS correlated subquery,
    planned as a LEFT SEMI join (each order counted once no matter how
    many lineitems qualify).

    Adaptation: "late" = shipped > 60 days after the order date (no
    commit/receipt dates). Scale: the quarter filter prunes orders at
    the scan; the semi-join shuffles on orderkey and short-circuits per
    key; the final agg is 5 groups, map-side combined.
    """
    lo, hi = "1997-01-01", "1997-04-01"
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit(lo))
        & (F.col("o_orderdate").cast("date") < F.lit(hi))
    )
    li = load(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", F.col("l_shipdate").cast("date").alias("_ship_d"))
    return (
        orders.select(
            "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("_ord_d")
        )
        .join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.datediff(F.col("_ship_d"), F.col("_ord_d")) > 60),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure pushdown scan)
# ---------------------------------------------------------------------------


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: ONE selective scan, zero joins — revenue that
    would be recovered by dropping discounts in a band. The whole query
    should compile to scan→filter→partial-agg→1-row exchange; the three
    predicates (year, discount band, quantity cap) all push to parquet.

    The discount band is evaluated on the integer percent grid
    (2..4 == [0.02, 0.04]) — a double BETWEEN on the raw column is a
    representability trap (0.04 has no exact binary form).
    """
    li = _li_units(load(spark, sf_dir, "lineitem"))
    return (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
            & F.col("_d_p").between(2, 4)
            # raw-double compare: quantity is integer-grid, and a CAST
            # here would block parquet pushdown of the bound
            & (F.col("l_quantity") < 25)
        )
        .agg((F.sum(F.col("_ep_c") * F.col("_d_p")) / F.lit(10000.0)).alias("revenue"))
    )


_Q6_SQL = f"""
WITH u AS (
  SELECT l_quantity, l_shipdate, {_SQL_UNITS}
  FROM lineitem
)
SELECT CAST(SUM(_ep_c * _d_p) AS BIGINT) / 10000.0 AS revenue
FROM u
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND _d_p BETWEEN 2 AND 4
  AND l_quantity < 25
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two specific nations in
    BOTH directions (supplier nation ↔ customer nation), by ship year —
    the two-sided dim filter whose disjunction must not widen the join.

    Scale: both nation filters reduce supplier/customer BEFORE their
    joins (100 / 1.5k rows → broadcast); lineitem shuffles once on
    orderkey for the orders join; the (2 × years) group-by is trivial.
    The nation-pair disjunction is a residual on the joined row.

    Pair NATION_18 ↔ NATION_19 (not the spec's FRANCE/GERMANY stand-in
    NATION_1/NATION_2): the smallest fixture (sf0.001) has zero joined
    rows for the 1↔2 pair, making the parity check vacuous there
    (ADVICE.md r3); 18↔19 yields 23 rows at sf0.001 / 68 at sf0.01.
    """
    n1, n2 = "NATION_18", "NATION_19"
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(n1, n2))
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_sn_key"),
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_cn_key"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("_cn_key"),
    )
    orders = load(spark, sf_dir, "orders")
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01"))
    )
    return (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
            F.expr(_DISC_UNITS).alias("_vol_u"),
        )
        .join(F.broadcast(sup.select("s_suppkey", "supp_nation")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "cust_nation"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("_vol_u") / F.lit(10000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
WITH u AS (
  SELECT l_orderkey, l_suppkey,
         CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
         l_shipdate, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  l_year,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS revenue
FROM u
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
GROUP BY n1.n_name, n2.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue in a
    product segment, per order year — conditional numerator over a
    common denominator, one double division per year row.

    Both numerator and denominator are BIGINT 1e-4-unit sums of the SAME
    joined rows (the CASE picks the numerator subset), so the single
    share division is one IEEE op on identical operands in both engines.
    Scale: part filter → broadcast semi of lineitem; ASIA customer set
    broadcast; one orderkey shuffle.
    """
    target = "NATION_2"
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    mkt_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_mkt_nkey"))
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("_mkt_nkey")
    )
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01"))
    )
    li = _li_units(load(spark, sf_dir, "lineitem"))
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey", F.expr(_DISC_UNITS).alias("_vol_u"))
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup.select("s_suppkey", "supp_nation")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select(
                "o_orderkey", "o_custkey", F.year(F.col("o_orderdate").cast("date")).alias("o_year")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == target, F.col("_vol_u")).otherwise(F.lit(0)))
            .alias("_tgt_u"),
            F.sum("_vol_u").alias("_all_u"),
        )
        .select(
            "o_year",
            (F.col("_tgt_u") / F.col("_all_u")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


_Q8_SQL = f"""
WITH u AS (
  SELECT l_orderkey, l_partkey, l_suppkey, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
  CAST(SUM(CASE WHEN n1.n_name = 'NATION_2' THEN {_DISC_UNITS} ELSE 0 END) AS BIGINT)
    / CAST(SUM({_DISC_UNITS}) AS BIGINT) AS mkt_share
FROM u
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE p_type = 'STANDARD'
  AND r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1998-01-01'
GROUP BY year(CAST(o_orderdate AS DATE))
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top lossy customers)
# ---------------------------------------------------------------------------


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over a
    quarter, top 20 — wide agg keyed by a high-cardinality dim plus
    decoration columns, then a tiny total-ordered head.

    Scale: the returnflag + quarter filters prune lineitem/orders at
    scan; the group-by carries the decoration columns THROUGH the agg
    (c_custkey is the key; dragging name/nation along adds no shuffle
    width worth a second join). TakeOrderedAndProject caps the sort at
    20 rows per partition.
    """
    lo, hi = "1997-01-01", "1997-04-01"
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit(lo))
        & (F.col("o_orderdate").cast("date") < F.lit(hi))
    )
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(F.col("l_returnflag") == "R")
    return (
        li.select("l_orderkey", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "c_custkey",
            "c_name",
            (F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(100.0)).alias("c_acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg((F.sum("_rev_u") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
WITH u AS (
  SELECT l_orderkey, l_returnflag, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  c_custkey,
  c_name,
  CAST(round(c_acctbal * 100) AS BIGINT) / 100.0 AS c_acctbal,
  n_name AS nation,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS revenue
FROM u
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-04-01'
GROUP BY c_custkey, c_name, CAST(round(c_acctbal * 100) AS BIGINT) / 100.0, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q12 — shipping lateness vs priority (conditional double count)
# ---------------------------------------------------------------------------


def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many high- vs low-
    priority orders it carried — the CASE-WHEN pair inside one
    aggregate pass (the query that demonstrates conditional agg beats
    two filtered scans).

    Adaptation: l_shipmode → lateness bucket (>60 days after order =
    'LATE', else 'ONTIME'). Scale: one orderkey shuffle joins the 1997
    lineitems to orders; the bucket expression is pure JVM date math;
    output is 2 rows.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", F.col("l_shipdate").cast("date").alias("_ship_d"))
        .join(
            orders.select(
                "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("_ord_d")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "ship_bucket",
            F.when(F.datediff(F.col("_ship_d"), F.col("_ord_d")) > 60, "LATE").otherwise("ONTIME"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


_Q12_SQL = """
SELECT
  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
       THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
    AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
GROUP BY 1
ORDER BY ship_bucket
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional share of one month's revenue)
# ---------------------------------------------------------------------------


def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of one month's revenue that came from
    promo parts — conditional numerator / total denominator, ONE pass.

    100.0 * BIGINT / BIGINT evaluates left-to-right identically in both
    engines (the 1e-4-unit sums stay far under 2^53, so the promotion
    to double is exact). Scale: month filter prunes lineitem at scan;
    part side broadcasts.
    """
    part = load(spark, sf_dir, "part")
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01"))
    )
    return (
        li.select("l_partkey", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rev_u")).otherwise(F.lit(0)))
                / F.sum("_rev_u")
            ).alias("promo_revenue_pct")
        )
    )


_Q14_SQL = f"""
WITH u AS (
  SELECT l_partkey, l_shipdate, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_UNITS} ELSE 0 END) AS BIGINT)
        / CAST(SUM({_DISC_UNITS}) AS BIGINT) AS promo_revenue_pct
FROM u
JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar max over a derived view, join back)
# ---------------------------------------------------------------------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM quarterly revenue —
    the derived revenue view referenced twice (once for rows, once for
    its scalar max), decorrelated into agg → persist → broadcast-max
    probe. Ties all surface, as in spec.

    Scale: one suppkey shuffle builds the per-supplier view (bounded by
    |supplier|); the scalar max is a 1-row broadcast; no second pass
    over lineitem.
    """
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.expr(_DISC_UNITS)).alias("_rev_u"))
    )
    revenue = tracked_persist(revenue)  # rows + scalar max from one agg
    mx = revenue.agg(F.max("_rev_u").alias("_max_u"))
    sup = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("_rev_u") == F.col("_max_u"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("_rev_u") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH u AS (
  SELECT l_suppkey, l_shipdate, {_SQL_UNITS}
  FROM lineitem
),
revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC_UNITS}) AS BIGINT) AS rev_u
  FROM u
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_u / 10000.0 AS total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE rev_u = (SELECT MAX(rev_u) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 — supplier relationship count (distinct-count with exclusion)
# ---------------------------------------------------------------------------


def tpch_q16_part_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers serve each part
    segment, excluding a brand, a type, and a supplier denylist — the
    NOT-IN anti-join feeding a distinct-count rollup.

    Adaptation: the part↔supplier relation is the distinct pairs
    observed in lineitem; the "complaints" denylist is suppliers with
    negative balances. Scale: pairs dedupe map-side per partition
    before the (brand,type,size) shuffle; the denylist (≤|supplier|)
    broadcasts as a left-anti probe.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_sup = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_sup.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg threshold)
# ---------------------------------------------------------------------------


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders BELOW 20% of a part's
    average order quantity — the correlated AVG subquery, decorrelated
    into per-part sufficient statistics joined back to the detail rows.

    Parity hard point: ``qty < 0.2 * avg(qty)`` in floats is a boundary
    trap; with integer quantities it cross-multiplies exactly to
    ``5 * qty * cnt < sum_qty``. Scale: the brand filter bounds the
    part set (broadcast); per-part stats are one partial-agg shuffle of
    the semi-joined detail; the stats join-back broadcasts.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_size") < 10)
    )
    li = load(spark, sf_dir, "lineitem")
    detail = (
        li.select("l_partkey", F.col("l_quantity").cast("long").alias("_qty"),
                  _cents("l_extendedprice").alias("_ep_c"))
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
    )
    detail = tracked_persist(detail)  # feeds the stats AND the probe
    stats = detail.groupBy(F.col("l_partkey").alias("_sp")).agg(
        F.sum("_qty").alias("_sum_qty"), F.count(F.lit(1)).alias("_cnt")
    )
    return (
        detail.join(F.broadcast(stats), F.col("l_partkey") == F.col("_sp"))
        .filter(F.col("_qty") * 5 * F.col("_cnt") < F.col("_sum_qty"))
        .agg((F.sum("_ep_c") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_SQL = """
WITH detail AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#5' AND p_size < 10
),
stats AS (
  SELECT l_partkey AS sp, CAST(SUM(qty) AS BIGINT) AS sum_qty, COUNT(*) AS cnt
  FROM detail
  GROUP BY l_partkey
)
SELECT CAST(SUM(ep_c) AS BIGINT) / 100.0 / 7.0 AS avg_yearly
FROM detail
JOIN stats ON l_partkey = sp
WHERE qty * 5 * cnt < sum_qty
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (three-arm disjunctive predicate)
# ---------------------------------------------------------------------------


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjoint (brand, size-band,
    quantity-band) predicate arms OR-ed together — the query optimizers
    historically mangled (OR across join-side columns must not break
    the equi-join or the pushdown).

    The join stays a pure p_partkey equi-join with the disjunction as a
    residual; the common quantity bound (<= 30) and the part side's
    brand set ARE pushable and prune both scans. Adaptation: container
    arms → size bands.
    """
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    # raw-double bound (integer-grid quantity): a CAST would block pushdown
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(F.col("l_quantity") <= 30)
    qty = F.col("l_quantity").cast("long")
    arm1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & qty.between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & qty.between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & qty.between(20, 30)
    return (
        li.select("l_partkey", "l_quantity", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg((F.sum("_rev_u") / F.lit(10000.0)).alias("revenue"))
    )


_Q19_SQL = f"""
WITH u AS (
  SELECT l_partkey, l_quantity, CAST(l_quantity AS BIGINT) AS qty, {_SQL_UNITS}
  FROM lineitem
)
SELECT CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS revenue
FROM u
JOIN part ON l_partkey = p_partkey
WHERE l_quantity <= 30
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND qty BETWEEN 1  AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND qty BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND qty BETWEEN 20 AND 30))
"""


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers of a part segment (nested IN chain)
# ---------------------------------------------------------------------------


def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers qualified by a nested subquery chain
    (supplier IN ... part IN ... quantity > fraction of a correlated
    sum) rolled up to name level for one nation.

    Adaptation: "excess availability" := the supplier shipped MORE THAN
    30% of a SMALL-type part's total 1996 volume (no partsupp/availqty).
    The fraction compare cross-multiplies to BIGINT
    (``10 * supp_qty > 3 * part_qty``). Scale: per-(part,supp) partial
    sums → per-part totals (two keyed aggs over the filtered semi-join);
    the qualifying supplier ids collapse to a distinct set far below
    |supplier| and the final decoration is a broadcast semi.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey")
    )
    pair = (
        li.select("l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("_qty"))
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("_qty").alias("_supp_qty"))
    )
    pair = tracked_persist(pair)  # feeds per-part totals AND the probe
    totals = pair.groupBy(F.col("l_partkey").alias("_tp")).agg(
        F.sum("_supp_qty").alias("_part_qty")
    )
    dominant = (
        pair.join(F.broadcast(totals), F.col("l_partkey") == F.col("_tp"))
        .filter(F.col("_supp_qty") * 10 > F.col("_part_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.select("s_suppkey", "s_name")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_suppkey")
    )


_Q20_SQL = """
WITH pair AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
totals AS (
  SELECT l_partkey AS tp, CAST(SUM(supp_qty) AS BIGINT) AS part_qty
  FROM pair GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM pair JOIN totals ON l_partkey = tp
    WHERE supp_qty * 10 > part_qty * 3
  )
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: on finished multi-supplier orders, the supplier
    who was the ONLY late one — the famous EXISTS (another supplier on
    the order) AND NOT EXISTS (another LATE supplier) double correlation.

    Decorrelation: both EXISTS collapse into ONE per-order aggregate —
    distinct supplier count and distinct LATE supplier count — then the
    late rows re-join that 2-register state. Late := shipped > 60 days
    after order date. Scale: lineitem shuffles once on orderkey for the
    per-order registers; the register table (≤|orders|) re-joins the
    late pairs on the same key (no new shuffle partitioning); the final
    per-supplier count is bounded by |supplier|.
    """
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        li.select("l_orderkey", "l_suppkey", F.col("l_shipdate").cast("date").alias("_ship_d"))
        .join(
            orders.select("o_orderkey", F.col("o_orderdate").cast("date").alias("_ord_d")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "_late", (F.datediff(F.col("_ship_d"), F.col("_ord_d")) > 60).cast("int")
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_supp_late"))
    )
    # The per-order registers ride a WINDOW over the key the pairs are
    # re-joined on (r13): the previous aggregate-then-self-rejoin shape
    # exchanged the pairs table by l_orderkey TWICE (once to build the
    # register table, once to probe it) and needed a persist to stop
    # the pair pipeline recomputing per branch; a count/sum window
    # partitioned by l_orderkey is the identical 2-register state from
    # ONE exchange, no self-join, no cache (guide §2.4: window keyed
    # like the preceding operation shares its partitioning).
    w = Window.partitionBy("l_orderkey")
    return (
        pairs.withColumn("_n_supp", F.count(F.lit(1)).over(w))
        .withColumn("_n_late", F.sum("_supp_late").over(w))
        .filter(
            (F.col("_supp_late") == 1)
            & (F.col("_n_supp") > 1)
            & (F.col("_n_late") == 1)
        )
        .join(
            F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


_Q21_SQL = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) > 60
                  THEN 1 ELSE 0 END) AS supp_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey AS ok, COUNT(*) AS n_supp, CAST(SUM(supp_late) AS BIGINT) AS n_late
  FROM pairs GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs
JOIN per_order ON l_orderkey = ok
JOIN supplier  ON l_suppkey = s_suppkey
WHERE supp_late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


register("tpch_q2_min_cost_supplier", tpch_q2_min_cost_supplier, _Q2_SQL)
register("tpch_q4_order_priority", tpch_q4_order_priority, _Q4_SQL)
register("tpch_q6_forecast_revenue", tpch_q6_forecast_revenue, _Q6_SQL)
register("tpch_q7_volume_shipping", tpch_q7_volume_shipping, _Q7_SQL)
register("tpch_q8_market_share", tpch_q8_market_share, _Q8_SQL)
register("tpch_q10_returned_items", tpch_q10_returned_items, _Q10_SQL)
register("tpch_q12_late_priority", tpch_q12_late_priority, _Q12_SQL)
register("tpch_q14_promo_effect", tpch_q14_promo_effect, _Q14_SQL)
register("tpch_q15_top_supplier", tpch_q15_top_supplier, _Q15_SQL)
register("tpch_q16_part_supplier_relation", tpch_q16_part_supplier_relation, _Q16_SQL)
register("tpch_q17_small_quantity", tpch_q17_small_quantity, _Q17_SQL)
register("tpch_q19_disjunctive_revenue", tpch_q19_disjunctive_revenue, _Q19_SQL)
register("tpch_q20_dominant_suppliers", tpch_q20_dominant_suppliers, _Q20_SQL)
register("tpch_q21_waiting_suppliers", tpch_q21_waiting_suppliers, _Q21_SQL)
