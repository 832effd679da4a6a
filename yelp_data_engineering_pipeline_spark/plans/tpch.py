"""Classic TPC-H-pattern analytics over the synthetic star schema.

The reference pipeline's query surface (SURVEY.md §2.3/§2.4) is
join+aggregate shaped; these three canonical decision-support queries
exercise the same operator families at their hardest — wide scans with
selective date predicates, multi-way fact⋈dim joins, and grouped money
arithmetic — and serve as the engine's "would a warehouse user trust
this" smoke suite (TPC-H spec is public; queries adapted to the columns
the synthetic schema actually has).

Parity discipline (see catalog module docstring): money lives on the
cents grid and discount/tax on the 1e-2 grid, so every aggregate here
is computed in INTEGER units (cents, 1e-4 "discounted cents",
1e-6 "charged cents") and divided back to doubles exactly once at the
end. Integer sums are order-independent — bit-exact vs DuckDB under any
partitioning — where double sums are not (a lesson encoded in
MEMORY/duckdb-spark-parity-rules).

Scale posture:
- Date predicates are `cast(date)` comparisons on the scan column →
  pushed into the parquet reader (min/max row-group pruning).
- q1 aggregates to ≤ 6 groups → map-side partial agg, tiny shuffle.
- q3/q9 join facts on their natural keys (AQE picks the physical
  join + splits skew); `nation` is broadcast (bounded 25 rows).
- At 100 TB the BIGINT "charge" sums stay < 2^63 up to ~10^12
  lineitems per group; past that, swap the unit columns to
  DECIMAL(38,0) — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .catalog import register

# ---------------------------------------------------------------------------
# Integer money units (shared by all three queries)
# ---------------------------------------------------------------------------


def _cents(col: str) -> Column:
    """Price on the cents grid → exact BIGINT cents."""
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> Column:
    """0.01-grid rate (discount/tax) → exact BIGINT percent."""
    return F.round(F.col(col) * 100).cast("long")


# l_extendedprice*(1-l_discount) in 1e-4 units: ep_cents * (100 - d_pct)
_DISC_UNITS = "_ep_c * (100 - _d_p)"
# *(1+l_tax) in 1e-6 units
_CHARGE_UNITS = "_ep_c * (100 - _d_p) * (100 + _t_p)"


def _li_units(li: DataFrame) -> DataFrame:
    return li.withColumns(
        {
            "_ep_c": _cents("l_extendedprice"),
            "_d_p": _pct("l_discount"),
            "_t_p": _pct("l_tax"),
        }
    )


# SQL fragment mirror (DuckDB): identical integer units.
_SQL_UNITS = """
  CAST(round(l_extendedprice * 100) AS BIGINT) AS _ep_c,
  CAST(round(l_discount * 100) AS BIGINT) AS _d_p,
  CAST(round(l_tax * 100) AS BIGINT) AS _t_p
"""


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one selective scan, 6-group hash aggregate.

    All sums run in integer units; the single trailing division per
    column is one IEEE op on identical operands in both engines.
    Averages are SUM/COUNT of integers (never ROUND(AVG) — boundary
    trap), matching the oracle token-for-token.
    """
    li = _li_units(load(spark, sf_dir, "lineitem"))
    li = li.filter(F.col("l_shipdate").cast("date") <= F.lit("2000-12-01"))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum("_ep_c") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(F.expr(_DISC_UNITS)) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(F.expr(_CHARGE_UNITS)) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("long")).cast("double") / cnt).alias("avg_qty"),
            (F.sum("_ep_c") / F.lit(100.0) / cnt).alias("avg_price"),
            (F.sum("_d_p") / F.lit(100.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
WITH u AS (
  SELECT l_returnflag, l_linestatus, l_quantity, {_SQL_UNITS}
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
)
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(_ep_c) AS BIGINT) / 100.0 AS sum_base_price,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS sum_disc_price,
  CAST(SUM({_CHARGE_UNITS}) AS BIGINT) / 1000000.0 AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(_ep_c) AS BIGINT) / 100.0 / COUNT(*) AS avg_price,
  CAST(SUM(_d_p) AS BIGINT) / 100.0 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM u
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3 — shipping priority (top unshipped orders by revenue)
# ---------------------------------------------------------------------------


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    grouped revenue, total-ordered top 10.

    The synthetic orders table has o_orderpriority (no o_shippriority);
    dates are emitted as ISO strings (tz-free — timestamp-typed output
    renders through the session tz and is hash-unstable; see
    MEMORY/duckdb-spark-parity-rules).
    """
    cutoff = "1998-01-01"
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate").cast("date") < F.lit(cutoff))
    li = _li_units(load(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate").cast("date") > F.lit(cutoff)
    )
    return (
        li.select("l_orderkey", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg((F.sum("_rev_u") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
WITH u AS (
  SELECT l_orderkey, {_SQL_UNITS}
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) > DATE '1998-01-01'
)
SELECT
  l_orderkey,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
  o_orderpriority,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS revenue
FROM u
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q9 — nation/year profit for a product line
# ---------------------------------------------------------------------------


def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit =
    discounted revenue): part-filtered 4-way join rolled up to
    (supplier nation, order year).

    `part` is filtered before the join (selective predicate pushed to
    its scan) and `nation` is broadcast; the fact-fact joins stay on
    natural keys for AQE to plan.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = _li_units(load(spark, sf_dir, "lineitem"))
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey", F.expr(_DISC_UNITS).alias("_amt_u"))
        .join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(sup.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg((F.sum("_amt_u") / F.lit(10000.0)).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q9_SQL = f"""
WITH u AS (
  SELECT l_orderkey, l_partkey, l_suppkey, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  n_name AS nation,
  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS profit
FROM u
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(CAST(o_orderdate AS DATE))
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (region-filtered 6-way join)
# ---------------------------------------------------------------------------


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the ordering customer and
    the supplying supplier share a nation, restricted to one region.

    The distinguishing feature vs Q9 is the SECOND equi-condition
    ``c_nationkey = s_nationkey`` — it rides on the same join row, so it
    plans as a post-join residual filter, not an extra shuffle. Both
    ``nation`` and ``region`` are bounded dims → broadcast; the region
    filter prunes nations BEFORE the broadcast, so the fact side is
    filtered by the hash-join probe itself at scan speed.
    """
    cutoff_lo, cutoff_hi = "1996-01-01", "1997-01-01"
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # prune the nation dim to the region up front (5x25 broadcast join)
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit(cutoff_lo))
        & (F.col("o_orderdate").cast("date") < F.lit(cutoff_hi))
    )
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    li = _li_units(load(spark, sf_dir, "lineitem"))
    return (
        li.select("l_orderkey", "l_suppkey", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            sup.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum("_rev_u") / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


_Q5_SQL = f"""
WITH u AS (
  SELECT l_orderkey, l_suppkey, {_SQL_UNITS}
  FROM lineitem
)
SELECT
  n_name AS nation,
  CAST(SUM({_DISC_UNITS}) AS BIGINT) / 10000.0 AS revenue
FROM u
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, nation
"""


# ---------------------------------------------------------------------------
# Q13 — customer distribution (outer-join count histogram)
# ---------------------------------------------------------------------------


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts INCLUDING
    zero-order customers — the left-outer + count(col) + re-group double
    aggregation.

    All-integer arithmetic → exact under any partitioning. Scale: first
    agg shuffles on c_custkey (high cardinality, well distributed),
    second on c_count (bounded by max orders/customer — tiny). The
    filtered orders side prunes before the join.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING on aggregate, join back to detail)
# ---------------------------------------------------------------------------


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    decorated with customer detail — aggregate-then-filter (HAVING), then
    the tiny survivor set joins back to the dimension rows.

    Scale: the heavy agg happens FIRST on l_orderkey (map-side partial
    sums shrink the shuffle), the > 250 filter passes ~1% of orders, and
    AQE converts the survivors⋈orders/customer joins to broadcasts at
    runtime. o_orderdate goes out as an ISO string (tz-free), totalprice
    re-gridded to cents for hash parity.
    """
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            (_cents("o_totalprice") / F.lit(100.0)).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) > 250
)
SELECT
  c_name,
  c_custkey,
  l_orderkey AS o_orderkey,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
  CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
  total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# Q11 — important part types (HAVING vs a scalar global total)
# ---------------------------------------------------------------------------


def tpch_q11_important_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose aggregate exceeds a FRACTION of the
    global aggregate — the scalar-subquery HAVING that decorrelates into
    a broadcast of one total row.

    Parity hard point: ``sum > total/50`` in doubles is a boundary trap
    and ``total/50`` in DuckDB integer division is `//` not `/` — so the
    comparison is cross-multiplied into pure BIGINT terms
    (``50*sum > total``), exact in both engines. Scale: per-type partial
    aggs shuffle ~|p_type| rows; the global total is ONE row crossJoined
    as a broadcast — no second pass over the fact table.
    """
    li = _li_units(load(spark, sf_dir, "lineitem"))
    part = load(spark, sf_dir, "part")
    from ..cache import tracked_persist

    per_type = (
        li.select("l_partkey", F.expr(_DISC_UNITS).alias("_rev_u"))
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.sum("_rev_u").alias("_type_u"))
    )
    # both the HAVING probe and the scalar total hang off per_type —
    # persist the tiny grouped result so the fact join+agg runs ONCE
    per_type = tracked_persist(per_type)
    total = per_type.agg(F.sum("_type_u").alias("_total_u"))
    return (
        per_type.crossJoin(F.broadcast(total))
        .filter(F.col("_type_u") * 50 > F.col("_total_u"))
        .select("p_type", (F.col("_type_u") / F.lit(10000.0)).alias("value"))
        .orderBy(F.col("value").desc(), "p_type")
    )


_Q11_SQL = f"""
WITH u AS (
  SELECT l_partkey, {_SQL_UNITS}
  FROM lineitem
),
per_type AS (
  SELECT p_type, CAST(SUM({_DISC_UNITS}) AS BIGINT) AS type_u
  FROM u JOIN part ON l_partkey = p_partkey
  GROUP BY p_type
)
SELECT p_type, type_u / 10000.0 AS value
FROM per_type
WHERE type_u * 50 > (SELECT CAST(SUM(type_u) AS BIGINT) FROM per_type)
ORDER BY value DESC, p_type
"""


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar avg + anti join)
# ---------------------------------------------------------------------------


def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance beats the global average
    of positive balances AND who placed no orders — scalar-subquery
    filter plus NOT EXISTS anti-join, rolled up per nation.

    The average compare is cross-multiplied to integers
    (``bal_cents * n > sum_cents``) because an AVG of doubles is
    order-dependent and engine-divergent on ties. Anti join shuffles on
    custkey; the 1-row average broadcasts.
    """
    cust = load(spark, sf_dir, "customer")
    # "dormant" = no orders since the cutoff (an unrestricted NOT EXISTS
    # is empty on this schema — every customer has SOME order)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01")
    )
    c = cust.select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("_bal_c")
    )
    pos = c.filter(F.col("_bal_c") > 0).agg(
        F.sum("_bal_c").alias("_sum_c"), F.count(F.lit(1)).alias("_n")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("_bal_c") * F.col("_n") > F.col("_sum_c"))
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("_bal_c") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
WITH c AS (
  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
avgpos AS (
  SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c, COUNT(*) AS n FROM c WHERE bal_c > 0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) / 100.0 AS totacctbal
FROM c, avgpos
WHERE bal_c * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


register("tpch_q1_pricing_summary", tpch_q1_pricing_summary, _Q1_SQL)
register("tpch_q3_shipping_priority", tpch_q3_shipping_priority, _Q3_SQL)
register("tpch_q5_local_supplier_volume", tpch_q5_local_supplier_volume, _Q5_SQL)
register("tpch_q9_nation_profit", tpch_q9_nation_profit, _Q9_SQL)
register("tpch_q11_important_types", tpch_q11_important_types, _Q11_SQL)
register("tpch_q13_customer_distribution", tpch_q13_customer_distribution, _Q13_SQL)
register("tpch_q18_large_orders", tpch_q18_large_orders, _Q18_SQL)
register("tpch_q22_dormant_customers", tpch_q22_dormant_customers, _Q22_SQL)
