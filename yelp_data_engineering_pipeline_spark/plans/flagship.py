"""Flagship query: revenue per nation (driver smoke check).

Shape: fact ⋈ fact ⋈ dim ⋈ dim → groupBy → agg → sort → limit — the
J1/A1/W1 skeleton from SURVEY.md §2 (reference query pattern at
/root/reference/database/app.py:66-82, generalized to the synthetic
star schema).

Scale posture:
- ``nation`` (25 rows, bounded) is broadcast explicitly — no shuffle
  for that join at any scale factor.
- ``lineitem ⋈ orders`` and ``orders ⋈ customer`` are key-equi joins;
  Catalyst/AQE picks sort-merge vs shuffled-hash by stats, with skew
  splitting enabled in the session factory.
- The aggregate is a hash aggregate with map-side partial aggregation
  (25 groups → tiny shuffle regardless of input size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    # Engine-stable at ANY scale: l_extendedprice has 2 decimals and
    # l_discount 2, so cents = round(price*100) and bp = round(disc*100)
    # are exact integers; rev_micro = cents*(100-bp) is an exact BIGINT
    # per row (units of 1e-4 dollars) and the SUM is an exact integer —
    # order-free, so Spark's partial-aggregate tree and DuckDB's serial
    # sum agree bit-for-bit. A double formulation diverged by ~2 ulps at
    # the x100 tier (60M rows, sum ~1.1e15 micro-units) from summation
    # order alone. One division at the end lands both engines on the
    # identical nearest double.
    rev_micro = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (F.lit(100).cast("long") - F.round(F.col("l_discount") * 100, 0).cast("long"))
    ).alias("rev_micro")
    return (
        lineitem.select("l_orderkey", rev_micro)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum("rev_micro") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT
  n_name,
  SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
      * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) / 10000.0 AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
