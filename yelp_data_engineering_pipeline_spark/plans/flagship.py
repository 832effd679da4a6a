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

    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev")
    return (
        lineitem.select("l_orderkey", revenue)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            # rev terms live on a 1e-4 grid → round 4 keeps both engines
            # on the same grid point (round 2 could hit a x.xx50 boundary).
            F.round(F.sum("rev"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
