"""Skew mitigation: salted aggregation and salted broadcast-side join
(the manual levers beneath AQE's automatic skew-join splitting).

When one key holds a disproportionate share of rows (a viral business,
a null-ish default), the shuffle partition holding it becomes the
straggler. Two standard remedies, both semantics-preserving:

- **salted two-phase aggregation**: groupBy(key, salt) partial →
  groupBy(key) final. The hot key's rows spread over ``n_salts``
  reducers; the second aggregate touches only n_salts rows per key.
- **replicated (salted) join**: explode the *small* side n_salts ways,
  salt the big side, equi-join on (key, salt) — every reducer gets an
  even slice of the hot key.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins automatically; these operators are for aggregations and for
forcing even layout when AQE can't see the skew (e.g. first shuffle of
a stage).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase sum with salting — result identical to
    ``df.groupBy(keys).agg(sum(value_col))``."""
    salted = df.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value_col).alias("_part"))
    return partial.groupBy(*keys).agg(F.sum("_part").alias(f"sum_{value_col}"))


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16
) -> DataFrame:
    salted = df.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_part"))
    return partial.groupBy(*keys).agg(F.sum("_part").alias("n"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Inner equi-join with the small side replicated n_salts ways —
    result identical to ``big.join(small, key)``."""
    big_s = big.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


# --- catalog entry: salted aggregation equals the plain aggregate -------------
def agg_salted_groupby(spark, sf_dir):
    """Driver-checkable proof the two-phase salted aggregation is
    semantics-preserving: salted sum+count vs DuckDB's plain GROUP BY.
    Parity note: l_quantity sits on the cents grid, so partial sums are
    EXACT doubles and the two-phase summation order cannot drift."""
    from ..tables import load

    li = load(spark, sf_dir, "lineitem")
    s = salted_sum(li, ["l_returnflag"], "l_quantity")
    c = salted_count(li, ["l_returnflag"])
    return s.join(c, "l_returnflag").select(
        "l_returnflag",
        F.round(F.col("sum_l_quantity"), 2).alias("sum_qty"),
        "n",
    )


def _register() -> None:
    from ..plans.catalog import register

    register(
        "agg_salted_groupby",
        agg_salted_groupby,
        """
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        """,
    )


_register()
