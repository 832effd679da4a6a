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


# ---------------------------------------------------------------------------
# Skew diagnostics (the measurement half: find the keys worth salting)
# ---------------------------------------------------------------------------


def key_skew_profile(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Top-``top_n`` heaviest keys with their share of a perfectly even
    distribution: skew_x = cnt · n_keys / total (1.0 = even; the
    threshold AQE uses for skew-join splitting is ~5× median — keys
    showing up here with large skew_x are the salting candidates).

    Shape: one hash-agg keyed by ``key`` (partial agg collapses
    map-side), one bounded-cardinality stats agg crossed back in as a
    broadcast literal row. The top-n is ``orderBy().limit()`` — Spark
    plans that as TakeOrderedAndProject (per-partition top-n, merged on
    the driver), NOT a single-partition global window; the only window
    here ranks the ≤ top_n survivors. skew_x is an exact-int ratio —
    engine-portable without rounding.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc(key)).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc(key))  # over ≤ top_n rows
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rk", F.row_number().over(w))
        .select(
            key,
            "cnt",
            "n_keys",
            "total_rows",
            (F.col("cnt").cast("double") * F.col("n_keys") / F.col("total_rows")).alias(
                "skew_x"
            ),
            "rk",
        )
    )


def _register_diag() -> None:
    from ..plans.catalog import register
    from ..tables import load

    def diag_key_skew(spark, sf_dir: str) -> DataFrame:
        return key_skew_profile(load(spark, sf_dir, "orders"), "o_custkey")

    register(
        "diag_key_skew",
        diag_key_skew,
        """
        WITH counts AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey),
        stats AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows FROM counts)
        SELECT o_custkey, cnt, n_keys, total_rows,
               CAST(cnt AS DOUBLE) * n_keys / total_rows AS skew_x, rk
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, o_custkey ASC) AS rk
          FROM counts CROSS JOIN stats
        ) WHERE rk <= 5
        """,
    )


_register_diag()


# ---------------------------------------------------------------------------
# Hot/cold hybrid skew join (the surgical alternative to full salting)
# ---------------------------------------------------------------------------


def hybrid_skew_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    hot_factor: float = 1.5,
) -> DataFrame:
    """Inner equi-join identical to ``big.join(dim, big_key == dim_key)``
    but with hot keys routed around the shuffle join.

    The skew problem at 100 TB: a handful of keys own a large share of
    the fact side, so a plain shuffle join leaves a few reducers with
    most of the data. Full salting (``salted_join``) replicates the
    ENTIRE dim n_salts ways; the hybrid split replicates NOTHING — it
    broadcasts only the dim rows of the hot keys:

    1. one hash-agg over the fact side finds keys with
       cnt > hot_factor * mean (data-derived, no driver collect — the
       hot set stays a DataFrame and reaches both sides as broadcast
       semi/anti joins; by the definition of skew it is small);
    2. hot fact rows  ⋈  broadcast(dim ⋉ hot_keys)   — map-side, no
       shuffle of the heavy keys at all;
    3. cold fact rows ⋈  dim                         — the shuffle join,
       now skew-free by construction;
    4. union. Row-for-row equal to the plain join for ANY hot set, so
       the threshold is a pure performance knob (the oracle is the
       plain join). This is what AQE's skew-split does at runtime;
       the explicit operator exists for engines/paths where AQE can't
       see the skew (e.g. streaming micro-batches, bucketed tables).
    """
    counts = big.groupBy(big_key).agg(F.count(F.lit(1)).alias("_cnt"))
    mean = counts.agg(F.avg("_cnt").alias("_mean"))
    hot_keys = (
        counts.crossJoin(F.broadcast(mean))
        .filter(F.col("_cnt") > F.col("_mean") * hot_factor)
        .select(big_key)
    )
    cond = F.col(big_key) == F.col(dim_key)
    big_hot = big.join(F.broadcast(hot_keys), big_key, "semi")
    big_cold = big.join(F.broadcast(hot_keys), big_key, "anti")
    dim_hot = dim.join(
        F.broadcast(hot_keys.withColumnRenamed(big_key, dim_key)), dim_key, "semi"
    )
    return big_hot.join(F.broadcast(dim_hot), cond).unionByName(
        big_cold.join(dim, cond)
    )


def _register_hybrid() -> None:
    from ..plans.catalog import register
    from ..tables import load

    def join_skew_hybrid(spark, sf_dir: str) -> DataFrame:
        """events ⋈ customer on user_id = c_custkey via the hybrid
        route, aggregated per market segment. Oracle is the PLAIN join —
        proving the split+union is semantics-preserving."""
        ev = load(spark, sf_dir, "events")
        cust = load(spark, sf_dir, "customer")
        # 1.2x mean: non-vacuous hot sets at every driver SF
        # (1 / 9 / 83 hot keys at sf0.001 / 0.01 / 0.1) so BOTH route
        # branches carry rows through the external differential.
        joined = hybrid_skew_join(ev, cust, "user_id", "c_custkey", hot_factor=1.2)
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )

    register(
        "join_skew_hybrid",
        join_skew_hybrid,
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment
        """,
    )


_register_hybrid()
