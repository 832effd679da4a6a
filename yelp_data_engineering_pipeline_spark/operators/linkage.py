"""Entity resolution: blocked fuzzy self-join (record linkage).

The standard two-phase shape — cheap BLOCKING key to bound the pair
space (never |rows|² — same principle as the LSH band join in
dedup.py), then an exact edit-distance verify inside each block:

    block key → equi-join (shuffle bounded by block sizes)
              → levenshtein ≤ k filter (JVM expression, no Python)

At 100 TB the only scale risk is a hot block (every record sharing one
token): AQE skew-join splitting covers the join itself, and
diag_key_skew (salting.py) is the pre-flight that finds blocks worth
refining with a second blocking token.

levenshtein is JVM built-in in Spark and native in DuckDB with
identical unit-cost edit-distance semantics — oracle-parity-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load


def fuzzy_self_join_blocked(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_dist: int,
) -> DataFrame:
    """(id_a, id_b, block, dist) for distinct pairs sharing a block key
    with levenshtein(name_a, name_b) <= max_dist."""
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        block_expr.alias("block"),
    )
    a = side.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "block"
    )
    b = side.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        # length band: |len(a)-len(b)| <= k is NECESSARY for lev <= k —
        # a one-instruction prune before the O(len²) edit distance
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        # 3-arg levenshtein computes a BOUNDED distance (early-exits the
        # DP once > threshold; returns -1 above it) — equal to the exact
        # distance whenever it is <= max_dist, so oracle-identical
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist)
        )
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "block", "dist")
    )


def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names (catalog dedup): block on the last
    name token, verify with edit distance ≤ 2, and emit the per-(block,
    dist) match census. The synthetic part names draw from a tiny color
    vocabulary, so raw pair output is inherently near-quadratic (5.5M
    rows at sf0.1) — the row-level pairs stay available via
    :func:`fuzzy_self_join_blocked`; the catalog entry returns the
    bounded aggregate a linkage run actually reports."""
    part = load(spark, sf_dir, "part")
    pairs = fuzzy_self_join_blocked(
        part,
        "p_partkey",
        "p_name",
        F.regexp_extract(F.col("p_name"), r"(\S+)$", 1),
        max_dist=2,
    )
    return pairs.groupBy("block", "dist").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id_a").alias("example_id"),
    )


register(
    "join_fuzzy_blocked",
    join_fuzzy_blocked,
    r"""
    WITH side AS (
      SELECT p_partkey AS id, p_name AS name,
             regexp_extract(p_name, '(\S+)$', 1) AS block
      FROM part
    ),
    pairs AS (
      SELECT a.id AS id_a, a.block AS block,
             CAST(levenshtein(a.name, b.name) AS INT) AS dist
      FROM side a JOIN side b USING (block)
      WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 2
    )
    SELECT block, dist, COUNT(*) AS n_pairs, MIN(id_a) AS example_id
    FROM pairs GROUP BY block, dist
    """,
)
