"""Similarity search over embedding columns (extension, BASELINE.json).

Two paths:
- ``topk_bruteforce`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, compute map-side, per-group top-k via window.
  At 100 TB the corpus side stays partitioned and never shuffles; the
  only shuffle is the per-query top-k (rows ≈ |corpus| × |queries| is
  avoided by aggregating top-k per partition first when k is small —
  AQE handles the final merge; for huge query sets use the LSH path).
- ``topk_lsh_buckets`` — LSH-bucketed ANN: bucket every vector by the
  sign pattern of its first ``n_planes`` coordinates (axis-aligned
  hyperplanes — deterministic, engine-portable; swap in random
  hyperplanes via a broadcast plane matrix for production use), then
  equi-join query↔corpus on bucket and rank within bucket. The
  crossJoin becomes a hash join on bucket → shuffle bounded by bucket
  sizes; skewed buckets are split by AQE.

All arithmetic is JVM-side higher-order functions (zip_with/aggregate)
in double precision — no Python UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..plans.catalog import register


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def sign_bucket(vec: Column, n_planes: int) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of the first
    n_planes coordinates."""
    bits = [F.when(F.try_element_at(vec, F.lit(i + 1)) >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(n_planes)]
    return F.concat(*bits)


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k. ``queries``/``corpus``: (vec_id, embedding).

    Cosine is rounded to 4 decimals BEFORE ranking so ordering is stable
    across engines (ties broken by neighbor id).
    """
    from pyspark.sql import Window

    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def topk_lsh_buckets(queries: DataFrame, corpus: DataFrame, k: int, n_planes: int = 8) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket."""
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        sign_bucket(F.col("embedding"), n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        sign_bucket(F.col("embedding"), n_planes).alias("bucket"),
    )
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(F.col("rk") <= k)


# ---------------------------------------------------------------------------
# Catalog entries + DuckDB oracles
# ---------------------------------------------------------------------------

_COS_SQL = """
    ROUND(
      list_sum(list_transform(range(1, len({a}) + 1),
               i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      4)
"""


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return topk_bruteforce(emb.filter(F.col("vec_id") < 10), emb, k=5)


register(
    "similarity_topk_bruteforce",
    similarity_topk_bruteforce,
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             {_COS_SQL.format(a='q_emb', b='e.embedding')} AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM pairs
    ) WHERE rk <= 5
    """,
)


_BUCKET_SQL = (
    "concat("
    + ", ".join(f"CASE WHEN {{v}}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(8))
    + ")"
)


def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return topk_lsh_buckets(emb.filter(F.col("vec_id") < 10), emb, k=5, n_planes=8)


register(
    "similarity_topk_lsh",
    similarity_topk_lsh,
    f"""
    WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL.format(v='embedding')} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM b WHERE vec_id < 10),
    pairs AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             {_COS_SQL.format(a='q_emb', b='c.embedding')} AS cos_sim
      FROM q JOIN b c USING (bucket)
      WHERE c.vec_id != query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM pairs
    ) WHERE rk <= 5
    """,
)
