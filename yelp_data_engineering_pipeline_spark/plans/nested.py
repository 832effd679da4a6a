"""Nested-data catalog: explode / zip / re-nest (SURVEY.md §2.8).

The reference's stage 2 turns nested arrays into child-table rows with
per-row python loops (parse_and_upload_to_db.py:89-173); the Spark
equivalents are generate-explode plans (no shuffle at all for the
explode itself — it's a narrow transformation; only downstream
aggregates shuffle, and those carry pre-aggregated partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .catalog import register


# --- N2-N4 shape: explode array → dim-style aggregate ---------------------------
# (parse_and_upload_to_db.py:120-157: explode food_category / terms /
# highlights then count into dims)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    return (
        doc.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(
    "explode_word_counts",
    explode_word_counts,
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY word
    """,
)


# --- N1/N5 shape: zip two extracted arrays → explode structs ---------------------
# (parse_and_upload_to_db.py:76 + :109-111: two regex groups zipped into
# (open, close) tuples, exploded to rows; pads with NULL like list_zip)
def explode_zip_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    s_words = F.regexp_extract_all(F.col("text"), F.lit(r"\b(s\w+)\b"), 1)
    t_words = F.regexp_extract_all(F.col("text"), F.lit(r"\b(t\w+)\b"), 1)
    zipped = F.zip_with(s_words, t_words, lambda a, b: F.struct(a.alias("s"), b.alias("t")))
    return (
        doc.select("doc_id", F.posexplode(zipped).alias("pos", "pair"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("idx"),
            F.col("pair.s").alias("s_word"),
            F.col("pair.t").alias("t_word"),
        )
    )


register(
    "explode_zip_pairs",
    explode_zip_pairs,
    r"""
    SELECT doc_id,
           CAST(u.idx AS INT) AS idx,
           u.pair[1] AS s_word,
           u.pair[2] AS t_word
    FROM (
      SELECT doc_id,
             generate_subscripts(zipped, 1) AS idx,
             unnest(zipped) AS pair
      FROM (
        SELECT doc_id,
               list_zip(regexp_extract_all(text, '\b(s\w+)\b', 1),
                        regexp_extract_all(text, '\b(t\w+)\b', 1)) AS zipped
        FROM documents
      )
    ) u
    WHERE u.pair IS NOT NULL
    """,
)


# --- N6 inverse: re-nest rows into sorted arrays ---------------------------------
# (web_scraping.py:270: rows → list of structs; here collect_list +
# array_sort, serialized with array_join for engine-portable hashing)
def collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load(spark, sf_dir, "documents")
    return (
        doc.groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_list(F.col("doc_id").cast("string"))), ",").alias("doc_ids"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


register(
    "collect_sorted_list",
    collect_sorted_list,
    """
    SELECT lang,
           array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',') AS doc_ids,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)


# --- higher-order array functions (extension; used by similarity ops) -------------
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    sq_sum = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    n_pos = F.size(F.filter(vec, lambda x: x > 0))
    # double→string formatting differs across engines (Spark: 1.0E-4,
    # DuckDB: 0.0001) — serialize via fixed-scale decimal on both sides.
    doubled_head = F.transform(
        F.slice(vec, 1, 4), lambda x: (x.cast("double") * 2).cast("decimal(14,4)").cast("string")
    )
    return emb.select(
        "vec_id",
        F.round(sq_sum, 4).alias("sq_norm"),
        n_pos.alias("n_positive"),
        F.array_join(doubled_head, ",").alias("doubled_head"),
    )


register(
    "array_higher_order",
    array_higher_order,
    """
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           array_to_string(list_transform(embedding[1:4],
                           x -> CAST(CAST(CAST(x AS DOUBLE) * 2 AS DECIMAL(14,4)) AS VARCHAR)), ',') AS doubled_head
    FROM embeddings
    """,
)
