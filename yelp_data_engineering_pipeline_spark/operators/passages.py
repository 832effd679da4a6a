"""Passage-level (sub-document) deduplication: remove duplicated
passages ACROSS documents, keeping each passage's first corpus
occurrence, and reconstruct the pruned documents.

Doc-level dedup (operators/dedup.py) drops whole near-identical
documents; training corpora ALSO carry passage-level duplication —
boilerplate, quoted fragments, syndicated paragraphs — inside otherwise
distinct documents (the motivation for suffix-level dedup in
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022, arXiv:2107.06499). This operator is the fixed-width-window
formulation of that idea: the corpus is cut into non-overlapping
W-word passages, a passage kept iff it is the FIRST occurrence
(min (doc_id, position)) of its content corpus-wide, and each document
is re-assembled from its surviving passages.

Scale posture: explode is map-side (passage count = total words / W);
ownership is ONE hash shuffle keyed by passage content; the instance
join-back rides the same key; reconstruction is one doc-keyed shuffle.
Per-doc state is bounded by doc length. No pairwise comparisons — the
cost is O(corpus words), not O(docs²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..partitioning import widen_for_compute
from ..plans.catalog import register
from ..tables import load

_W = 20  # words per passage window


def passage_instances(docs: DataFrame, width: int = _W) -> DataFrame:
    """Explode documents into (doc_id, pos, passage) non-overlapping
    word windows; the trailing short window is kept (it is content)."""
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    # integer ceil-div (mirrored in the oracle; float ceil is a parity trap)
    n_pass = F.expr(f"(size(w) + {width - 1}) div {width}").cast("int")
    return (
        docs.select("doc_id", words.alias("w"))
        .filter(F.size("w") > 0)
        .select("doc_id", "w", F.explode(F.sequence(F.lit(0), n_pass - 1)).alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.array_join(F.slice("w", F.col("pos") * width + 1, width), " ").alias("passage"),
        )
    )


def prune_duplicate_passages(docs: DataFrame, width: int = _W) -> DataFrame:
    """Corpus-wide passage dedup: first occurrence (by doc_id, then
    position) owns the content; later occurrences are dropped; documents
    are re-assembled from surviving passages in order."""
    inst = passage_instances(docs, width)
    w = Window.partitionBy(F.md5("passage")).orderBy("doc_id", "pos")
    kept = inst.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(F.array_sort(F.collect_list(F.struct("pos", "passage"))).passage, " ")
        .alias("kept_text"),
    )
    totals = inst.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_passages"))
    return (
        totals.join(rebuilt, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_passages",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


def dedup_passage_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prune_duplicate_passages(widen_for_compute(load(spark, sf_dir, "documents")))


register(
    "dedup_passage_prune",
    dedup_passage_prune,
    f"""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ),
    sched AS (
      SELECT doc_id, w, unnest(range((len(w) + {_W - 1}) // {_W})) AS p
      FROM words
      WHERE len(w) > 0
    ),
    inst AS (
      SELECT doc_id, CAST(p AS INT) AS pos,
             array_to_string(w[p * {_W} + 1 : p * {_W} + {_W}], ' ') AS passage
      FROM sched
    ),
    ranked AS (
      SELECT doc_id, pos, passage,
             ROW_NUMBER() OVER (PARTITION BY md5(passage) ORDER BY doc_id, pos) AS rn
      FROM inst
    ),
    rebuilt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(passage, ' ' ORDER BY pos) AS kept_text
      FROM ranked WHERE rn = 1
      GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages FROM inst GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_passages,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.kept_text, '') AS kept_text
    FROM totals t LEFT OUTER JOIN rebuilt r ON t.doc_id = r.doc_id
    ORDER BY t.doc_id
    """,
)
