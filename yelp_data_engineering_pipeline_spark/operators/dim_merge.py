"""Batch dimension merge — set-oriented ``get_or_create`` (SURVEY.md §2.3 J5).

The reference resolves every dimension value with a per-row SELECT →
INSERT-if-absent → flush (N+1 round trips,
/root/reference/database/parse_and_upload_to_db.py:31-47, call sites
:103-164). The Spark-native re-expression is one set-oriented dataflow:

    novel  = incoming.distinct() ANTI JOIN existing ON name
    merged = existing UNION (novel with ids = max(existing.id) + row_number)

Scale posture:
- ``incoming.distinct()`` is a map-side-partial hash aggregate: the
  shuffle carries only distinct names (dimension cardinality, not fact
  cardinality).
- the anti join broadcasts ``existing`` when it is dimension-sized.
- the row_number over novel names is a single-partition window, safe
  because *novel dimension values per batch* is small by definition
  (categories/weekdays/amenities...). For a pathological dimension
  (millions of novel values), swap in zipWithIndex-style two-phase id
  assignment: per-partition counts → offset scan — noted, not needed here.
- attaching FKs back to facts is a broadcast inner join on name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_dimension(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Merge ``incoming`` (single column ``name``) into ``existing``
    (``id`` bigint, ``name``); returns the updated dimension with stable
    ids for existing names and dense new ids for novel names.
    """
    novel = (
        incoming.select("name")
        .distinct()
        .join(F.broadcast(existing.select("name")), "name", "left_anti")
    )
    max_id = existing.agg(F.coalesce(F.max("id"), F.lit(0)).alias("m"))
    w = Window.orderBy("name")
    new_rows = (
        novel.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .crossJoin(F.broadcast(max_id))
        .select((F.col("m") + F.col("rn")).alias("id"), "name")
    )
    return existing.select("id", "name").unionByName(new_rows)


def attach_fk(facts: DataFrame, dim: DataFrame, name_col: str, fk_col: str) -> DataFrame:
    """Replace a natural-key column with the dimension's surrogate id
    via broadcast join (the read-side half of get_or_create)."""
    lookup = dim.select(F.col("name").alias(name_col), F.col("id").alias(fk_col))
    return facts.join(F.broadcast(lookup), name_col, "inner").drop(name_col)
