"""Tests for integer NTILE arithmetic, equi-depth length bins, and
ANN recall@k (operators/ids.py, preptext.py, similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.ids import ntile_from_rank
from yelp_data_engineering_pipeline_spark.operators.preptext import length_bins
from yelp_data_engineering_pipeline_spark.operators.similarity import recall_at_k


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL-standard NTILE: first n%k tiles get n//k+1 rows."""
    q, r = divmod(n, k)
    out = []
    for tile in range(1, k + 1):
        out.extend([tile] * ((q + 1) if tile <= r else q))
    return out


def test_ntile_from_rank_matches_sql_semantics(spark):
    for n, k in [(1, 4), (3, 4), (8, 4), (10, 3), (7, 7), (20, 6)]:
        df = spark.range(1, n + 1).select((F.col("id")).alias("rank"))
        got = [
            r.tile
            for r in df.select(ntile_from_rank(F.col("rank"), n, k).alias("tile"))
            .orderBy("rank")
            .collect()
        ]
        assert got == _ntile_reference(n, k), f"n={n} k={k}: {got}"


def test_length_bins_equi_depth(spark):
    docs = spark.createDataFrame(
        [(i, 1000 - i) for i in range(12)], "doc_id long, n_chars long"
    )
    out = length_bins(docs, 4, "n_chars", "doc_id")
    sizes = {r.bin: r.cnt for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sizes == {1: 3, 2: 3, 3: 3, 4: 3}
    # shortest docs land in bin 1
    b1 = {r.doc_id for r in out.filter(F.col("bin") == 1).collect()}
    assert b1 == {11, 10, 9}


def test_recall_at_k_counts_overlap(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 55), (2, 56)], "query_id long, neighbor_id long"
    )
    rows = {r.query_id: r for r in recall_at_k(exact, approx, k=2).collect()}
    assert rows[1].n_hits == 1 and rows[1].recall_at_2 == 0.5
    assert rows[2].n_hits == 0 and rows[2].recall_at_2 == 0.0
