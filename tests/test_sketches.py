"""Count-min sketch: over-estimate invariant, sketch size bound,
heavy-hitter ranking (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_heavy_hitters,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_estimate_never_underestimates_and_ranks_heavy_hitter(spark):
    corpus = _docs(
        spark,
        [(1, "apple apple apple banana"), (2, "apple cherry banana banana banana banana")],
    )
    out = {r.word: (r.est_n, r.exact_n) for r in cms_heavy_hitters(corpus, k=10).collect()}
    assert set(out) == {"apple", "banana", "cherry"}
    for est, exact in out.values():
        assert est >= exact  # CMS is one-sided
    assert out["banana"][1] == 5 and out["apple"][1] == 4 and out["cherry"][1] == 1
    # with 3 distinct words in 4x256 cells there are no collisions
    assert all(est == exact for est, exact in out.values())


def test_cms_sketch_is_fixed_size(spark):
    corpus = _docs(spark, [(i, f"w{i} w{i % 7} filler common") for i in range(200)])
    toks = corpus.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    sketch = cms_build(toks)
    n = sketch.count()
    assert n <= CMS_D * CMS_W
    # every token contributes to exactly d rows: total mass = d * n_tokens
    mass = sketch.agg(F.sum("cnt")).collect()[0][0]
    assert mass == CMS_D * toks.count()
