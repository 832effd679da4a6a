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


def test_hll_shard_union_equals_unsharded_sketch(spark):
    """Mergeability is the operator's whole claim: the union of 8 shard
    sketches must estimate exactly what one global sketch of the same
    rows estimates (DataSketches HLL union of same-lgK sketches is
    lossless in dense mode and exact here in sparse mode)."""
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.sketches import hll_shard_rollup

    rows = [(i % 3, i * 7 % 500, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp int, key long, rid long")
    sharded = hll_shard_rollup(df, "grp", "key", F.pmod("rid", F.lit(8)))
    got = {r.grp: r for r in sharded.collect()}
    single = {
        r.grp: r.est
        for r in df.groupBy("grp")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("key")).alias("est"))
        .collect()
    }
    for g, r in got.items():
        assert r.n_shards == 8
        assert r.est_within_5pct == 1
        # shard-union estimate must be the single-sketch estimate ±0
        exact = r.exact_keys
        assert abs(single[g] - exact) * 20 <= exact


def test_bitmap_distinct_exact_and_partial_agg(spark):
    """bitmap_distinct must equal countDistinct exactly, and its plan
    must carry the map-side partial bit_or (the register merge IS the
    partial aggregate — the whole scale story)."""
    from yelp_data_engineering_pipeline_spark.operators.sketches import bitmap_distinct

    df = spark.createDataFrame(
        [("a", i % 37) for i in range(500)] + [("b", i * 64) for i in range(9)],
        "g string, uid long",
    )
    got = {r.g: r.n_distinct for r in bitmap_distinct(df, ["g"], "uid").collect()}
    assert got == {"a": 37, "b": 9}
    plan = (
        bitmap_distinct(df, ["g"], "uid")._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_bit_or" in plan
