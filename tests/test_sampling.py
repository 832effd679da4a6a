"""A-ES consistent weighted sampling (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.sampling import weighted_sample


def test_weighted_sample_k_per_group_and_deterministic(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, 10 + i) for i in range(60)],
        "grp string, rid long, w long",
    )
    out = weighted_sample(df, "grp", "rid", "w", k=4)
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"g0": 4, "g1": 4, "g2": 4}
    a = sorted((r.grp, r.rid, r.rk) for r in out.collect())
    b = sorted((r.grp, r.rid, r.rk) for r in weighted_sample(df, "grp", "rid", "w", k=4).collect())
    assert a == b  # hash-derived keys: same selection every run


def test_weighted_sample_favors_heavy_rows_and_drops_zero_weight(spark):
    # one row with overwhelming weight is (deterministically) selected;
    # zero-weight rows can never be drawn
    rows = [("g", i, 1) for i in range(500)] + [("g", 999, 10_000_000), ("g", 1000, 0)]
    df = spark.createDataFrame(rows, "grp string, rid long, w long")
    got = {r.rid for r in weighted_sample(df, "grp", "rid", "w", k=10).collect()}
    assert 999 in got
    assert 1000 not in got


def test_weighted_sample_consistent_under_corpus_growth(spark):
    """Adding new rows never evicts a prior survivor unless the new
    row's key beats it — unchanged rows keep their keys (the property
    that keeps sampled eval sets stable across pipeline runs)."""
    base = spark.createDataFrame(
        [("g", i, 100) for i in range(40)], "grp string, rid long, w long"
    )
    grown = base.union(
        spark.createDataFrame([("g", 1000 + i, 1) for i in range(40)],
                              "grp string, rid long, w long")
    )
    s1 = {r.rid for r in weighted_sample(base, "grp", "rid", "w", k=5).collect()}
    s2 = {r.rid for r in weighted_sample(grown, "grp", "rid", "w", k=5).collect()}
    # tiny-weight newcomers essentially never beat weight-100 keys here
    assert s1 == s2
