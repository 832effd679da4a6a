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


def test_temperature_mix_quotas_sum_to_budget_and_compress_ratios(spark):
    from yelp_data_engineering_pipeline_spark.operators.sampling import (
        temperature_mix_quotas,
    )

    # three sources with 100:25:4 size skew → sqrt compresses to 10:5:2
    rows = (
        [("big", i, 100) for i in range(100)]
        + [("mid", i, 100) for i in range(25)]
        + [("small", i, 100) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    out = {r.source: r for r in temperature_mix_quotas(df, "source", "n_chars", budget=170).collect()}
    assert sum(r.quota for r in out.values()) == 170  # largest remainder: exact
    assert out["big"].weight == 100 and out["mid"].weight == 50 and out["small"].weight == 20
    # temperature upweights the small source vs raw proportionality:
    # raw share of 'small' is 4/129 (~5 of 170); sqrt share is 20/170
    assert out["small"].quota == 20
    assert out["big"].quota == 100


def test_temperature_mix_leftover_goes_to_largest_remainders(spark):
    from yelp_data_engineering_pipeline_spark.operators.sampling import (
        temperature_mix_quotas,
    )

    rows = [(f"s{i}", 0, (i + 1) ** 2) for i in range(3)]  # weights 1,2,3; W=6
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    # budget 7: base = 7w div 6 = 1,2,3 (spent 6); remainders 1,2,3 → s2 gets +1
    out = {r.source: r.quota for r in temperature_mix_quotas(df, "source", "n_chars", budget=7).collect()}
    assert out == {"s0": 1, "s1": 2, "s2": 4}


def test_reservoir_plan_has_window_group_limit(spark, sf_dir):
    """The rk <= k filter must plan a WindowGroupLimit: each map task
    keeps only its local bottom-k per group BEFORE the shuffle — the
    property that makes the sample O(groups x k) per task at 100 TB."""
    from yelp_data_engineering_pipeline_spark.operators.sampling import (
        prep_reservoir_per_group,
    )

    plan = (
        prep_reservoir_per_group(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_reservoir_exact_k_uniform_and_stable(spark):
    from yelp_data_engineering_pipeline_spark.operators.sampling import (
        reservoir_per_group,
    )

    df = spark.createDataFrame(
        [("g1", i) for i in range(50)] + [("g2", 100 + i) for i in range(2)],
        "grp string, rid long",
    )
    out = reservoir_per_group(df, "grp", "rid", k=5)
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.grp, set()).add(r.rid)
    assert len(by_g["g1"]) == 5          # exactly k
    assert by_g["g2"] == {100, 101}      # min(k, |group|)
    # deterministic: same selection across independent runs AND after
    # repartitioning (hash keys don't depend on layout)
    again = {r.rid for r in reservoir_per_group(df.repartition(7), "grp", "rid", 5).collect() if r.grp == "g1"}
    assert again == by_g["g1"]
