from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def test_bloom_no_false_negatives_and_selective(spark):
    build = spark.range(0, 25).select(F.col("id").alias("k"))
    words = build_bloom(build, F.col("k"))
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    passed = probe.filter(bloom_might_contain(F.col("k"), words))
    passed_keys = {r["k"] for r in passed.collect()}
    # every build key passes (no false negatives)
    assert set(range(25)) <= passed_keys
    # the filter must actually filter: false-positive rate well under 20%
    assert len(passed_keys) < 25 + 0.2 * 1975


def test_bloom_semi_join_equals_plain_semi_join(spark):
    build = spark.range(0, 25).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in bloom_semi_join(probe, build, "k", "k").collect())
    want = sorted(
        r["k"] for r in probe.join(build.distinct(), "k", "left_semi").collect()
    )
    assert got == want
