"""Bloom-filter pre-filtered semi-join — shuffle-avoidance for joins
whose probe side is huge and mostly non-matching (the dominant join
shape at 100 TB: fact table vs a selective dim subset).

Spark's own runtime row-group filters (AQE `InSubqueryExec`, parquet
bloom filters) cover the common cases; this operator is the explicit,
portable version: build a small Bloom filter from the build side's
keys, broadcast it as ~k machine words of literals, and drop
non-matching probe rows MAP-SIDE before any shuffle or join. The final
exact join removes the Bloom's false positives, so the RESULT is
bit-identical to a plain semi-join — the filter only changes how much
data moves, never what comes out. That is also why the DuckDB oracle is
simply the exact semi-join.

Hashing is md5-based (engine-portable) like every other hash in this
package: position i = int(hex chunk i of md5(key)) mod m. With m = 256
bits (4 longs) and k = 2 probes the false-positive rate at n=25 keys is
~(1-e^(-kn/m))^k ≈ 0.03 — sized for the bounded dims used here; scale m
with the build side (it stays driver-collectable far beyond any real
dim: 1M keys at 10 bits/key = 1.25 MB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..tables import load

_WORDS = 8  # 8 × 32-bit words = 256 bits (32-bit words: 2^b stays exact
_K = 2      # in double for b ≤ 31, so no shiftleft-with-Column needed)


def _bit_positions(key: Column) -> list[Column]:
    """k bit positions in [0, 32*_WORDS) from independent md5 chunks."""
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % (32 * _WORDS)
        for i in range(_K)
    ]


def _bit(pos: Column) -> Column:
    # 2^(pos%32) via pow: exact in double up to 2^31, exact cast to long
    return F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")


def build_bloom(build: DataFrame, key: Column) -> list[int]:
    """Aggregate the build side's keys into _WORDS ints (bit_or). The
    collect is _WORDS numbers — O(1), not data."""
    aggs = []
    for pos in _bit_positions(key):
        word_idx = F.floor(pos / 32).cast("int")
        for w in range(_WORDS):
            aggs.append(
                F.bit_or(
                    F.when(word_idx == w, _bit(pos)).otherwise(F.lit(0).cast("long"))
                ).alias(f"w{len(aggs)}")
            )
    row = build.agg(*aggs).collect()[0]
    merged = [0] * _WORDS
    for i in range(len(row)):
        merged[i % _WORDS] |= row[i] or 0
    return merged


def bloom_might_contain(key: Column, words: list[int]) -> Column:
    """Map-side membership test against broadcast literal words."""
    cond = F.lit(True)
    word_arr = F.array(*[F.lit(w).cast("long") for w in words])
    for pos in _bit_positions(key):
        word = F.element_at(word_arr, F.floor(pos / 32).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit(pos)) != 0)
    return cond


def bloom_semi_join(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """probe ⋉ build with a Bloom pre-filter: non-matching probe rows
    die map-side; the exact (broadcast) semi-join afterwards removes
    false positives. Result == plain semi-join, guaranteed."""
    words = build_bloom(build, F.col(build_key))
    prefiltered = probe.filter(bloom_might_contain(F.col(probe_key), words))
    return prefiltered.join(
        F.broadcast(build.select(F.col(build_key).alias(probe_key)).distinct()),
        probe_key,
        "left_semi",
    )


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from customers in nations of one region: the build side
    (customer keys of AMERICA nations) Bloom-prefilters the orders
    probe BEFORE any join data movement."""
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    cust = load(spark, sf_dir, "customer")
    build = (
        cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders")
    kept = bloom_semi_join(orders, build, "o_custkey", "c_custkey")
    return kept.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price_r"),
    )


register(
    "join_bloom_prefilter",
    join_bloom_prefilter,
    """
    WITH build AS (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price_r
    FROM orders WHERE o_custkey IN (SELECT c_custkey FROM build)
    GROUP BY o_orderstatus
    """,
)
