"""CI-lite stress smoke (VERDICT r5 next-7): a x10 docs/embeddings tier
built on the fly, driving the three regression surfaces that only show
up beyond fixture scale — banded-LSH candidate growth, the posture-
pinned (never-broadcast) verify joins, and the dense-bucket occupancy
cap. Sized to stay under ~90 s so the default suite keeps it; the full
x10/x100 tables remain tools/bench_stress.py + COVERAGE.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_BASE_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def x10_dir(tmp_path_factory):
    from tools.make_stress import build_stress

    out = str(tmp_path_factory.mktemp("stress") / "x10")
    build_stress(_BASE_SF, out, factor=10, docs_only=True)
    return out


def test_minhash_lsh_scales_linearly_at_x10(spark, x10_dir):
    """Mutated replicas keep per-replica dup structure, so verified
    pair count must grow ~linearly (not quadratically) and the posture
    hints must keep the shingle sides off the broadcast path."""
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from yelp_data_engineering_pipeline_spark.tables import load

    base = minhash_lsh_pairs(
        load(spark, _BASE_SF, "documents"), "doc_id", "text", jaccard_threshold=0.4
    ).count()
    release_tracked()
    x10 = minhash_lsh_pairs(
        load(spark, x10_dir, "documents"), "doc_id", "text", jaccard_threshold=0.4
    )
    n = x10.count()
    release_tracked()
    assert base > 0
    # replica mutation preserves within-replica pairs and suppresses
    # cross-replica ones: expect ~10x, fail on quadratic blowup.
    # (Broadcasting the SMALL candidate list into the verify join is
    # fine; the never-broadcast posture pin on the O(corpus) shingle
    # sides is asserted by the hints tests under a 1 GiB driver.)
    assert 5 * base <= n <= 20 * base, (base, n)


def test_simhash_pairs_bounded_at_x10(spark, x10_dir):
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import (
        simhash16,
        simhash_near_pairs,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    docs = load(spark, x10_dir, "documents")
    sim = simhash16(docs, "doc_id", "text")
    pairs = simhash_near_pairs(sim, F.col("doc_id") < 1000, max_hamming=2)
    n = pairs.count()
    release_tracked()
    assert n > 0
    # pigeonhole banding, not all-pairs: candidates stay far below n^2
    total = docs.count()
    assert n < total * 50


def test_embedding_lsh_occupancy_cap_still_bounds_hot_buckets(spark, x10_dir):
    """The r5 dense-bucket fix: with a cap, the hot-bucket refine-plane
    extension must keep the job completing with bounded per-bucket
    candidates while preserving pairs (x10 replicas perturb floats, so
    near-identical pairs survive)."""
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import (
        embedding_near_dup_lsh,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    emb = load(spark, x10_dir, "embeddings")
    capped = embedding_near_dup_lsh(emb, threshold=0.2, occupancy_cap=500)
    n = capped.count()
    release_tracked()
    assert n > 0


# ---------------------------------------------------------------------------
# r7: star-join axis at x10 (6M-row lineitem) — VERDICT r6 next-3
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def star_x10_dir(tmp_path_factory):
    """x10 star tier built off sf0.1 (6M lineitem / 1.5M orders), FK
    integrity preserved per replica — the axis the docs/embeddings
    smoke doesn't cover."""
    from tools.make_stress import build_stress

    out = str(tmp_path_factory.mktemp("starx10") / "x10")
    build_stress("/root/testdata/sf0.1", out, factor=10, star_only=True)
    return out


def test_star_x10_flagship_and_q1_scale_exactly(spark, star_x10_dir):
    """The replica construction makes the x10 answers DERIVABLE from
    the sf0.1 answers: disjoint key offsets preserve per-replica join
    fan-out, so flagship per-nation lineitem counts are exactly 10x
    and revenue is 10x to float-sum reassociation; TPC-H Q1's grouped
    counts likewise. A super-linear pair blowup or a fan-out bug at
    scale breaks the exact-10x identity, not just a runtime budget."""
    import __spark_entry__ as entry

    from yelp_data_engineering_pipeline_spark.cache import release_tracked

    qs = entry.queries()
    base_flag = {
        r["n_name"]: r for r in qs["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.1").collect()
    }
    release_tracked()
    big_flag = {
        r["n_name"]: r for r in qs["flagship_revenue_by_nation"](spark, star_x10_dir).collect()
    }
    release_tracked()
    assert set(big_flag) == set(base_flag)
    for nation, b in base_flag.items():
        g = big_flag[nation]
        assert g["n_lineitems"] == 10 * b["n_lineitems"]
        assert abs(g["revenue"] - 10 * b["revenue"]) <= 1e-6 * abs(10 * b["revenue"]) + 1e-2

    base_q1 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in qs["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.1").collect()
    }
    release_tracked()
    big_q1 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in qs["tpch_q1_pricing_summary"](spark, star_x10_dir).collect()
    }
    release_tracked()
    assert set(big_q1) == set(base_q1)
    for k, b in base_q1.items():
        assert big_q1[k]["count_order"] == 10 * b["count_order"]
