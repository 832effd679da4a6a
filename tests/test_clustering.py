from __future__ import annotations

from yelp_data_engineering_pipeline_spark.operators.clustering import kmeans


def _toy(spark):
    # two tight blobs; seeds are vec_id 0 and 1 (one in each blob)
    return spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.1, 0.0]),
            (3, [0.0, 0.1]),
            (4, [10.1, 10.0]),
            (5, [10.0, 10.1]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separates_blobs(spark):
    out = {r["cluster"]: (r["n_members"], r["sum_q_total"])
           for r in kmeans(_toy(spark), "vec_id", "embedding", k=2, rounds=3).collect()}
    # blob A = {0,2,3}: sum_q = 1000+1000 = 2000; blob B = {1,4,5}: 601000... wait
    # qv grid = floor(v*10000): blob A qv sums = (0+1000+0)+(0+0+1000) = 2000
    # blob B = (100000+101000+100000)+(100000+100000+101000) = 602000
    assert out[0] == (3, 2000)
    assert out[1] == (3, 602000)


def test_kmeans_partitioning_invariant(spark):
    a = sorted(map(tuple, kmeans(_toy(spark), "vec_id", "embedding", k=2, rounds=2).collect()))
    b = sorted(map(tuple, kmeans(_toy(spark).repartition(5), "vec_id", "embedding", k=2, rounds=2).collect()))
    assert a == b


def test_jl_projection_concentrates_distance_ratios(spark, sf_dir):
    """JL guarantee, empirically: most pairwise distance ratios after
    the 64→16 sign projection must concentrate near 1 (σ ≈ 1/√16 =
    0.25 ⇒ well over half the mass within ±0.3)."""
    from yelp_data_engineering_pipeline_spark.operators.similarity import (
        emb_random_projection,
    )

    bins = {r.ratio_bin: r.n_pairs for r in emb_random_projection(spark, sf_dir).collect()}
    total = sum(bins.values())
    near_one = sum(n for b, n in bins.items() if 7 <= b <= 13)
    assert total > 100  # non-vacuous: the 40-vector sample yields 780 pairs
    assert near_one / total > 0.6


def test_dominant_direction_matches_numpy_power_iteration(spark, sf_dir):
    """Same quantized second-moment matrix, same 3 power rounds, same
    e0 init — numpy must agree to well under the output's 1e-4 grid."""
    import numpy as np

    from yelp_data_engineering_pipeline_spark.operators.similarity import (
        emb_dominant_direction,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    got = np.array(
        [r.component for r in emb_dominant_direction(spark, sf_dir).collect()]
    )
    X = np.array(
        [r.embedding for r in load(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    Xq = np.floor(X * 1000).astype(np.int64)
    C = (Xq.T @ Xq).astype(np.float64)
    v = np.zeros(64)
    v[0] = 1.0
    for _ in range(3):
        y = C @ v
        v = y / np.sqrt((y * y).sum())
    assert np.allclose(got, np.round(v, 4), atol=2e-4)
    # and it actually found a heavier direction than the init axis
    ray = lambda u: float(u @ C @ u)  # noqa: E731
    e0 = np.zeros(64); e0[0] = 1.0
    assert ray(v) >= ray(e0)


def test_semdedup_drops_within_cell_near_duplicates(spark):
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import semdedup_cells

    # 4 centroid-ish vectors (ids 0-3) + near-clones of id 0 and an
    # orthogonal-ish singleton
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (10, [0.99, 0.01, 0.0, 0.0]),   # clone of 0 -> dropped
        (11, [0.98, 0.02, 0.0, 0.0]),   # clone of 0 -> dropped
        (12, [0.0, 0.97, 0.1, 0.0]),    # clone of 1 -> dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.cell: (r.n_vecs, r.n_dropped) for r in semdedup_cells(emb, n_cells=4, threshold=0.9).collect()}
    release_tracked()
    assert got[0] == (3, 2)   # 0, 10, 11 -> keep lowest id only
    assert got[1] == (2, 1)   # 1, 12
    assert got[2] == (1, 0)
    assert got[3] == (1, 0)


def test_semdedup_cell_cap_splits_hot_cell_but_keeps_clones(spark):
    """With every vector in one Voronoi cell and a tiny cap, the join
    key must split (refine-plane extension) while EXACT clones still
    land together — they share every refine sign bit."""
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import semdedup_cells

    # centroid 0 plus 40 spread vectors in its cell + 3 exact clones
    rows = [(0, [1.0] + [0.0] * 63)]
    for i in range(1, 41):
        v = [1.0] + [0.0] * 63
        v[1 + (i % 60)] = 0.5 + (i % 7) / 10.0
        rows.append((i, v))
    clone = [1.0] + [0.001] * 63
    rows += [(100, clone), (101, list(clone)), (102, list(clone))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = semdedup_cells(emb, n_cells=1, threshold=0.999, cell_cap=8)
    got = {r.cell: (r.n_vecs, r.n_dropped) for r in capped.collect()}
    release_tracked()
    # clones 101/102 dropped against 100 even under the split
    assert got[0][0] == 44 and got[0][1] >= 2


def test_kmeans_fused_rounds_match_joined_reference_bit_identical(
        spark, sf_dir):
    """The r13 fused Lloyd round (cluster id computed inside the
    posexplode projection — clustering._round_agg) must reproduce the
    removed r12 formulation EXACTLY: assign, then join the assignment
    back to the N×d posexploded matrix. The reference implementation
    below IS that removed shape, kept as the oracle (the integer-grid
    arithmetic is order-free, so fusion is a plan change, never a
    semantics change). Runs the full 3-round kmeans over the real
    embeddings table both ways, comparing final summaries AND the
    centroid registers after round 1."""
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.clustering import (
        _nearest,
        _quantize,
        _round_agg,
        kmeans,
    )
    from yelp_data_engineering_pipeline_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    k = 10
    base = emb.select(
        F.col("vec_id").alias("vec_id"), _quantize("embedding").alias("q"))
    flat = base.select("vec_id", F.posexplode("q").alias("dim", "qv"))
    cents = {
        int(r["vec_id"]): (1, [int(x) for x in r["q"]])
        for r in base.filter(F.col("vec_id") < k).collect()}

    # round 1, removed shape (assign → join → agg)
    assigned = base.select(
        "vec_id", _nearest(F.col("q"), cents).alias("cluster"))
    want = {(r["cluster"], r["dim"]): (r["sum_q"], r["n"])
            for r in assigned.join(flat, "vec_id")
            .groupBy("cluster", "dim")
            .agg(F.sum("qv").alias("sum_q"), F.count(F.lit(1)).alias("n"))
            .collect()}
    got = {(r["cluster"], r["dim"]): (r["sum_q"], r["n"])
           for r in _round_agg(base, cents).collect()}
    assert got == want and got

    # full run: fused kmeans vs the removed-shape driver loop
    def kmeans_joined(rounds=3):
        cc = dict(cents)
        assigned_df = None
        for _ in range(rounds):
            assigned_df = base.select(
                "vec_id", _nearest(F.col("q"), cc).alias("cluster"))
            agg = (assigned_df.join(flat, "vec_id")
                   .groupBy("cluster", "dim")
                   .agg(F.sum("qv").alias("sum_q"),
                        F.count(F.lit(1)).alias("n")).collect())
            n_by_c, sums_by_c = {}, {}
            for r in agg:
                n_by_c[r["cluster"]] = r["n"]
                sums_by_c.setdefault(r["cluster"], {})[r["dim"]] = r["sum_q"]
            cc = {c: (n_by_c[c], [s[d] for d in range(len(s))])
                  for c, s in sums_by_c.items()}
        return {(r["cluster"]): (r["n_members"], r["sum_q_total"])
                for r in assigned_df.join(flat, "vec_id")
                .groupBy("cluster")
                .agg(F.countDistinct("vec_id").alias("n_members"),
                     F.sum("qv").alias("sum_q_total")).collect()}

    fused = {r["cluster"]: (r["n_members"], r["sum_q_total"])
             for r in kmeans(emb, "vec_id", "embedding",
                             k=k, rounds=3).collect()}
    assert fused == kmeans_joined(3) and fused
