from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.graph import (
    assign_clusters,
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain_and_island(spark):
    # Chain 1-2-3-4-5 (diameter 4 → needs several propagation rounds)
    # plus island {10, 11} plus self-loop 20-20.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(edges, "doc_a", "doc_b").count() == 0


def test_assign_clusters_singletons_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in assign_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (0, False),
        4: (4, True),
        5: (0, False),
        # 0,3,5 are one cluster; min id 0 is canonical.
    }


def test_dedup_clusters_covers_all_docs(spark, sf_dir):
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = dedup_clusters(spark, sf_dir)
    rows = out.count()
    assert rows == docs_n
    # canonical count == distinct cluster count, and every cluster_id is
    # the min doc_id of its members.
    agg = out.groupBy("cluster_id").agg(
        F.min("doc_id").alias("min_id"),
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
    )
    bad = agg.filter(
        (F.col("min_id") != F.col("cluster_id")) | (F.col("n_canon") != 1)
    ).count()
    assert bad == 0


def test_pagerank_star_hand_computed(spark):
    from yelp_data_engineering_pipeline_spark.operators.graph import pagerank

    # star: center 0 — leaves 1,2,3 (symmetrized). Micro-unit recurrence
    # r' = 150000 + (85 * sum(r_in // deg)) // 100, hand-unrolled 3 rounds.
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long")
    got = {r["node"]: r["r"] for r in pagerank(edges, "doc_a", "doc_b", rounds=3).collect()}
    assert got == {0: 2483250, 1: 505583, 2: 505583, 3: 505583}


def test_pagerank_partitioning_invariant(spark):
    from yelp_data_engineering_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20)], "doc_a long, doc_b long"
    )
    a = sorted(map(tuple, pagerank(edges, "doc_a", "doc_b", rounds=2).collect()))
    b = sorted(map(tuple, pagerank(edges.repartition(9), "doc_a", "doc_b", rounds=2).collect()))
    assert a == b


def test_fuzzy_join_blocked_finds_near_names(spark):
    from yelp_data_engineering_pipeline_spark.operators.linkage import (
        fuzzy_self_join_blocked,
    )

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "rad widget"),     # dist 1 from id 1, same block
            (3, "blue widget"),    # dist 3 from id 1 -> excluded at k=2
            (4, "red bolt"),       # different block, never compared
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join_blocked(
            df, "id", "name", F.regexp_extract(F.col("name"), r"(\S+)$", 1), 2
        ).collect()
    }
    assert got == {(1, 2): 1}


def test_star_components_log_rounds_on_chain(spark):
    """The adversarial case min-propagation cannot survive: a path
    graph has diameter = n, so min-propagation needs n rounds; the
    star algorithm must stay logarithmic (measured: 1000-chain = 11
    rounds; asserted here on a 200-chain)."""
    from yelp_data_engineering_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame([(i, i + 1) for i in range(199)], "a long, b long")
    labels, rounds = connected_components_star(df, "a", "b")
    assert rounds <= 12  # log-ish, not 199
    assert labels.filter("label != 0").count() == 0  # one component, min 0
    assert labels.count() == 200


def test_assign_clusters_star_matches_propagation(spark, sf_dir):
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from yelp_data_engineering_pipeline_spark.operators.graph import assign_clusters
    from yelp_data_engineering_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    a = {(r.doc_id, r.cluster_id) for r in assign_clusters(docs, pairs).collect()}
    b = {
        (r.doc_id, r.cluster_id)
        for r in assign_clusters(docs, pairs, algorithm="star").collect()
    }
    assert a == b
