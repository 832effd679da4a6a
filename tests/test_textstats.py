from __future__ import annotations

from yelp_data_engineering_pipeline_spark.operators.textstats import tfidf_topk


def test_tfidf_topk_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple date"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_topk(docs, "doc_id", "text", k=2).collect()
    got = {(r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df_docs"], r["tfidf"]) for r in rows}
    # n_docs=3; df: apple 2, banana 2, cherry 1, date 1.
    assert got == {
        (1, 1): ("apple", 2, 2, 3.0),
        (1, 2): ("banana", 1, 2, 1.5),
        (2, 1): ("cherry", 1, 1, 3.0),
        (2, 2): ("banana", 1, 2, 1.5),
        (3, 1): ("date", 1, 1, 3.0),
        (3, 2): ("apple", 1, 2, 1.5),
    }


def test_tfidf_tiebreak_is_lexicographic(spark):
    docs = spark.createDataFrame([(1, "b a"), (2, "x")], "doc_id long, text string")
    rows = tfidf_topk(docs, "doc_id", "text", k=2).filter("doc_id = 1").collect()
    # a and b tie on tfidf (tf=1, df=1) — term ASC breaks the tie.
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rk"])] == ["a", "b"]


def test_label_centroids_exact_and_order_stable(spark):
    from yelp_data_engineering_pipeline_spark.operators.similarity import label_centroids

    emb = spark.createDataFrame(
        [(0, [1.0, -2.0]), (0, [3.0, 4.0]), (1, [0.5, 0.5])],
        "label int, embedding array<float>",
    )
    rows = {(r["label"], r["dim"]): (r["n_vecs"], r["sum_q"], r["centroid"])
            for r in label_centroids(emb, "label", "embedding").collect()}
    assert rows == {
        (0, 0): (2, 40000, 2.0),
        (0, 1): (2, 20000, 1.0),
        (1, 0): (1, 5000, 0.5),
        (1, 1): (1, 5000, 0.5),
    }
    # repartition shuffles row order — integer sums must not care
    rows2 = {(r["label"], r["dim"]): (r["n_vecs"], r["sum_q"], r["centroid"])
             for r in label_centroids(emb.repartition(7), "label", "embedding").collect()}
    assert rows == rows2


def test_nearest_centroid_confusion_separable(spark):
    from yelp_data_engineering_pipeline_spark.operators.similarity import (
        nearest_centroid_confusion,
    )

    # two well-separated clusters + one vector planted in the wrong one
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.1]), (0, [0.1, 0.0]), (0, [0.0, 0.0]),
            (1, [5.0, 5.1]), (1, [5.1, 5.0]),
            (1, [0.05, 0.05]),  # labelled 1, sits in cluster 0
        ],
        "label int, embedding array<float>",
    )
    got = {(r["label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_confusion(emb, "label", "embedding").collect()}
    assert got[(0, 0)] == 3
    assert got[(1, 1)] == 2
    assert got[(1, 0)] == 1


def test_boolean_search_requires_all_terms(spark):
    from yelp_data_engineering_pipeline_spark.operators.textstats import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "dup spark merge table"),
            (2, "spark merge only two of them"),
            (3, "dup dup spark spark merge merge repeated counts once"),
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in boolean_search(docs).collect()]
    assert got == [1, 3]  # repeats don't double-count; partial matches drop


def test_lm_coverage_counts_instances_not_types(spark):
    from yelp_data_engineering_pipeline_spark.operators.textstats import lm_coverage

    # 'a b' occurs 3x (covered at min_count=3); 'b a' 2x; 'b c' once
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in lm_coverage(docs, min_count=3).collect()}
    assert rows[1]["n_bigrams"] == 3 and rows[1]["n_covered"] == 2  # a b, b a, a b
    assert rows[2]["n_bigrams"] == 2 and rows[2]["n_covered"] == 1  # a b, b c
    assert rows[2]["coverage"] == 0.5


def test_duplicate_span_stats_detects_shared_boilerplate(spark):
    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.dedup import (
        duplicate_span_stats,
    )

    boiler = "all rights reserved click here to subscribe to our newsletter now"
    docs = spark.createDataFrame(
        [
            (1, "unique words alpha beta gamma delta epsilon zeta eta theta " + boiler),
            (2, boiler + " totally different tail content one two three four five"),
            (3, "no overlap at all just eleven distinct words here really truly"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in duplicate_span_stats(docs, "doc_id", "text").collect()}
    release_tracked()
    # the 11-word boilerplate contributes 4 shared 8-gram positions
    assert got[1].n_dup_grams == 4 and got[2].n_dup_grams == 4
    assert got[3].n_dup_grams == 0 and got[3].dup_frac == 0.0
    assert got[1].n_grams == 21 - 8 + 1  # 21 words -> 14 grams
