"""Training-corpus prep operators (operators/preptext.py): chunking
coverage/overlap, deterministic split, packing budget, PII scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_data_engineering_pipeline_spark.operators.preptext import (
    chunk_documents,
    hash_split,
    pack_by_token_budget,
    scrub_pii,
)


def test_scrub_pii_replaces(spark):
    df = spark.createDataFrame(
        [("contact bob@example.com or (555) 123-4567 now",), ("clean text",)], ["text"]
    )
    got = [r["t"] for r in df.select(scrub_pii(F.col("text")).alias("t")).collect()]
    assert got[0] == "contact <EMAIL> or <PHONE> now"
    assert got[1] == "clean text"


def test_chunking_coverage_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")], ["doc_id", "text"])
    out = chunk_documents(df, "text", "doc_id", chunk_size=32, overlap=8)
    rows = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"] for r in out.collect()}
    # 50 tokens, stride 24 -> chunks at 0 (32 tokens) and 24 (26 tokens)
    assert rows[(1, 0)] == 32 and rows[(1, 1)] == 26
    assert rows[(2, 0)] == 2  # short doc: one undersized chunk
    assert not any(d == 3 for d, _ in rows)  # empty doc: no chunks
    # stride * last_idx + last_len >= n: every token covered
    assert 24 * 1 + 26 == 50


def test_hash_split_deterministic_and_sized(spark, sf_dir):
    from yelp_data_engineering_pipeline_spark.tables import load

    doc = load(spark, sf_dir, "documents")
    split = hash_split(doc, F.col("text"), val_pct=10)
    counts = {r["s"]: r["n"] for r in doc.groupBy(split.alias("s")).agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert 0.02 < counts.get("val", 0) / total < 0.25  # ~10%, loose bounds
    # deterministic: same expression, same assignment
    again = {r["s"]: r["n"] for r in doc.groupBy(split.alias("s")).agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_pack_bins_respects_budget(spark):
    rows = [(i, "g", " ".join(["w"] * 100)) for i in range(20)]  # 100 tokens each
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    packed = pack_by_token_budget(df, "lang", "doc_id", "text", budget=512)
    per_bin = (
        packed.groupBy("bin").agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")).collect()
    )
    for r in per_bin:
        # contiguous packing: a bin holds at most budget tokens + one
        # straddling doc (here: 6 docs * 100 <= 512 + 100)
        assert r["t"] <= 512 + 100
    assert sum(r["n"] for r in per_bin) == 20


def test_stratified_sample_balances_groups(spark, sf_dir):
    from yelp_data_engineering_pipeline_spark.operators.preptext import (
        stratified_sample_balanced,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = stratified_sample_balanced(docs, "lang", "text")
    after = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    min_n = min(before.values())
    for lang, n in after.items():
        # every group lands near the smallest group's size (binomial
        # spread around min_n), and never above its own original count
        assert n <= before[lang]
        assert n <= 2 * min_n
    # deterministic: same input -> identical sample
    again = {r["lang"]: r["n"] for r in stratified_sample_balanced(docs, "lang", "text").groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert after == again


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """No near-dup cluster may straddle train/val — the invariant that
    doc-level hash splitting violates and cluster-level splitting
    guarantees by construction."""
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from yelp_data_engineering_pipeline_spark.operators.preptext import leakage_safe_split
    from yelp_data_engineering_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    split = leakage_safe_split(docs, pairs)
    spanning = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .filter(F.col("n_sides") > 1)
        .count()
    )
    assert spanning == 0
    assert split.count() == docs.count()  # total partition of the corpus


def test_passage_prune_keeps_first_occurrence(spark):
    from yelp_data_engineering_pipeline_spark.operators.passages import (
        prune_duplicate_passages,
    )

    # width=3: doc1 = [P1 P2], doc2 = [P1(dup) P3], doc3 = [P3(dup)]
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in prune_duplicate_passages(docs, width=3).collect()}
    assert rows[1] == {"doc_id": 1, "n_passages": 2, "n_kept": 2, "kept_text": "a b c d e f"}
    # doc2 loses its first window (owned by doc1) but keeps the second
    assert rows[2] == {"doc_id": 2, "n_passages": 2, "n_kept": 1, "kept_text": "x y z"}
    # doc3's only window is owned by doc2 → fully pruned, empty text
    assert rows[3] == {"doc_id": 3, "n_passages": 1, "n_kept": 0, "kept_text": ""}


def test_bpe_merges_match_python_model(spark):
    """The distributed merge table must equal a reference BPE trainer
    (greedy left-to-right merges, count-desc/lexicographic tie-break)
    run in pure Python on the same weighted vocabulary."""
    from yelp_data_engineering_pipeline_spark.operators.preptext import bpe_merges

    vocab = [("abab", 3), ("aba", 2), ("bbcb", 1), ("cab", 4)]

    def python_bpe(vocab, rounds):
        words = [(list(t), n) for t, n in vocab]
        out = []
        for r in range(1, rounds + 1):
            counts = {}
            for w, n in words:
                for i in range(len(w) - 1):
                    counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + n
            if not counts:
                break
            (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((r, a, b, a + b, c))
            new = []
            for w, n in words:
                m, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                        m.append(a + b)
                        i += 2
                    else:
                        m.append(w[i])
                        i += 1
                new.append((m, n))
            words = new
        return out

    df = spark.createDataFrame(vocab, "token string, n long")
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_merges(df, rounds=4).collect()
    ]
    assert got == python_bpe(vocab, 4)


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """Docs written in the target subset's vocabulary must outscore
    docs in the off-target vocabulary (the whole point of importance
    resampling)."""
    from pyspark.sql import functions as F

    from yelp_data_engineering_pipeline_spark.cache import release_tracked
    from yelp_data_engineering_pipeline_spark.operators.preptext import (
        dsir_importance_scores,
    )

    tgt_words = "alpha beta gamma delta epsilon"
    raw_words = "uno dos tres cuatro cinco"
    rows = [(i, tgt_words, True) for i in range(20)]          # target pool
    rows += [(100 + i, raw_words, False) for i in range(20)]  # off-target pool
    rows += [(500, tgt_words, False), (501, raw_words, False)]  # scored pair
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    out = {
        r.doc_id: r.score_micro
        for r in dsir_importance_scores(docs, F.col("is_tgt")).collect()
    }
    release_tracked()
    assert out[500] > out[501]  # target-vocabulary doc wins
